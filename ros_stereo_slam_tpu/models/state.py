"""SLAM state as fixed-capacity pytrees.

The reference keeps mutable ``std::vector`` state on one god-class
(``/root/reference/include/visualSLAM.h:88-107`` — ``ref2dFeatures``,
``ref3dCoords``, ``keyFrameHistory``, ``mapHistory`` ...) with erase/compact
churn per frame.  Here every store is a STATIC-capacity array + validity
mask / count, so every stage stays jit-compiled with zero reallocation:

- :class:`TrackState`   — the live 2D/3D feature set being tracked
  (reference ``ref2dFeatures``/``ref3dCoords``).
- :class:`KeyframeStore` — ring buffer of keyframe poses + cloud blocks
  (reference ``keyFrame`` struct ``visualSLAM.h:47-54`` + ``mapHistory``).
- :class:`TrajectoryStore` — per-frame poses (reference ``isoVector``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TrackState(NamedTuple):
    """Live feature set tracked frame-to-frame (world-frame landmarks)."""

    pts2d: jnp.ndarray  # (N, 2) f32 — positions in the *reference* image
    pts3d: jnp.ndarray  # (N, 3) f32 — world-frame landmark positions
    colors: jnp.ndarray  # (N, 3) f32 — RGB sampled at triangulation time
    mask: jnp.ndarray  # (N,) bool

    @staticmethod
    def empty(capacity: int) -> "TrackState":
        return TrackState(
            pts2d=jnp.zeros((capacity, 2), jnp.float32),
            pts3d=jnp.zeros((capacity, 3), jnp.float32),
            colors=jnp.zeros((capacity, 3), jnp.float32),
            mask=jnp.zeros((capacity,), bool),
        )


class KeyframeStore(NamedTuple):
    """Ring buffer of keyframes with their map-cloud blocks.

    ``retrack`` mirrors the reference's flag (``visualSLAM.h:53``,
    set at ``src/VisualSLAM.cpp:162-167``): keyframes whose cloud re-enters
    the map after a loop-closure rewrite.
    """

    poses: jnp.ndarray  # (K, 4, 4) f32 — world-from-cam at insertion
    frame_idx: jnp.ndarray  # (K,) i32 — source frame index
    points: jnp.ndarray  # (K, P, 3) f32 — world-frame cloud block
    colors: jnp.ndarray  # (K, P, 3) f32
    point_mask: jnp.ndarray  # (K, P) bool
    retrack: jnp.ndarray  # (K,) bool
    valid: jnp.ndarray  # (K,) bool — slot occupied
    count: jnp.ndarray  # () i32 — number of keyframes inserted (may exceed K)

    @staticmethod
    def empty(capacity: int, block: int) -> "KeyframeStore":
        return KeyframeStore(
            poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
            frame_idx=jnp.zeros((capacity,), jnp.int32),
            points=jnp.zeros((capacity, block, 3), jnp.float32),
            colors=jnp.zeros((capacity, block, 3), jnp.float32),
            point_mask=jnp.zeros((capacity, block), bool),
            retrack=jnp.zeros((capacity,), bool),
            valid=jnp.zeros((capacity,), bool),
            count=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.poses.shape[0]


class TrajectoryStore(NamedTuple):
    """Per-frame pose chain (reference ``isoVector`` + canvas trajectory)."""

    poses: jnp.ndarray  # (F, 4, 4) f32 — world-from-cam per frame
    valid: jnp.ndarray  # (F,) bool
    count: jnp.ndarray  # () i32

    @staticmethod
    def empty(capacity: int) -> "TrajectoryStore":
        return TrajectoryStore(
            poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
            valid=jnp.zeros((capacity,), bool),
            count=jnp.zeros((), jnp.int32),
        )
