"""Pinhole camera model (batched, jit-friendly).

Replaces the hardcoded intrinsics matrix in the reference
(``/root/reference/include/visualSLAM.h:82-87`` — KITTI fx=fy=718.856,
cx=607.1928, cy=185.2157, baseline 0.54 at ``:68``) with an explicit,
configurable camera value object.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Pinhole(NamedTuple):
    """Intrinsics as a pytree-compatible NamedTuple of scalars."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    @staticmethod
    def from_K(K) -> "Pinhole":
        K = jnp.asarray(K, dtype=jnp.float32)
        return Pinhole(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2])


def kitti_default() -> Pinhole:
    """KITTI odometry grayscale cam intrinsics used by the reference."""
    return Pinhole(
        fx=jnp.float32(718.856),
        fy=jnp.float32(718.856),
        cx=jnp.float32(607.1928),
        cy=jnp.float32(185.2157),
    )


def project(cam: Pinhole, pts_cam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project (N, 3) camera-frame points to (N, 2) pixels.

    Returns (uv, valid) where valid marks points with z > 0 (projection of
    non-positive depth points is extrapolated but flagged invalid).
    """
    z = pts_cam[..., 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    u = cam.fx * pts_cam[..., 0] / zs + cam.cx
    v = cam.fy * pts_cam[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1), valid


def backproject(cam: Pinhole, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Lift (N, 2) pixels with (N,) depths to (N, 3) camera-frame points."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def normalize(cam: Pinhole, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized image coordinates (z=1 plane)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)
