"""Stereo triangulation (reference C6).

TPU-native replacement for ``visualSLAM::stereoTriangulate``
(``/root/reference/src/triangulation.cpp:73-166``), which forms
P1 = K[I|0], P2 = K[I|-b e1] and calls ``cv::triangulatePoints`` then
de-homogenizes.  For a rectified stereo rig that generic homogeneous DLT is
equivalent to the closed-form two-view least squares below — embarrassingly
parallel, no SVD needed on the fast path (a batched 4x4-SVD DLT is provided
for the general/verification path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.utils.camera import Pinhole


class TriangulationResult(NamedTuple):
    points: jnp.ndarray  # (N, 3) camera-frame 3D points (left cam)
    valid: jnp.ndarray  # (N,) bool
    depth: jnp.ndarray  # (N,)


def triangulate_rectified(
    cam: Pinhole,
    baseline: float | jnp.ndarray,
    uv_left: jnp.ndarray,
    uv_right: jnp.ndarray,
    mask: jnp.ndarray,
    min_depth: float = 0.5,
    max_depth: float = 500.0,
    max_vertical_px: float = 2.0,
) -> TriangulationResult:
    """Closed-form depth from x-disparity on a rectified rig.

    Convention matches the reference: right camera displaced +baseline
    along x, so disparity d = uL - uR > 0 and z = fx * b / d.  Vertical
    residual |vL - vR| gates rectification violations (the reference relies
    on its F-matrix gate for this).  `max_depth` mirrors the z cutoff at
    ``/root/reference/src/rosFuncs.cpp:12-14``.
    """
    d = uv_left[..., 0] - uv_right[..., 0]
    dv = jnp.abs(uv_left[..., 1] - uv_right[..., 1])
    safe_d = jnp.maximum(d, 1e-6)
    z = cam.fx * baseline / safe_d
    x = (uv_left[..., 0] - cam.cx) / cam.fx * z
    y = (uv_left[..., 1] - cam.cy) / cam.fy * z
    pts = jnp.stack([x, y, z], axis=-1)
    valid = (
        mask
        & (d > 1e-3)
        & (dv < max_vertical_px)
        & (z > min_depth)
        & (z < max_depth)
    )
    return TriangulationResult(points=pts, valid=valid, depth=z)


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """General two-view homogeneous DLT, batched over N points.

    Same formulation as ``cv::triangulatePoints``: for each pair, the null
    vector of the 4x4 system via symmetric eigendecomposition.
    """

    def one(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        # Row-normalize then SVD (f32 conditioning; eigh(A^T A) is too lossy).
        A = A / jnp.linalg.norm(A, axis=1, keepdims=True)
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)

    return jax.vmap(one)(uv1, uv2)
