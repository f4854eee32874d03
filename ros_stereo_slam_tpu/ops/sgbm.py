"""Dense stereo disparity (reference C18 — the standalone `stereo` node).

TPU-native replacement for ``cv::StereoSGBM`` as used by
``StereoProcess::stereoMatch`` (``/root/reference/src/StereoCV.cpp:21-62``:
96 disparities, block 7) and the reprojection path
(``reprojectDisparity`` ``:221-250``).

OpenCV's SGBM walks pixels with per-scanline DP in C++; here the whole
cost volume is built from D shifted-image absolute differences + a
separable box filter (pure VPU element-wise work, zero gathers), then
semi-global aggregation runs as ``lax.scan`` along scanlines in four
directions (left/right/up/down), followed by winner-take-all with
parabolic sub-pixel refinement and a left-right consistency check.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ros_stereo_slam_tpu.utils.camera import Pinhole


class DisparityResult(NamedTuple):
    disparity: jnp.ndarray  # (H, W) float32, sub-pixel; <0 where invalid
    valid: jnp.ndarray  # (H, W) bool


def _box_filter(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Running-sum box filter of width 2r+1 along axis (edge-padded)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="edge")
    n = x.shape[axis]
    out = None
    for i in range(2 * r + 1):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def cost_volume(
    left: jnp.ndarray, right: jnp.ndarray, max_disp: int, block: int = 7
) -> jnp.ndarray:
    """(H, W, D) SAD matching cost: cost[y, x, d] = block-SAD of
    left(y, x) vs right(y, x - d).  Out-of-frame shifts get high cost."""
    r = block // 2
    H, W = left.shape
    costs = []
    big = jnp.float32(1e3)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    for d in range(max_disp):
        shifted = jnp.roll(right, d, axis=1)
        ad = jnp.abs(left - shifted)
        ad = jnp.where(xs >= d, ad, big)
        costs.append(ad)
    vol = jnp.stack(costs, axis=-1)  # (H, W, D)
    vol = _box_filter(_box_filter(vol, r, 0), r, 1) / (block * block)
    return vol


def _aggregate_dir(vol: jnp.ndarray, p1, p2, axis: int, reverse: bool) -> jnp.ndarray:
    """SGM path aggregation along `axis` via lax.scan.

    L(p, d) = C(p, d) + min(L(p-1, d), L(p-1, d+-1)+P1, min_d' L + P2)
              - min_d' L(p-1, d')
    """
    # Move the scan axis to the front: (S, ..., D)
    v = jnp.moveaxis(vol, axis, 0)
    if reverse:
        v = v[::-1]

    def step(prev, c):
        prev_min = jnp.min(prev, axis=-1, keepdims=True)
        shift_p = jnp.concatenate([prev[..., :1], prev[..., :-1]], axis=-1)
        shift_n = jnp.concatenate([prev[..., 1:], prev[..., -1:]], axis=-1)
        best = jnp.minimum(
            jnp.minimum(prev, jnp.minimum(shift_p, shift_n) + p1),
            prev_min + p2,
        )
        out = c + best - prev_min
        return out, out

    init = v[0]
    _, rest = lax.scan(step, init, v[1:])
    agg = jnp.concatenate([init[None], rest], axis=0)
    if reverse:
        agg = agg[::-1]
    return jnp.moveaxis(agg, 0, axis)


@partial(jax.jit, static_argnames=("max_disp", "block", "directions"))
def sgbm(
    left: jnp.ndarray,
    right: jnp.ndarray,
    max_disp: int = 96,
    block: int = 7,
    p1: float = 0.03,
    p2: float = 0.12,
    uniqueness: float = 0.95,
    lr_thresh: float = 1.5,
    directions: int = 4,
) -> DisparityResult:
    """Semi-global block matching on [0, 1] grayscale images.

    Parameters mirror the reference node's 96-disparity, block-7 setup;
    penalties are in [0, 1] intensity units.
    """
    vol = cost_volume(left, right, max_disp, block)
    agg = jnp.zeros_like(vol)
    if directions >= 1:
        agg = agg + _aggregate_dir(vol, p1, p2, axis=1, reverse=False)
    if directions >= 2:
        agg = agg + _aggregate_dir(vol, p1, p2, axis=1, reverse=True)
    if directions >= 3:
        agg = agg + _aggregate_dir(vol, p1, p2, axis=0, reverse=False)
    if directions >= 4:
        agg = agg + _aggregate_dir(vol, p1, p2, axis=0, reverse=True)

    d_best = jnp.argmin(agg, axis=-1)  # (H, W)
    c_best = jnp.min(agg, axis=-1)
    # Parabolic sub-pixel refinement from the neighbouring costs.
    d_lo = jnp.clip(d_best - 1, 0, max_disp - 1)
    d_hi = jnp.clip(d_best + 1, 0, max_disp - 1)
    c_lo = jnp.take_along_axis(agg, d_lo[..., None], axis=-1)[..., 0]
    c_hi = jnp.take_along_axis(agg, d_hi[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(c_lo + c_hi - 2.0 * c_best, 1e-6)
    offset = jnp.clip(0.5 * (c_lo - c_hi) / denom, -0.5, 0.5)
    disp = d_best.astype(jnp.float32) + offset

    # Uniqueness: best cost must beat the runner-up (excluding neighbours).
    D = max_disp
    dd = jax.lax.broadcasted_iota(jnp.int32, agg.shape, 2)
    masked = jnp.where(jnp.abs(dd - d_best[..., None]) <= 1, jnp.inf, agg)
    second = jnp.min(masked, axis=-1)
    unique = c_best <= uniqueness * second

    # Left-right consistency via the right image's own WTA disparity:
    # project left WTA into the right view and compare.
    # Cheap LR proxy: cost volume indexed at (x - d) equals the right
    # disparity; full recompute is exact:
    d_right = jnp.argmin(
        _right_volume_from_left(agg, max_disp), axis=-1
    )
    xs = jax.lax.broadcasted_iota(jnp.int32, disp.shape, 1)
    xr = jnp.clip(xs - d_best, 0, disp.shape[1] - 1)
    d_r_at = jnp.take_along_axis(d_right, xr, axis=1)
    lr_ok = jnp.abs(d_r_at - d_best) <= lr_thresh

    valid = unique & lr_ok & (d_best > 0) & (d_best < max_disp - 1)
    disp = jnp.where(valid, disp, -1.0)
    return DisparityResult(disparity=disp, valid=valid)


def _right_volume_from_left(vol: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Re-index the left-referenced volume to right-referenced:
    C_r(y, x, d) = C_l(y, x + d, d)."""
    cols = []
    big = jnp.float32(1e9)
    W = vol.shape[1]
    xs = jax.lax.broadcasted_iota(jnp.int32, vol.shape[:2], 1)
    for d in range(max_disp):
        shifted = jnp.roll(vol[..., d], -d, axis=1)
        shifted = jnp.where(xs < W - d, shifted, big)
        cols.append(shifted)
    return jnp.stack(cols, axis=-1)


def disparity_to_cloud(
    cam: Pinhole,
    baseline: float | jnp.ndarray,
    disp: jnp.ndarray,
    valid: jnp.ndarray,
    min_depth: float = 0.5,
    max_depth: float = 60.0,
):
    """Reproject a disparity map to a 3D point cloud (reference
    ``reprojectDisparity`` ``src/StereoCV.cpp:221-250`` via the Q matrix).

    Returns ((H*W, 3) points, (H*W,) mask).
    """
    H, W = disp.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    safe_d = jnp.maximum(disp, 1e-3)
    z = cam.fx * baseline / safe_d
    x = (xs - cam.cx) / cam.fx * z
    y = (ys - cam.cy) / cam.fy * z
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    ok = (valid & (z > min_depth) & (z < max_depth)).reshape(-1)
    return pts, ok
