"""Batched pyramidal Lucas-Kanade optical flow — the per-frame hot kernel.

TPU-native replacement for ``cv::calcOpticalFlowPyrLK`` as used by the
reference at both call sites: stereo left->right matching
(``/root/reference/src/tracking.cpp:14-28`` ``denseLKtracking``) and
temporal frame-to-frame tracking (``src/tracking.cpp:46-91``
``PyrLKtrackFrame2Frame``).  Reference parameters (OpenCV defaults / the
Python prototype ``src/ROSslam.py:145``): 21x21 window, 3+1 pyramid
levels, iterative refinement with epsilon stop.

Design (vs a CUDA/OpenCV translation):
- ALL N points advance together through a fixed iteration schedule —
  no per-point early exit; converged points take a masked zero step.
  Status is a mask, never a compaction (fixed shapes end to end).
- Template gradients are sampled once per level; the spatial matrix
  G = J^T J is a per-point 2x2 inverted in closed form.
- Patch reads are vmapped dynamic-slices (one fused gather per level
  per iteration) — the image stays resident in VMEM-sized tiles chosen
  by XLA; there is no host sync anywhere in the loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.ops import interp, pyramid


class LKParams(NamedTuple):
    window: int = 21
    levels: int = 4
    iters: int = 10
    # Full-resampling GN iterations per level; any remaining iters - walk
    # "polish" iterations sample from a FROZEN (window+3)^2 tile anchored
    # after the walk phase (sampling clamped to a ~±1 px cell around the
    # anchor).  The per-level correction left after `walk` full iterations
    # is subpixel, so polish is near-lossless.  Measured on v5e: the
    # polish path's select/mix chain is NOT faster than the walk path's
    # aligned-superblock + one-hot-matmul sampling (the extra per-point
    # live tile spills), so the default runs all iterations as walk;
    # polish stays available for larger windows/iteration counts.
    walk_iters: int = 10
    eps: float = 0.01
    # "auto": Pallas kernel on TPU, jnp reference elsewhere.
    backend: str = "auto"
    # Element type for the Pallas kernel's one-hot selection matmuls
    # ("bf16" | "f32").  The 0/1 selection weights are exact in either
    # type, so bf16 only rounds the IMAGE samples — the same 2^-8 relative
    # quantization as the uint8 frames OpenCV's LK consumes — while the
    # MXU runs the select single-pass instead of the f32 3-pass: measured
    # 2.59 -> 1.58 ms per 1152-point/10-iter level call on v5e (the jnp
    # reference path is always f32; this knob only affects TPU).
    select_dtype: str = "bf16"
    # Per-pixel min eigenvalue of the spatial gradient matrix, for images in
    # [0, 1] (OpenCV's 1e-4 default assumes 0-255 units; /255^2 ~= 1.5e-9,
    # we gate a bit harder to kill flat/aperture patches).
    min_eig: float = 1e-7
    # Photometric gate: mean |cur - tmpl| relative to the template's
    # contrast (std).  Contrast-normalized because resampling error scales
    # with texture; a mistrack decorrelates the patches (ratio ~sqrt(2)).
    max_residual: float = 0.8


class LKResult(NamedTuple):
    points: jnp.ndarray  # (N, 2) tracked positions in the current image
    valid: jnp.ndarray  # (N,) bool
    residual: jnp.ndarray  # (N,) contrast-normalized photometric error


def _track_level(
    ref_img: jnp.ndarray,
    cur_img: jnp.ndarray,
    ref_pts: jnp.ndarray,
    guesses: jnp.ndarray,
    params: LKParams,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK: refine `guesses` (N, 2); returns
    (new_guesses, mean_abs_residual)."""
    w = params.window
    ix_full, iy_full = pyramid.scharr_gradients(ref_img)

    def per_point(ref_pt, guess):
        tmpl = interp.extract_patch(ref_img, ref_pt, w)
        gx = interp.extract_patch(ix_full, ref_pt, w)
        gy = interp.extract_patch(iy_full, ref_pt, w)
        a = jnp.sum(gx * gx)
        b = jnp.sum(gx * gy)
        c = jnp.sum(gy * gy)
        det = a * c - b * b
        trace = a + c
        # min eigenvalue of G, normalized per pixel — OpenCV's minEigThreshold
        min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
        min_eig = min_eig / (w * w)
        ok = min_eig > params.min_eig
        inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)

        def gn_update(cur, g):
            it = cur - tmpl
            bx = jnp.sum(gx * it)
            by = jnp.sum(gy * it)
            dx = (c * bx - b * by) * inv_det
            dy = (a * by - b * bx) * inv_det
            delta = jnp.stack([dx, dy])
            # masked convergence: once |delta| < eps, steps become no-ops
            step = jnp.where(jnp.linalg.norm(delta) < params.eps, 0.0, 1.0)
            return g - step * delta

        def body(_, g):
            return gn_update(interp.extract_patch(cur_img, g, w), g)

        walk = min(params.iters, params.walk_iters)
        polish = params.iters - walk
        g = jax.lax.fori_loop(0, walk, body, guess)
        if polish > 0:
            # Freeze-polish: all further samples come from the ~±1 px cell
            # around the post-walk anchor (identical clamp formula to the
            # Pallas kernel's frozen-tile phase).
            h_i, w_i = cur_img.shape
            half = (w - 1) * 0.5
            lo = jnp.zeros((2,), g.dtype)
            hi = jnp.asarray([w_i - w - 3.0, h_i - w - 3.0], g.dtype)
            base = jnp.clip(jnp.floor(g - half) - 1.0, lo, hi)

            def clamp_pos(gp):
                o = jnp.clip(gp - half - base, 0.0, 2.0 - 1e-4)
                return base + o + half

            def pbody(_, gp):
                return gn_update(
                    interp.extract_patch(cur_img, clamp_pos(gp), w), gp
                )

            g = jax.lax.fori_loop(0, polish, pbody, g)
            g_res = clamp_pos(g)
        else:
            g_res = g
        cur = interp.extract_patch(cur_img, g_res, w)
        contrast = jnp.std(tmpl) + 1e-3
        resid = jnp.mean(jnp.abs(cur - tmpl)) / contrast
        return g, ok, resid

    new_guess, ok, resid = jax.vmap(per_point)(ref_pts, guesses)
    new_guess = jnp.where(ok[:, None], new_guess, guesses)
    return new_guess, resid, ok


def _dispatch_level(ref_img, cur_img, ref_pts, guesses, params: LKParams):
    """Pick the Pallas kernel on TPU, the jnp reference elsewhere."""
    use_pallas = params.backend == "pallas" or (
        params.backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from ros_stereo_slam_tpu.ops import lk_pallas

        # track_level with a custom vmap rule: under jax.vmap (the
        # DP-over-sequences posture) lanes route to the grid=(B,) batched
        # kernel instead of failing to auto-batch the single-lane call.
        return lk_pallas.track_level_auto(
            ref_img, cur_img, ref_pts, guesses, params)
    return _track_level(ref_img, cur_img, ref_pts, guesses, params)


@partial(jax.jit, static_argnames=("params",))
def track(
    ref_pyr: tuple,
    cur_pyr: tuple,
    ref_pts: jnp.ndarray,
    init_flow: jnp.ndarray | None = None,
    params: LKParams = LKParams(),
) -> LKResult:
    """Track (N, 2) `ref_pts` from the ref pyramid into the cur pyramid.

    `ref_pyr` / `cur_pyr`: tuples of arrays from
    :func:`ros_stereo_slam_tpu.ops.pyramid.build_pyramid` (finest first).
    `init_flow`: optional (N, 2) prior displacement (e.g. stereo prior).
    """
    levels = len(ref_pyr)
    n = ref_pts.shape[0]
    flow = jnp.zeros((n, 2), dtype=jnp.float32) if init_flow is None else init_flow

    scale = float(2 ** (levels - 1))
    guesses = (ref_pts + flow) / scale
    ok_fine = jnp.ones((n,), dtype=bool)
    resid = jnp.zeros((n,), dtype=jnp.float32)
    # Patch reads clamp at image borders; a clamped read is garbage, so a
    # point that falls out of range AT A GIVEN LEVEL keeps its prior guess
    # there (coarse levels are best-effort refinement) instead of absorbing
    # a corrupt update that poisons every finer level.
    margin = params.window // 2 + 1
    for lvl in range(levels - 1, -1, -1):
        s = float(2**lvl)
        ref_lvl = ref_pts / s
        h_l, w_l = ref_pyr[lvl].shape
        tracked, resid, ok = _dispatch_level(
            ref_pyr[lvl], cur_pyr[lvl], ref_lvl, guesses, params
        )
        inb = interp.in_bounds(ref_lvl, h_l, w_l, margin) & interp.in_bounds(
            tracked, h_l, w_l, margin
        )
        usable = ok & inb
        guesses = jnp.where(usable[:, None], tracked, guesses)
        if lvl == 0:
            ok_fine = usable
        else:
            guesses = guesses * 2.0

    h, w = cur_pyr[0].shape
    valid = (
        ok_fine
        & interp.in_bounds(ref_pts, h, w, margin)
        & (resid < params.max_residual)
    )
    return LKResult(points=guesses, valid=valid, residual=resid)


def max_levels_for(shape: tuple[int, int], params: LKParams) -> int:
    """Clamp pyramid depth so the coarsest level still fits an LK window."""
    min_size = params.window + 3
    levels = 1
    h, w = shape
    while levels < params.levels and min(h, w) // 2 >= min_size:
        h, w = h // 2, w // 2
        levels += 1
    return levels


def track_images(
    ref_img: jnp.ndarray,
    cur_img: jnp.ndarray,
    ref_pts: jnp.ndarray,
    init_flow: jnp.ndarray | None = None,
    params: LKParams = LKParams(),
) -> LKResult:
    """Convenience wrapper building pyramids internally (untraced callers)."""
    params = params._replace(levels=max_levels_for(ref_img.shape, params))
    ref_pyr = tuple(pyramid.build_pyramid(ref_img, params.levels))
    cur_pyr = tuple(pyramid.build_pyramid(cur_img, params.levels))
    return track(ref_pyr, cur_pyr, ref_pts, init_flow, params)
