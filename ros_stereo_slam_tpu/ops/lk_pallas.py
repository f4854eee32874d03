"""Pallas TPU kernel for one pyramid level of batched Lucas-Kanade.

The XLA lowering of per-point patch sampling (vmapped dynamic slices over
an HBM image) scalarizes into gathers — measured ~108 ms per frame for
1536 points on a v5e chip.  Mosaic's VMEM vector loads require
(8, 128)-aligned offsets, so arbitrary-position patches cannot be sliced
directly either.  This kernel therefore:

1. keeps the whole pyramid level + current image resident in VMEM
   (level 0 of a KITTI frame is 1.8 MB);
2. per point, loads an ALIGNED (40, 256) superblock around the patch
   (`pl.multiple_of` proves alignment to Mosaic);
3. extracts the integer-offset tile with two one-hot selection matmuls
   (``big @ ColSel`` then ``RowSel @ .``) — MXU work instead of gathers;
4. applies the sub-pixel bilinear mix and the 3x3 Scharr template
   gradients in-register (VPU), so interpolation and differentiation are
   exact f32 (conv and bilinear commute, so gradients of the sampled
   patch equal sampled gradients away from borders).

Semantics match :func:`ros_stereo_slam_tpu.ops.lk._track_level` (the jnp
reference used on CPU and as the test oracle): forward-additive LK with
template-side gradients, masked convergence, contrast-normalized
residual.  Replaces the hot loop of ``cv::calcOpticalFlowPyrLK`` as used
at ``/root/reference/src/tracking.cpp:18,52``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_stereo_slam_tpu.ops import lk as lk_ref

# Superblock geometry: 40 rows (8-aligned, fits patch offset <8 + 28 rows),
# 256 lanes (128-aligned, fits offset <128 + 28 cols).
_ROWS = 40
_LANES = 256
# Independent points processed together per loop trip (ILP).
_UNROLL = 16


def _mix(patch: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """(S+1, S+1) integer-aligned tile -> (S, S) at subpixel (fx, fy)."""
    top = patch[:-1, :-1] * (1.0 - fx) + patch[:-1, 1:] * fx
    bot = patch[1:, :-1] * (1.0 - fx) + patch[1:, 1:] * fx
    return top * (1.0 - fy) + bot * fy


def _select_tile(img_ref, yf, xf, n: int, H: int, W: int,
                 sel_dtype=jnp.bfloat16):
    """Sample an (n, n) tile whose top-left is at real (yf, xf).

    Returns (tile, fx, fy) where tile[r, c] = img[floor(yf)+r, floor(xf)+c]
    (clamped to the image) and fx/fy are the sub-pixel fractions.

    `sel_dtype`: matmul element type for the one-hot column extraction.
    The 0/1 weights are exact in bf16, so bf16 costs only the image
    samples' rounding (~2^-8 relative — the uint8 quantization the
    reference's OpenCV pipeline lives with anyway) and runs the MXU
    single-pass instead of the f32 3-pass (measured 1.6x on the whole
    kernel).
    """
    yi = jnp.clip(jnp.floor(yf), 0.0, H - (n + 1.0))
    xi = jnp.clip(jnp.floor(xf), 0.0, W - (n + 1.0))
    fy = yf - yi
    fx = xf - xi
    yi = yi.astype(jnp.int32)
    xi = xi.astype(jnp.int32)
    y8 = jnp.minimum((yi // 8) * 8, H - _ROWS)
    x128 = jnp.minimum((xi // 128) * 128, W - _LANES)
    iy = yi - y8
    ix = xi - x128
    big = img_ref[
        pl.ds(pl.multiple_of(y8, 8), _ROWS),
        pl.ds(pl.multiple_of(x128, 128), _LANES),
    ]  # (40, 256)
    # Column extraction as a one-hot MXU matmul (exact: 0/1 weights), then
    # a small row rotate — the wide array is consumed once by the MXU and
    # later VPU work happens on (40, 32) tiles.  A fully vectorized variant
    # with stacked per-trip scratch tiles and segment-matmul reductions was
    # tried and measured SLOWER (scratch round-trips beat the saved scalar
    # reductions), so the register-resident per-point form stays.
    k_col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 32), 0)
    c_col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 32), 1)
    CS = (k_col == c_col + ix).astype(sel_dtype)  # (256, 32)
    cols = jnp.dot(big.astype(sel_dtype), CS,
                   precision=jax.lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)  # (40, 32)
    D = pltpu.roll(cols, _ROWS - iy, axis=0)
    return D[: n + 1, : n + 1], fx, fy


# Per-core SMEM budget the multi-lane kernels size against (the scalar
# memory the four (B, N) f32 point arrays live in, see _lk_level_kernel
# docstring).  Mosaic fails with an opaque allocation error when blown;
# guard with a descriptive one instead.
_SMEM_BUDGET_BYTES = 1 << 20


def _check_smem_lanes(name: str, B: int, n: int, arrays: int = 4) -> None:
    """Raise a descriptive error when a multi-lane kernel's (B, N) f32
    SMEM-resident point arrays would exceed the SMEM budget (leaving
    ~25% headroom for Mosaic's own scalars/loop state)."""
    need = arrays * B * n * 4
    budget = int(_SMEM_BUDGET_BYTES * 0.75)
    if need > budget:
        raise ValueError(
            f"{name}: {arrays} lane-point arrays of shape ({B}, {n}) f32 "
            f"need {need} B of SMEM (budget ~{budget} B). Chunk the lane "
            f"dimension (B <= {max(budget // (arrays * n * 4), 1)} at "
            f"N={n}) and concatenate results."
        )


def _lk_level_kernel(
    px_ref, py_ref, gx0_ref, gy0_ref, tmpl_ref, cur_ref,
    out_pts_ref, out_meta_ref,
    *, S: int, iters: int, walk_iters: int, eps: float, n_pts: int,
    H: int, W: int, sel_dtype=jnp.bfloat16, batched: bool = False,
):
    """Single-program kernel looping all points; meta = (min_eig, resid).

    Point coordinates arrive as four 1-D SMEM arrays — a 2-D (N, 2) SMEM
    layout pads the minor dim to 128 lanes (786 KB each, blowing the 1 MB
    SMEM budget).

    ``batched``: multi-lane mode (grid=(B,), one independent image pair
    per program): point arrays are full (B, N) SMEM residents indexed by
    ``program_id``; image/output refs arrive per-lane via squeezed
    BlockSpecs, so the body below is lane-agnostic.
    """
    if batched:
        lane = pl.program_id(0)

        def rd(ref, p):
            return ref[lane, p]
    else:

        def rd(ref, p):
            return ref[p]

    half = (S - 1) * 0.5

    inv_n = 1.0 / (S * S)

    def sample_cur(gx_pos, gy_pos):
        Ct, cfx, cfy = _select_tile(
            cur_ref, gy_pos - half, gx_pos - half, S, H, W, sel_dtype
        )
        return _mix(Ct, cfx, cfy)  # (S, S)

    def body(pb, _):
        # _UNROLL independent points per trip, iterated TOGETHER: their
        # GN chains have no mutual dependency, so the shared iteration
        # loop gives the scheduler ILP to hide matmul/load latency.
        tm, gx_l, gy_l, coef = [], [], [], []
        for u in range(_UNROLL):
            p = pb * _UNROLL + u
            px = rd(px_ref, p)
            py = rd(py_ref, p)
            # Template tile with a 1px gradient margin: (S+2, S+2) values
            # at (py - half - 1 + r, px - half - 1 + c).
            Tt, tfx, tfy = _select_tile(
                tmpl_ref, py - half - 1.0, px - half - 1.0, S + 2, H, W,
                sel_dtype,
            )
            T = _mix(Tt, tfx, tfy)  # (S+2, S+2) subpixel neighborhood
            tmpl = T[1:-1, 1:-1]  # (S, S)
            # Scharr gradients of the sampled patch (== sampled gradients).
            dx = 0.5 * (T[:, 2:] - T[:, :-2])  # (S+2, S)
            gxp = (3.0 * dx[:-2] + 10.0 * dx[1:-1] + 3.0 * dx[2:]) / 16.0
            dy = 0.5 * (T[2:, :] - T[:-2, :])  # (S, S+2)
            gyp = (3.0 * dy[:, :-2] + 10.0 * dy[:, 1:-1] + 3.0 * dy[:, 2:]) / 16.0

            a = jnp.sum(gxp * gxp)
            b = jnp.sum(gxp * gyp)
            c = jnp.sum(gyp * gyp)
            det = a * c - b * b
            trace = a + c
            min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4.0 * det, 0.0))) * 0.5
            min_eig = min_eig / (S * S)
            inv_det = jnp.where(det > 1e-12, 1.0 / jnp.maximum(det, 1e-12), 0.0)
            tm.append(tmpl)
            gx_l.append(gxp)
            gy_l.append(gyp)
            coef.append((a, b, c, inv_det, min_eig))

        def iter_body(_, g):
            out = []
            for u in range(_UNROLL):
                gx_pos, gy_pos = g[2 * u], g[2 * u + 1]
                a, b, c, inv_det, _me = coef[u]
                cur = sample_cur(gx_pos, gy_pos)
                it = cur - tm[u]
                bx = jnp.sum(gx_l[u] * it)
                by = jnp.sum(gy_l[u] * it)
                ddx = (c * bx - b * by) * inv_det
                ddy = (a * by - b * bx) * inv_det
                step = jnp.where(ddx * ddx + ddy * ddy < eps * eps, 0.0, 1.0)
                out.extend([gx_pos - step * ddx, gy_pos - step * ddy])
            return tuple(out)

        g0 = []
        for u in range(_UNROLL):
            p = pb * _UNROLL + u
            g0.extend([rd(gx0_ref, p), rd(gy0_ref, p)])
        walk = min(iters, walk_iters)
        polish = iters - walk
        g_fin = jax.lax.fori_loop(0, walk, iter_body, tuple(g0))

        if polish > 0:
            # Freeze-polish: one (S+3, S+3) tile per point at its
            # post-walk anchor; remaining iterations are register-level
            # selects + bilinear mixes, sampling clamped to the ~±1 px
            # cell (same formula as the jnp oracle's polish phase).  One
            # SHARED loop across the unroll — per-point loops pay a
            # scalar-core loop overhead that dwarfs the saved math.
            anchors, ptiles = [], []
            for u in range(_UNROLL):
                gx_fin, gy_fin = g_fin[2 * u], g_fin[2 * u + 1]
                tby = jnp.clip(
                    jnp.floor(gy_fin - half) - 1.0, 0.0, H - S - 3.0
                )
                tbx = jnp.clip(
                    jnp.floor(gx_fin - half) - 1.0, 0.0, W - S - 3.0
                )
                Pt, _, _ = _select_tile(cur_ref, tby, tbx, S + 2, H, W,
                                        sel_dtype)
                anchors.append((tbx, tby))
                ptiles.append(Pt)

            def psample(u, gx_p, gy_p):
                tbx, tby = anchors[u]
                Pt = ptiles[u]
                oy = jnp.clip(gy_p - half - tby, 0.0, 2.0 - 1e-4)
                ox = jnp.clip(gx_p - half - tbx, 0.0, 2.0 - 1e-4)
                iy1 = oy >= 1.0
                ix1 = ox >= 1.0
                fy = oy - iy1.astype(jnp.float32)
                fx = ox - ix1.astype(jnp.float32)
                Rt = jnp.where(iy1, Pt[1: S + 2, :], Pt[0: S + 1, :])
                Ct = jnp.where(ix1, Rt[:, 1: S + 2], Rt[:, 0: S + 1])
                return _mix(Ct, fx, fy)

            def pbody(_, g):
                out = []
                for u in range(_UNROLL):
                    gx_p, gy_p = g[2 * u], g[2 * u + 1]
                    a, b, c, inv_det, _me = coef[u]
                    cur = psample(u, gx_p, gy_p)
                    it = cur - tm[u]
                    bxs = jnp.sum(gx_l[u] * it)
                    bys = jnp.sum(gy_l[u] * it)
                    ddx = (c * bxs - b * bys) * inv_det
                    ddy = (a * bys - b * bxs) * inv_det
                    stp = jnp.where(
                        ddx * ddx + ddy * ddy < eps * eps, 0.0, 1.0
                    )
                    out.extend([gx_p - stp * ddx, gy_p - stp * ddy])
                return tuple(out)

            g_fin = jax.lax.fori_loop(0, polish, pbody, g_fin)

        for u in range(_UNROLL):
            p = pb * _UNROLL + u
            gx_fin, gy_fin = g_fin[2 * u], g_fin[2 * u + 1]
            if polish > 0:
                cur = psample(u, gx_fin, gy_fin)
            else:
                cur = sample_cur(gx_fin, gy_fin)
            tmpl = tm[u]
            mean_t = jnp.sum(tmpl) * inv_n
            var_t = jnp.sum(tmpl * tmpl) * inv_n - mean_t * mean_t
            contrast = jnp.sqrt(jnp.maximum(var_t, 0.0)) + 1e-3
            resid = jnp.sum(jnp.abs(cur - tmpl)) * inv_n / contrast
            out_pts_ref[pl.ds(p, 1), :] = jnp.stack([gx_fin, gy_fin])[None, :]
            out_meta_ref[pl.ds(p, 1), :] = jnp.stack([coef[u][4], resid])[None, :]
        return 0

    jax.lax.fori_loop(0, n_pts // _UNROLL, body, 0)


def _pad_to_kernel_geometry(img: jnp.ndarray) -> jnp.ndarray:
    """Edge-pad so superblock loads always fit: H >= 40 (mult 8), W >= 256
    (mult 128)."""
    H, W = img.shape
    Hp = max(-(-H // 8) * 8, _ROWS)
    Wp = max(-(-W // 128) * 128, _LANES)
    if (Hp, Wp) == (H, W):
        return img
    return jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")


@partial(jax.jit, static_argnames=("params", "interpret"))
def track_level(
    ref_img: jnp.ndarray,
    cur_img: jnp.ndarray,
    ref_pts: jnp.ndarray,
    guesses: jnp.ndarray,
    params: lk_ref.LKParams,
    interpret: bool = False,
):
    """Pallas level tracker; same contract as ``lk._track_level``.

    Returns (new_guesses, resid, ok).
    """
    ref_p = _pad_to_kernel_geometry(ref_img)
    cur_p = _pad_to_kernel_geometry(cur_img)
    H, W = ref_p.shape
    n_in = ref_pts.shape[0]
    if n_in % _UNROLL:
        pad = _UNROLL - n_in % _UNROLL
        ref_pts = jnp.pad(ref_pts, ((0, pad), (0, 0)), constant_values=32.0)
        guesses = jnp.pad(guesses, ((0, pad), (0, 0)), constant_values=32.0)
    n = ref_pts.shape[0]

    out_pts, out_meta = pl.pallas_call(
        partial(
            _lk_level_kernel,
            S=params.window, iters=params.iters,
            walk_iters=params.walk_iters, eps=params.eps,
            n_pts=n, H=H, W=W,
            sel_dtype=(jnp.float32 if params.select_dtype == "f32"
                       else jnp.bfloat16),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ref_pts[:, 0], ref_pts[:, 1], guesses[:, 0], guesses[:, 1], ref_p, cur_p)

    out_pts = out_pts[:n_in]
    out_meta = out_meta[:n_in]
    guesses = guesses[:n_in]
    min_eig = out_meta[:, 0]
    resid = out_meta[:, 1]
    ok = min_eig > params.min_eig
    new_guess = jnp.where(ok[:, None], out_pts, guesses)
    return new_guess, resid, ok


@partial(jax.jit, static_argnames=("params", "interpret"))
def track_level_batch(
    ref_imgs: jnp.ndarray,  # (B, H, W)
    cur_imgs: jnp.ndarray,  # (B, H, W)
    ref_pts: jnp.ndarray,  # (B, N, 2)
    guesses: jnp.ndarray,  # (B, N, 2)
    params: lk_ref.LKParams,
    interpret: bool = False,
):
    """Multi-lane :func:`track_level`: B independent image pairs in ONE
    kernel launch (grid=(B,), one program per lane).

    This is the vmap path for DP-over-sequences (bench ``--preset
    batched``): lane programs run back-to-back on the core while Mosaic's
    block pipeline prefetches the next lane's image pair into VMEM under
    the current lane's compute — B launches' worth of work for one
    dispatch and no HBM stalls between lanes.  Point arrays stay SMEM
    residents as full (B, N) arrays (48 KB at B=4, N=768 — the blocked
    per-lane layout would violate Mosaic's (8, 128) SMEM block rule).
    """
    B = ref_imgs.shape[0]
    ref_p = jax.vmap(_pad_to_kernel_geometry)(ref_imgs)
    cur_p = jax.vmap(_pad_to_kernel_geometry)(cur_imgs)
    H, W = ref_p.shape[1:]
    n_in = ref_pts.shape[1]
    if n_in % _UNROLL:
        pad = _UNROLL - n_in % _UNROLL
        ref_pts = jnp.pad(
            ref_pts, ((0, 0), (0, pad), (0, 0)), constant_values=32.0)
        guesses = jnp.pad(
            guesses, ((0, 0), (0, pad), (0, 0)), constant_values=32.0)
    n = ref_pts.shape[1]
    _check_smem_lanes("track_level_batch", B, n)

    lane_img = pl.BlockSpec(
        (None, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out_pts, out_meta = pl.pallas_call(
        partial(
            _lk_level_kernel,
            S=params.window, iters=params.iters,
            walk_iters=params.walk_iters, eps=params.eps,
            n_pts=n, H=H, W=W,
            sel_dtype=(jnp.float32 if params.select_dtype == "f32"
                       else jnp.bfloat16),
            batched=True,
        ),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, n, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, n, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            lane_img,
            lane_img,
        ],
        out_specs=(
            pl.BlockSpec((None, n, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ref_pts[..., 0], ref_pts[..., 1], guesses[..., 0], guesses[..., 1],
      ref_p, cur_p)

    out_pts = out_pts[:, :n_in]
    out_meta = out_meta[:, :n_in]
    guesses = guesses[:, :n_in]
    min_eig = out_meta[..., 0]
    resid = out_meta[..., 1]
    ok = min_eig > params.min_eig
    new_guess = jnp.where(ok[..., None], out_pts, guesses)
    return new_guess, resid, ok


@lru_cache(maxsize=None)
def _vmappable_tracker(params: lk_ref.LKParams, interpret: bool = False):
    """A :func:`track_level` whose vmap rule is :func:`track_level_batch`.

    ``jax.vmap`` cannot batch the single-lane ``pallas_call`` (its
    auto-generated per-lane SMEM BlockSpecs violate Mosaic's (8, 128)
    block rule), so DP-over-sequences — ``jax.vmap(run_sequence)`` over
    lanes — registers the explicitly-batched grid=(B,) kernel as the
    batching rule instead.  Cached per (hashable) params so repeated
    traces reuse one custom_vmap primitive.
    """

    @custom_vmap
    def f(ref_img, cur_img, ref_pts, guesses):
        return track_level(ref_img, cur_img, ref_pts, guesses, params,
                           interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, ref_img, cur_img, ref_pts, guesses):
        args = []
        for a, b in zip((ref_img, cur_img, ref_pts, guesses), in_batched):
            args.append(
                a if b
                else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
        out = track_level_batch(
            args[0], args[1], args[2], args[3], params=params,
            interpret=interpret)
        return out, (True, True, True)

    return f


def track_level_auto(ref_img, cur_img, ref_pts, guesses,
                     params: lk_ref.LKParams, interpret: bool = False):
    """Dispatch entry: single-lane semantics, lane-batched under vmap."""
    return _vmappable_tracker(params, interpret)(
        ref_img, cur_img, ref_pts, guesses)
