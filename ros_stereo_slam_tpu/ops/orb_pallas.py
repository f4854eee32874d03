"""Pallas TPU kernel for ORB orientation + rotated-BRIEF descriptors.

The jnp reference path (``ops/orb.py::detect_and_compute``) samples
~620k bilinear points per frame through XLA gathers — measured
~25 ms/frame on v5e (TPU gathers are near-scalar).  This kernel keeps
the whole image in VMEM and, per keypoint:

1. selects ONE integer-aligned (44, 44) tile around the corner with the
   aligned-superblock + one-hot-matmul trick of
   :mod:`ros_stereo_slam_tpu.ops.lk_pallas` (FAST corners are integer,
   so no sub-pixel mix is needed);
2. computes the intensity-centroid moments m10/m01 as two static-mask
   reductions over the tile — the rotation's cos/sin come directly from
   the normalized moments, no atan2 in-kernel;
3. samples all 512 rotated BRIEF positions with bilinear TENT-WEIGHT
   matmuls: ``U = Wy @ tile`` (one MXU matmul; row b of Wy holds the
   2-tap tent weights ``relu(1 - |y_b - iota|)``), then
   ``s_b = sum_x U[b] * Wx[b]`` — a VPU row reduction.  No gathers
   anywhere.

Replaces the descriptor stage of ``cv::ORB::detectAndCompute`` as used
per frame by the reference's loop detector
(``/root/reference/src/optimizationStuff.cpp:50-55``).  The jnp path
remains the CPU/test oracle.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_stereo_slam_tpu.ops import orb as orb_ref

_ROWS = 56  # 8-aligned; row offset <8 + 44-tile fits
_LANES = 256  # 128-aligned; col offset <128 + 44-tile fits
_TILE = 44  # integer tile: center at 21, pattern reach <=19.8, +bilinear
_HALF = 21
_UNROLL = 8


def _static_consts():
    """Kernel constants: concatenated pattern offsets + centroid masks."""
    pat = np.concatenate([orb_ref._PAT_P, orb_ref._PAT_Q], axis=0)  # (512, 2)
    px, py = pat[:, 0].copy(), pat[:, 1].copy()
    wxc = np.zeros((_TILE, _TILE), np.float32)
    wyc = np.zeros((_TILE, _TILE), np.float32)
    for dx, dy in orb_ref._CENT:
        wxc[int(dy) + _HALF, int(dx) + _HALF] = dx
        wyc[int(dy) + _HALF, int(dx) + _HALF] = dy
    return px, py, wxc, wyc


_PX, _PY, _WXC, _WYC = _static_consts()


def _select_tile_int(img_ref, yi, xi, H: int, W: int, sel_dtype):
    """Integer-aligned (_TILE, _TILE) tile with top-left (yi, xi)."""
    yi = jnp.clip(yi, 0, H - _TILE)
    xi = jnp.clip(xi, 0, W - _TILE)
    y8 = jnp.minimum((yi // 8) * 8, H - _ROWS)
    x128 = jnp.minimum((xi // 128) * 128, W - _LANES)
    iy = yi - y8
    ix = xi - x128
    big = img_ref[
        pl.ds(pl.multiple_of(y8, 8), _ROWS),
        pl.ds(pl.multiple_of(x128, 128), _LANES),
    ]  # (56, 256)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 64), 0)
    c_col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 64), 1)
    CS = (k_col == c_col + ix).astype(sel_dtype)  # (256, 64)
    cols = jnp.dot(big.astype(sel_dtype), CS,
                   precision=jax.lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)  # (56, 64)
    D = pltpu.roll(cols, _ROWS - iy, axis=0)
    return D[:_TILE, :_TILE]


def _orb_desc_kernel(
    px_ref, py_ref, img_ref, pat_ref, wc_ref, out_sign_ref, out_m_ref,
    *, n_pts: int, H: int, W: int, sel_dtype, batched: bool = False,
):
    # `batched`: grid=(B,) multi-lane mode (see lk_pallas._lk_level_kernel)
    # — point arrays are full (B, N) SMEM residents, image/output refs
    # arrive per-lane via squeezed BlockSpecs, consts stay shared.
    if batched:
        lane = pl.program_id(0)

        def rd(ref, p):
            return ref[lane, p]
    else:

        def rd(ref, p):
            return ref[p]

    patx = pat_ref[0, :]  # (512,)
    paty = pat_ref[1, :]
    wxc = wc_ref[0]  # (44, 44)
    wyc = wc_ref[1]
    iota_t = jax.lax.broadcasted_iota(
        jnp.int32, (2 * orb_ref.N_BITS, _TILE), 1
    ).astype(jnp.float32)

    def body(pb, _):
        for u in range(_UNROLL):
            p = pb * _UNROLL + u
            px = rd(px_ref, p)
            py = rd(py_ref, p)
            xi = jnp.floor(px).astype(jnp.int32) - _HALF
            yi = jnp.floor(py).astype(jnp.int32) - _HALF
            tile = _select_tile_int(img_ref, yi, xi, H, W, sel_dtype)

            # intensity-centroid orientation -> cos/sin directly
            m10 = jnp.sum(tile * wxc)
            m01 = jnp.sum(tile * wyc)
            r = jnp.sqrt(jnp.maximum(m10 * m10 + m01 * m01, 1e-18))
            ca = m10 / r
            sa = m01 / r

            # rotated sample positions in tile coordinates
            xs = _HALF + ca * patx - sa * paty  # (512,)
            ys = _HALF + sa * patx + ca * paty
            xs = jnp.clip(xs, 0.0, _TILE - 1.001)
            ys = jnp.clip(ys, 0.0, _TILE - 1.001)

            # bilinear tent weights: (512, 44) each
            wy = jnp.maximum(1.0 - jnp.abs(ys[:, None] - iota_t), 0.0)
            wx = jnp.maximum(1.0 - jnp.abs(xs[:, None] - iota_t), 0.0)
            U = jnp.dot(wy.astype(sel_dtype), tile.astype(sel_dtype),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)  # (512, 44)
            s = jnp.sum(U * wx, axis=1)  # (512,)
            vp = s[: orb_ref.N_BITS]
            vq = s[orb_ref.N_BITS:]
            sign = jnp.where(vp < vq, 1.0, -1.0)
            out_sign_ref[pl.ds(p, 1), :] = sign[None, :]
            out_m_ref[pl.ds(p, 1), :] = jnp.stack([m10, m01])[None, :]
        return 0

    jax.lax.fori_loop(0, n_pts // _UNROLL, body, 0)


def _pad_img(img: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    Hp = max(-(-H // 8) * 8, _ROWS)
    Wp = max(-(-W // 128) * 128, _LANES)
    if (Hp, Wp) == (H, W):
        return img
    return jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")


@partial(jax.jit, static_argnames=("select_dtype", "interpret"))
def orb_descriptors(
    img: jnp.ndarray,
    pts: jnp.ndarray,  # (N, 2) float xy (integer-valued corner positions)
    select_dtype: str = "bf16",
    interpret: bool = False,
):
    """Per-keypoint (sign descriptors (N, 256), moments (N, 2)).

    ``angle = arctan2(m01, m10)`` — computed by the caller (cheap, and
    keeps transcendentals out of the kernel).
    """
    imgp = _pad_img(img)
    H, W = imgp.shape
    n_in = pts.shape[0]
    if n_in % _UNROLL:
        pad = _UNROLL - n_in % _UNROLL
        pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=64.0)
    n = pts.shape[0]
    sign, m = pl.pallas_call(
        partial(
            _orb_desc_kernel, n_pts=n, H=H, W=W,
            sel_dtype=(jnp.float32 if select_dtype == "f32"
                       else jnp.bfloat16),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, orb_ref.N_BITS), jnp.float32),
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        pts[:, 0], pts[:, 1], imgp,
        jnp.asarray(np.stack([_PX, _PY])),
        jnp.asarray(np.stack([_WXC, _WYC])),
    )
    return sign[:n_in], m[:n_in]


@partial(jax.jit, static_argnames=("select_dtype", "interpret"))
def orb_descriptors_batch(
    imgs: jnp.ndarray,  # (B, H, W)
    pts: jnp.ndarray,  # (B, N, 2)
    select_dtype: str = "bf16",
    interpret: bool = False,
):
    """Multi-lane :func:`orb_descriptors`: B images in ONE kernel launch
    (grid=(B,)) — the vmap path for batched full SLAM (DP-over-sequences:
    every lane's loop-detection ORB in one dispatch, next lane's image
    prefetched under the current lane's compute)."""
    B = imgs.shape[0]
    imgp = jax.vmap(_pad_img)(imgs)
    H, W = imgp.shape[1:]
    n_in = pts.shape[1]
    if n_in % _UNROLL:
        pad = _UNROLL - n_in % _UNROLL
        pts = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)), constant_values=64.0)
    n = pts.shape[1]
    from ros_stereo_slam_tpu.ops.lk_pallas import _check_smem_lanes

    _check_smem_lanes("orb_descriptors_batch", B, n, arrays=2)
    sign, m = pl.pallas_call(
        partial(
            _orb_desc_kernel, n_pts=n, H=H, W=W,
            sel_dtype=(jnp.float32 if select_dtype == "f32"
                       else jnp.bfloat16),
            batched=True,
        ),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, n, orb_ref.N_BITS), jnp.float32),
            jax.ShapeDtypeStruct((B, n, 2), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, n, orb_ref.N_BITS), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        pts[..., 0], pts[..., 1], imgp,
        jnp.asarray(np.stack([_PX, _PY])),
        jnp.asarray(np.stack([_WXC, _WYC])),
    )
    return sign[:, :n_in], m[:, :n_in]


@lru_cache(maxsize=None)
def _vmappable_descriptors(select_dtype: str, interpret: bool):
    """orb_descriptors with :func:`orb_descriptors_batch` as its vmap
    rule (see lk_pallas._vmappable_tracker for the rationale)."""

    @custom_vmap
    def f(img, pts):
        return orb_descriptors(img, pts, select_dtype=select_dtype,
                               interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, img, pts):
        args = []
        for a, b in zip((img, pts), in_batched):
            args.append(
                a if b
                else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
        out = orb_descriptors_batch(
            args[0], args[1], select_dtype=select_dtype,
            interpret=interpret)
        return out, (True, True)

    return f


def orb_descriptors_auto(img, pts, select_dtype: str = "bf16",
                         interpret: bool = False):
    """Dispatch entry: single-lane semantics, lane-batched under vmap."""
    return _vmappable_descriptors(select_dtype, interpret)(img, pts)
