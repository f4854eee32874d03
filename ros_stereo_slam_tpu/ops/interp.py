"""Bilinear patch sampling, batched over points.

TPUs have no texture units; the LK/ORB kernels need many small sub-pixel
patch reads (SURVEY.md §7 "LK gather-heavy interpolation").  Strategy: one
integer-aligned ``dynamic_slice`` of (size+1, size+1) per point (vmapped →
a single fused gather), then the 4-tap bilinear mix as shifted in-register
slices — avoiding a 4x larger gather index tensor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def extract_patch(img: jnp.ndarray, center_xy: jnp.ndarray, size: int) -> jnp.ndarray:
    """Sample a (size, size) patch centered at float (x, y), bilinear.

    Patch pixel (r, c) samples img at
    (y - (size-1)/2 + r, x - (size-1)/2 + c).
    Out-of-bounds reads are clamped (callers maintain validity masks).
    """
    half = (size - 1) * 0.5
    x0 = center_xy[0] - half
    y0 = center_xy[1] - half
    xi = jnp.floor(x0)
    yi = jnp.floor(y0)
    fx = x0 - xi
    fy = y0 - yi
    patch = lax.dynamic_slice(
        img,
        (yi.astype(jnp.int32), xi.astype(jnp.int32)),
        (size + 1, size + 1),
    )
    top = patch[:-1, :-1] * (1.0 - fx) + patch[:-1, 1:] * fx
    bot = patch[1:, :-1] * (1.0 - fx) + patch[1:, 1:] * fx
    return top * (1.0 - fy) + bot * fy


@partial(jax.jit, static_argnames=("size",))
def extract_patches(img: jnp.ndarray, centers_xy: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, 2) centers -> (N, size, size) bilinear patches."""
    return jax.vmap(lambda c: extract_patch(img, c, size))(centers_xy)


def bilinear_at(img: jnp.ndarray, pts_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear point samples: (N, 2) float (x, y) -> (N,) values."""
    h, w = img.shape
    x = jnp.clip(pts_xy[:, 0], 0.0, w - 1.001)
    y = jnp.clip(pts_xy[:, 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def in_bounds(pts_xy: jnp.ndarray, h: int, w: int, margin: float) -> jnp.ndarray:
    """(N,) bool mask: point at least `margin` px inside the image."""
    return (
        (pts_xy[:, 0] >= margin)
        & (pts_xy[:, 0] < w - margin)
        & (pts_xy[:, 1] >= margin)
        & (pts_xy[:, 1] < h - margin)
    )
