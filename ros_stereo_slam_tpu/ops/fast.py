"""FAST corner detector as dense vectorized ops (no gathers).

The reference uses ``cv::FAST`` to seed its ANMS demo
(``/root/reference/src/ANMS.cpp:76``) and mentions FAST seeding for the
dense path (commented at ``src/triangulation.cpp:91``).  OpenCV walks
pixels with early-exit branches; on TPU the whole FAST-9 test is
evaluated for EVERY pixel simultaneously from 16 shifted copies of the
image (VPU element-wise ops + rolls), which is exactly the kind of
dense, branch-free reformulation the hardware wants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3: (dy, dx) offsets, clockwise from 12 o'clock.
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
_ARC = 9  # FAST-9


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """img shifted so out[y, x] = img[y + dy, x + dx] (edge-replicated)."""
    return jnp.roll(img, (-dy, -dx), axis=(0, 1))


@partial(jax.jit, static_argnames=())
def fast_score(img: jnp.ndarray, thresh: float | jnp.ndarray = 12.0 / 255.0) -> jnp.ndarray:
    """FAST-9 corner response per pixel (0 where not a corner).

    Score = max over (sum of bright excesses, sum of dark excesses) across
    the qualifying contiguous arcs — the OpenCV-style corner strength.
    Border pixels (3 px) are zeroed.
    """
    ring = jnp.stack([_shift(img, dy, dx) for dy, dx in _CIRCLE])  # (16, H, W)
    diff = ring - img[None, :, :]
    bright = diff > thresh
    dark = diff < -thresh

    def contiguous_any(mask16):
        # A run of >= _ARC contiguous Trues on the 16-ring, by binary
        # doubling: R_{2k}[s] = R_k[s] & R_k[s+k] (roll along the ring
        # axis), so R9 = R8 & R1[s+8] — 4 elementwise ANDs over the
        # (16, H, W) stack instead of the naive 16 starts x 8 ANDs
        # (~30x less VPU work on a 1241x376 frame; exact same result).
        def rot(m, j):
            return jnp.roll(m, -j, axis=0)  # rot(m,j)[s] = m[(s+j) % 16]

        r2 = mask16 & rot(mask16, 1)
        r4 = r2 & rot(r2, 2)
        r8 = r4 & rot(r4, 4)
        r9 = r8 & rot(mask16, 8)
        assert _ARC == 9, "binary-doubling chain is specialized to FAST-9"
        return jnp.any(r9, axis=0)

    is_bright = contiguous_any(bright)
    is_dark = contiguous_any(dark)
    bright_score = jnp.sum(jnp.where(bright, diff - thresh, 0.0), axis=0)
    dark_score = jnp.sum(jnp.where(dark, -diff - thresh, 0.0), axis=0)
    score = jnp.where(is_bright, bright_score, 0.0) + jnp.where(is_dark, dark_score, 0.0)
    # Zero the 3px border (rolled edges wrap).
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, score, 0.0)


@partial(jax.jit, static_argnames=("capacity", "exact"))
def top_corners(
    score: jnp.ndarray, capacity: int, exact: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-`capacity` scoring pixels -> ((N,2) xy points, (N,) scores,
    (N,) valid).  3x3 non-max suppression first so responses are peaks.

    Selection uses ``lax.approx_max_k`` (recall ~0.95): the exact top-k
    over the flattened frame was the single most expensive op in the
    detection step (~0.78 ms of a 1241x376 frame's 1.53 ms ORB budget on
    TPU v5e — a 467k-lane sort for ~2k survivors), while the candidate
    set feeds ANMS, which only needs a well-spread superset (capacity is
    4x the kept budget).  `exact=True` restores the sort for oracle use.
    """
    # 3x3 NMS via shifted maxes.
    m = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, _shift(score, dy, dx))
    peak = jnp.where(score >= m, score, 0.0)
    flat = peak.ravel()
    if exact or capacity >= flat.shape[0]:
        vals, idx = jax.lax.top_k(flat, min(capacity, flat.shape[0]))
    else:
        vals, idx = jax.lax.approx_max_k(flat, capacity, recall_target=0.95)
    w = score.shape[1]
    pts = jnp.stack([(idx % w).astype(jnp.float32), (idx // w).astype(jnp.float32)], axis=1)
    return pts, vals, vals > 0.0
