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
        # A run of >= _ARC contiguous Trues on the 16-ring: AND of _ARC
        # circularly-consecutive masks, tried at every start position.
        hit = jnp.zeros_like(mask16[0], dtype=bool)
        for s in range(16):
            run = mask16[s]
            for k in range(1, _ARC):
                run = run & mask16[(s + k) % 16]
            hit = hit | run
        return hit

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


@partial(jax.jit, static_argnames=("capacity",))
def top_corners(score: jnp.ndarray, capacity: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-`capacity` scoring pixels -> ((N,2) xy points, (N,) scores,
    (N,) valid).  3x3 non-max suppression first so responses are peaks."""
    # 3x3 NMS via shifted maxes.
    m = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, _shift(score, dy, dx))
    peak = jnp.where(score >= m, score, 0.0)
    flat = peak.ravel()
    vals, idx = jax.lax.top_k(flat, capacity)
    w = score.shape[1]
    pts = jnp.stack([(idx % w).astype(jnp.float32), (idx // w).astype(jnp.float32)], axis=1)
    return pts, vals, vals > 0.0
