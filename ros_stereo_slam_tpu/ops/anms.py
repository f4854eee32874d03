"""Adaptive non-maximal suppression (reference C3).

TPU-native re-design of ``adaptiveNonMaximalSuppresion``
(``/root/reference/src/ANMS.cpp:18-67``): the reference loops each
keypoint against all stronger keypoints to find its suppression radius
(O(N^2) scalar loops).  Here the same math is one masked (N, N)
pairwise-distance matrix (Gram matmul on the MXU) + a row-min + top-k:

  radius_i = min_j { ||p_i - p_j|| : score_j > robust_coeff * score_i }

and the `keep` points are those with the largest radii — identical
selection semantics, zero loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e30


@partial(jax.jit, static_argnames=("num_keep",))
def anms(
    pts: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    num_keep: int,
    robust_coeff: float | jnp.ndarray = 1.11,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select `num_keep` spatially-spread strong keypoints.

    pts: (N, 2) xy; scores: (N,); mask: (N,) validity.
    Returns (selected (num_keep, 2) points, (num_keep,) valid mask).
    """
    d2 = (
        jnp.sum(pts * pts, axis=1)[:, None]
        + jnp.sum(pts * pts, axis=1)[None, :]
        - 2.0 * (pts @ pts.T)
    )
    d2 = jnp.maximum(d2, 0.0)
    stronger = (scores[None, :] > robust_coeff * scores[:, None]) & mask[None, :]
    d2 = jnp.where(stronger, d2, _BIG)
    radius2 = jnp.min(d2, axis=1)  # inf for the global maximum — kept first
    radius2 = jnp.where(mask, radius2, -1.0)
    vals, idx = jax.lax.top_k(radius2, num_keep)
    return pts[idx], vals > 0.0
