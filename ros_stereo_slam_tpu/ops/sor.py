"""Statistical outlier removal (reference C14).

TPU-native replacement for PCL's ``StatisticalOutlierRemoval`` as used by
``visualSLAM::SORcloud`` (``/root/reference/src/rosFuncs.cpp:9-39``,
meanK=200, stddev mult 0.01, z cutoff 500) and the SGBM node
(``src/StereoCV.cpp:275-295``, meanK=20, 0.8).

PCL walks a KD-tree per point; here the kNN mean distance is computed
from the full masked pairwise-distance matrix — an (N, N) matmul-shaped
reduction plus a top-k, which the MXU/VPU handle directly (N is the
fixed block capacity, ~1.5k points -> 2.4M distances, trivial on-chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e30


@partial(jax.jit, static_argnames=("mean_k",))
def sor_filter(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    mean_k: int = 32,
    std_mul: float | jnp.ndarray = 1.0,
    max_depth: float | jnp.ndarray = 500.0,
) -> jnp.ndarray:
    """Masked SOR: returns the filtered validity mask.

    points: (N, 3); mask: (N,) bool.  A point survives iff its mean
    distance to its `mean_k` nearest valid neighbours is within
    mu + std_mul * sigma of the population, and its z is within
    (0, max_depth) — the reference's depth cutoff (rosFuncs.cpp:12-14).
    """
    z_ok = (points[:, 2] > 0.0) & (points[:, 2] < max_depth)
    m = mask & z_ok
    # Pairwise squared distances via the Gram trick (MXU).
    sq = jnp.sum(points * points, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (points @ points.T)
    d2 = jnp.maximum(d2, 0.0)
    # Mask out invalid neighbours and self-distance.
    n = points.shape[0]
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(m[None, :] & ~eye, d2, _BIG)
    # kNN mean distance per point.
    neg_top, _ = jax.lax.top_k(-d2, mean_k)
    knn_d = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    knn_valid = -neg_top < _BIG * 0.5
    counts = jnp.maximum(jnp.sum(knn_valid, axis=1), 1)
    mean_d = jnp.sum(jnp.where(knn_valid, knn_d, 0.0), axis=1) / counts
    # Population statistics over valid points.
    n_valid = jnp.maximum(jnp.sum(m), 1)
    mu = jnp.sum(jnp.where(m, mean_d, 0.0)) / n_valid
    var = jnp.sum(jnp.where(m, (mean_d - mu) ** 2, 0.0)) / n_valid
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    keep = mean_d <= mu + std_mul * sigma
    return m & keep
