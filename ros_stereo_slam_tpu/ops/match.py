"""Batched binary-descriptor matching (reference's BFMatcher paths).

The reference's non-dense stereo variant extracts ORB/SURF per view on two
transient threads and brute-force matches descriptors
(``/root/reference/src/triangulation.cpp:104-134``); its loop-closure
geometric check uses a neighbour-ratio matcher
(``include/TemplatedLoopDetector.h:1256-1315``, ratio 0.6).

TPU-native design: ALL pairwise Hamming distances at once as one
sign-vector matmul on the MXU (256-bit descriptors as +/-1 float rows:
``hamming = (256 - sa @ sb^T) / 2``), then masked argmin rows/columns for
mutual-nearest, a second-best pass for the ratio test, and fixed-capacity
outputs with validity masks (no compaction).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ros_stereo_slam_tpu.ops.orb import N_BITS, hamming_mxu


class MatchResult(NamedTuple):
    idx: jnp.ndarray  # (N,) int32 — index into B for each A row
    dist: jnp.ndarray  # (N,) float32 — Hamming distance of the match
    valid: jnp.ndarray  # (N,) bool


def mutual_hamming_match(
    sign_a: jnp.ndarray,  # (N, 256) +/-1 rows (invalid rows all-zero)
    valid_a: jnp.ndarray,  # (N,) bool
    sign_b: jnp.ndarray,  # (M, 256)
    valid_b: jnp.ndarray,  # (M,) bool
    max_dist: float | jnp.ndarray = 64.0,
    ratio: float | jnp.ndarray = 0.8,
    pair_mask: jnp.ndarray | None = None,  # (N, M) optional extra gate
) -> MatchResult:
    """Mutual-nearest + Lowe-ratio matching over a full distance matrix."""
    big = jnp.float32(4 * N_BITS)
    d = hamming_mxu(sign_a, sign_b)  # (N, M)
    gate = valid_a[:, None] & valid_b[None, :]
    if pair_mask is not None:
        gate = gate & pair_mask
    d = jnp.where(gate, d, big)

    best_j = jnp.argmin(d, axis=1)  # (N,)
    best_d = jnp.take_along_axis(d, best_j[:, None], axis=1)[:, 0]
    # second best for the neighbour-ratio test
    d2 = d.at[jnp.arange(d.shape[0]), best_j].set(big)
    second_d = jnp.min(d2, axis=1)
    # mutual check: is A-row i also the best for column best_j[i]?
    best_i_of_b = jnp.argmin(d, axis=0)  # (M,)
    mutual = best_i_of_b[best_j] == jnp.arange(d.shape[0])

    valid = (
        valid_a
        & mutual
        & (best_d <= max_dist)
        # strict: an exact tie (duplicate descriptor in B) is ambiguous
        & (best_d < ratio * second_d)
    )
    return MatchResult(idx=best_j.astype(jnp.int32), dist=best_d, valid=valid)
