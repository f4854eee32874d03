"""Batched 8-point fundamental-matrix RANSAC (reference C5).

TPU-native replacement for ``cv::findFundamentalMat`` as used by the
reference's geometric gates (``/root/reference/src/tracking.cpp:30-43``
``FmatThresholding`` — RANSAC 3.0 px / 0.99 — and the 8-point gate inside
``PyrLKtrackFrame2Frame`` ``:75`` at 1.0 px) and by the loop-closure
geometric check (``include/TemplatedLoopDetector.h:1081``).

OpenCV's RANSAC is sequential-adaptive; here the hypothesis budget is
FIXED and all hypotheses are evaluated in parallel (SURVEY.md §7):

1. sample K minimal sets of 8 via per-hypothesis Gumbel-top-k over the
   validity mask (PRNG-keyed -> deterministic);
2. per-hypothesis normalized 8-point solve — the null vector of the 8x9
   design matrix via a batched 9x9 symmetric eigendecomposition;
3. rank-2 projection via batched 3x3 SVD;
4. scoring = Sampson distance of ALL points against ALL hypotheses as a
   single (K, N) masked reduction riding on matmuls (MXU).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.ops import linalg


class FRansacResult(NamedTuple):
    F: jnp.ndarray  # (3, 3) best fundamental matrix
    inliers: jnp.ndarray  # (N,) bool (subset of input validity mask)
    n_inliers: jnp.ndarray  # () int32
    errors: jnp.ndarray  # (N,) Sampson distance for best F (px^2-ish)


def _sample_minimal_sets(key, mask, k_hyp: int, m: int) -> jnp.ndarray:
    """(k_hyp, m) indices of valid points, sampled w/o replacement per row."""
    n = mask.shape[0]
    g = jax.random.gumbel(key, (k_hyp, n))
    scores = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, m)
    return idx


def _normalization_stats(pts: jnp.ndarray, mask: jnp.ndarray):
    """Hartley normalization statistics (mean, scale) of a masked point set."""
    wsum = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=1))
    mean_d = jnp.sum(jnp.where(mask, d, 0.0)) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-6)
    return mean, s


def _build_T(mean, s):
    return jnp.asarray(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    ).astype(mean.dtype).at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])


def _epipolar_design(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) x (N, 2) -> (N, 9) rows of the epipolar constraint system."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )


def _rank2(F: jnp.ndarray) -> jnp.ndarray:
    """Nearest rank-2 matrix: F (I - v3 v3^T) with v3 the smallest right
    singular vector (from the analytic 3x3 eigh of F^T F) — identical to
    zeroing sigma_3 in the SVD, without the serial QDWH/EighTpu path."""
    _, V = linalg.eigh3x3(jnp.swapaxes(F, -1, -2) @ F)
    v3 = V[..., :, 0]
    return F - (F @ v3[..., :, None]) * v3[..., None, :]


def _eight_point(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """8-point solve on (8, 2) + (8, 2) -> (3, 3) F.

    Caller pre-normalizes coordinates (essential for f32: the null-vector
    extraction works on A^T A).  Batched inverse iteration replaces the
    tiny-SVD LAPACK path, which is serial and ~10x slower on TPU.
    """
    A = _epipolar_design(p1, p2)  # (8, 9)
    return _rank2(linalg.null_vector(A).reshape(3, 3))


def _weighted_refit(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Least-squares F refit over all points with weights w (N,)."""
    A = _epipolar_design(p1, p2) * w[:, None]
    return _rank2(linalg.null_vector(A).reshape(3, 3))


def sampson_distance(F: jnp.ndarray, p1h: jnp.ndarray, p2h: jnp.ndarray) -> jnp.ndarray:
    """Sampson distance for (N, 3) homogeneous pairs under (..., 3, 3) F.

    Returns (..., N).  The contractions are matmuls -> MXU-friendly.
    """
    Fx1 = jnp.einsum("...ij,nj->...ni", F, p1h)
    Ftx2 = jnp.einsum("...ji,nj->...ni", F, p2h)
    x2Fx1 = jnp.einsum("ni,...ni->...n", p2h, Fx1)
    denom = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return x2Fx1**2 / jnp.maximum(denom, 1e-12)


@partial(jax.jit, static_argnames=("iters",))
def fmat_ransac(
    key: jax.Array,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    thresh_px: float | jnp.ndarray = 1.0,
    iters: int = 256,
) -> FRansacResult:
    """RANSAC F-matrix on (N, 2) correspondences with validity `mask`."""
    n = pts1.shape[0]
    idx = _sample_minimal_sets(key, mask, iters, 8)  # (K, 8)

    T1 = _build_T(*_normalization_stats(pts1, mask))
    T2 = _build_T(*_normalization_stats(pts2, mask))
    p1n = pts1 * T1[0, 0] + T1[:2, 2][None, :]
    p2n = pts2 * T2[0, 0] + T2[:2, 2][None, :]

    samp1 = p1n[idx]  # (K, 8, 2)
    samp2 = p2n[idx]
    Fn = jax.vmap(_eight_point)(samp1, samp2)  # (K, 3, 3) in normalized coords
    F = jnp.einsum("ji,kjl,lm->kim", T2, Fn, T1)  # denormalize: T2^T Fn T1

    p1h = jnp.concatenate([pts1, jnp.ones((n, 1), pts1.dtype)], axis=1)
    p2h = jnp.concatenate([pts2, jnp.ones((n, 1), pts2.dtype)], axis=1)
    err = sampson_distance(F, p1h, p2h)  # (K, N)
    inl = (err < thresh_px**2) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # Least-squares refit on the best inlier set (masked, normalized
    # coordinates), then re-score — mirrors OpenCV's final polish.
    w = inl[best].astype(pts1.dtype)
    Fn_refit = _weighted_refit(p1n, p2n, w)
    F_refit = T2.T @ Fn_refit @ T1
    err_refit = sampson_distance(F_refit, p1h, p2h)
    inl_refit = (err_refit < thresh_px**2) & mask
    # Keep the refit only if it does not lose inliers (degenerate guards).
    better = jnp.sum(inl_refit) >= counts[best]
    best_F = jnp.where(better, F_refit, F[best])
    best_inl = jnp.where(better, inl_refit, inl[best])
    best_err = jnp.where(better, err_refit, err[best])
    return FRansacResult(
        F=best_F,
        inliers=best_inl,
        n_inliers=jnp.sum(best_inl),
        errors=best_err,
    )
