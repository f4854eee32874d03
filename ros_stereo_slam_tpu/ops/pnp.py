"""Batched PnP-RANSAC localization with SE(3) Gauss-Newton polish
(reference C7).

TPU-native replacement for ``cv::solvePnPRansac`` as driven by
``visualSLAM::PerspectiveNpointEstimation``
(``/root/reference/src/rosFuncs.cpp:73-94``): estimate the cam-from-world
pose from tracked 3D<->2D correspondences, count inliers at a pixel
threshold, with a retry ladder at a looser threshold (``:85-93``).

Design: K minimal 6-point DLT hypotheses solved in one vmapped batch
(12x12 eigendecompositions), all-hypotheses-vs-all-points reprojection
scoring as masked (K, N) matmul reductions, then a fixed-iteration
Huber-IRLS Gauss-Newton refinement on the best hypothesis' inliers.
OpenCV's sequential-adaptive loop becomes a fixed parallel budget
(SURVEY.md §7); the retry ladder lives in the caller as host logic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.ops import linalg
from ros_stereo_slam_tpu.ops.ransac import _sample_minimal_sets
from ros_stereo_slam_tpu.utils import lie
from ros_stereo_slam_tpu.utils.camera import Pinhole


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4) cam-from-world
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    errors: jnp.ndarray  # (N,) reprojection error (px) under final pose
    used_retry: jnp.ndarray  # () bool — loose-threshold ladder engaged


def _p6p_dlt(X: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Minimal-ish DLT: 6 world points + normalized image coords -> T (3, 4).

    Solves x_n ~ [R|t] X_h with the 12-dof projective DLT, then projects
    onto SE(3): orthogonal Procrustes on the rotation block, scale from its
    singular values, cheirality by majority positive depth.
    """
    # Normalize world points (zero mean, unit RMS) — f32 conditioning of the
    # DLT demands it (world coords span tens of meters vs O(1) image coords).
    mean = jnp.mean(X, axis=0)
    scale = jnp.sqrt(jnp.mean(jnp.sum((X - mean) ** 2, axis=1))) / jnp.sqrt(3.0)
    scale = jnp.maximum(scale, 1e-6)
    Xn = (X - mean) / scale
    ones = jnp.ones((X.shape[0], 1), X.dtype)
    Xh = jnp.concatenate([Xn, ones], axis=1)  # (6, 4)
    zeros = jnp.zeros_like(Xh)
    rows_u = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=1)
    rows_v = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (12, 12)
    Mn = linalg.null_vector(A).reshape(3, 4)
    # Denormalize: x ~ Mn @ N @ X_h with N = [[I/s, -mean/s], [0, 1]].
    N = jnp.eye(4, dtype=X.dtype) / scale
    N = N.at[3, 3].set(1.0)
    N = N.at[:3, 3].set(-mean / scale)
    M = Mn @ N
    # Cheirality: fix the projective sign so most sample depths are positive.
    z = jnp.concatenate([X, ones], axis=1) @ M[2, :]
    M = jnp.where(jnp.sum(z > 0) < 3, -M, M)
    B = M[:, :3]
    # Orthogonal Procrustes without the QDWH SVD custom call: eigh of
    # B^T B gives V and singular values; U columns from B v (the smallest
    # one re-orthogonalized by cross product for near-degenerate B).
    lam, V = linalg.eigh3x3(B.T @ B)  # ascending
    s_desc = jnp.sqrt(jnp.maximum(lam[::-1], 1e-24))  # s0 >= s1 >= s2
    # Proper (det +1) singular bases: third columns by cross product, so
    # B = U diag(s0, s1, sign(det B) * s2) Vd^T exactly (Kabsch form).
    v0 = V[:, 2]
    v1 = V[:, 1]
    Vd = jnp.stack([v0, v1, jnp.cross(v0, v1)], axis=1)
    u0 = B @ v0 / s_desc[0]
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0), 1e-12)
    u1 = B @ v1 / s_desc[1]
    u1 = u1 - jnp.dot(u1, u0) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-12)
    u2 = jnp.cross(u0, u1)
    U = jnp.stack([u0, u1, u2], axis=1)
    detB = linalg.det3x3(B)
    detuv = jnp.sign(detB) + (detB == 0.0)
    d = jnp.asarray([1.0, 1.0, 1.0], X.dtype).at[2].set(detuv)
    R = (U * d[None, :]) @ Vd.T
    scale = 3.0 / jnp.maximum(
        s_desc[0] + s_desc[1] + s_desc[2] * detuv, 1e-12
    )
    t = M[:, 3] * scale
    return R, t


def _reproj_errors(cam: Pinhole, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray):
    """(..., 3, 3) R, (..., 3) t vs (N, 3) X, (N, 2) uv -> (..., N) px errors."""
    pc = jnp.einsum("...ij,nj->...ni", R, X) + t[..., None, :]
    z = pc[..., 2]
    pos = z > 1e-3
    zs = jnp.where(pos, z, 1.0)
    u = cam.fx * pc[..., 0] / zs + cam.cx
    v = cam.fy * pc[..., 1] / zs + cam.cy
    err = jnp.sqrt((u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2)
    return jnp.where(pos, err, 1e9)


def _gn_refine(
    cam: Pinhole,
    T0: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    weights_mask: jnp.ndarray,
    iters: int,
    huber_px: float = 2.0,
    damping: float = 1e-4,
) -> jnp.ndarray:
    """Huber-IRLS Gauss-Newton on SE(3); all reductions are (N,6)-matmuls."""

    def step(_, T):
        R, t = T[:3, :3], T[:3, 3]
        pc = X @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-3)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], axis=1)  # (N, 2)
        # 2x3 projection Jacobian wrt camera-frame point
        inv_z = 1.0 / z
        Ju = jnp.stack(
            [cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * pc[:, 0] * inv_z * inv_z],
            axis=1,
        )
        Jv = jnp.stack(
            [jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * pc[:, 1] * inv_z * inv_z],
            axis=1,
        )
        # dp/dxi for left-multiplied twist: [I | -hat(p)] (N, 3, 6)
        def dpdxi(p):
            return jnp.concatenate([jnp.eye(3, dtype=p.dtype), -lie.hat_so3(p)], axis=1)

        Jp = jax.vmap(dpdxi)(pc)  # (N, 3, 6)
        Jrow_u = jnp.einsum("ni,nij->nj", Ju, Jp)  # (N, 6)
        Jrow_v = jnp.einsum("ni,nij->nj", Jv, Jp)
        J = jnp.stack([Jrow_u, Jrow_v], axis=1)  # (N, 2, 6)
        # Huber IRLS weights on the residual norm
        rn = jnp.linalg.norm(r, axis=1)
        wh = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        wgt = wh * weights_mask
        Jw = J * wgt[:, None, None]
        H = jnp.einsum("nki,nkj->ij", Jw, J) + damping * jnp.eye(6, dtype=T.dtype)
        b = jnp.einsum("nki,nk->i", Jw, r)
        # H is SPD (damped normal equations): unrolled Cholesky instead of
        # the serial LuDecompositionBlock custom call.
        dxi = linalg.spd_solve(H, -b)
        return lie.exp_se3(dxi) @ T

    # Unrolled: at <=8 fixed iterations the TPU while-loop's per-trip
    # overhead (~40 us) costs more than the loop body.
    T = T0
    for i in range(iters):
        T = step(i, T)
    return T


@partial(jax.jit, static_argnames=("iters", "refine_iters"))
def pnp_ransac(
    key: jax.Array,
    cam: Pinhole,
    pts3d: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    thresh_px: float | jnp.ndarray = 1.0,
    iters: int = 256,
    refine_iters: int = 8,
    T_init: jnp.ndarray | None = None,
    retry_thresh_px: float | jnp.ndarray | None = None,
    min_inliers: int | jnp.ndarray = 0,
    huber_px: float = 0.5,
) -> PnPResult:
    """RANSAC + GN PnP on (N, 3) world points vs (N, 2) observations.

    `T_init` (optional 4x4 prior, e.g. the previous frame's pose): adds a
    second hypothesis family — GN refinements of the prior on random
    minimal subsets.  The P6P DLT is degenerate for coplanar landmarks
    (single-wall / ground-plane views); prior-seeded GN hypotheses have no
    such degeneracy and keep RANSAC alive on planar scenes.
    """
    k_dlt, k_gn = jax.random.split(key)
    idx = _sample_minimal_sets(k_dlt, mask, iters, 6)  # (K, 6)
    Xs = pts3d[idx]  # (K, 6, 3)
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    xns = xn[idx]  # (K, 6, 2)
    Rk, tk = jax.vmap(_p6p_dlt)(Xs, xns)  # (K, 3, 3), (K, 3)

    if T_init is not None:
        n_gn = max(iters // 4, 16)
        idx2 = _sample_minimal_sets(k_gn, mask, n_gn, 8)  # (K2, 8)

        def gn_hyp(Xs8, uv8):
            # GN on just the 8 sampled points (not a one-hot over all N —
            # that wastes N/8 x the Jacobian work for identical results).
            return _gn_refine(cam, T_init, Xs8, uv8,
                              jnp.ones((8,), pts3d.dtype), 5)

        T_gn = jax.vmap(gn_hyp)(pts3d[idx2], uv[idx2])  # (K2, 4, 4)
        Rk = jnp.concatenate([Rk, T_gn[:, :3, :3]], axis=0)
        tk = jnp.concatenate([tk, T_gn[:, :3, 3]], axis=0)

    err = _reproj_errors(cam, Rk, tk, pts3d, uv)  # (K, N)
    inl = (err < thresh_px) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    # Retry ladder on-device for free: if the tight threshold starves, pick
    # (and gate) by the loose one over the SAME hypothesis set — the
    # reference re-runs solvePnPRansac at 8 px (rosFuncs.cpp:85-93), which
    # is statistically the same ladder at twice the cost.
    use_thresh = thresh_px
    starved = jnp.zeros((), bool)
    if retry_thresh_px is not None:
        inl_r = (err < retry_thresh_px) & mask[None, :]
        counts_r = jnp.sum(inl_r, axis=1)
        best_r = jnp.argmax(counts_r)
        starved = counts[best] < min_inliers
        best = jnp.where(starved, best_r, best)
        use_thresh = jnp.where(starved, retry_thresh_px, thresh_px)
        inl = jnp.where(starved, inl_r, inl)
    T0 = lie.make_se3(Rk[best], tk[best])

    # GN polish on the best hypothesis' inliers (masked weights).  The
    # Huber scale is TIGHTER than the inlier gate: a hard sub-threshold
    # gate (e.g. 0.5 px) measurably cuts drift on well-textured scenes but
    # starves RANSAC when per-point noise approaches the gate; the tight
    # Huber downweights (1/r) instead of excluding, capturing most of that
    # accuracy without the fragility.
    w = inl[best].astype(pts3d.dtype)
    T = _gn_refine(cam, T0, pts3d, uv, w, refine_iters, huber_px=huber_px)
    # Re-score with the polished pose; expand the inlier set.
    final_err = _reproj_errors(cam, T[:3, :3], T[:3, 3], pts3d, uv)
    final_inl = (final_err < use_thresh) & mask
    # One more polish round on the expanded set, then final score.
    T = _gn_refine(cam, T, pts3d, uv, final_inl.astype(pts3d.dtype),
                   refine_iters, huber_px=huber_px)
    final_err = _reproj_errors(cam, T[:3, :3], T[:3, 3], pts3d, uv)
    final_inl = (final_err < use_thresh) & mask
    return PnPResult(
        T_cw=T,
        inliers=final_inl,
        n_inliers=jnp.sum(final_inl),
        errors=final_err,
        used_retry=starved,
    )
