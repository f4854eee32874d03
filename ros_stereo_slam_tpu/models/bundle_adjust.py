"""Windowed Schur-complement bundle adjustment (reference C13).

The reference sketches 3D-2D BA with g2o: one pose + marginalized
landmarks, Levenberg, 10 iterations
(``/root/reference/src/bundleAdjust.cpp:551-613``; ``setMarginalized``
``:580`` is the Schur elimination; its windowed variant — ``BAwindowQueue``
``:224`` — was never wired in, call site commented ``:489``).  Here the
windowed version is implemented for real, TPU-first:

- residuals + Jacobians for ALL (pose, landmark) observation pairs in one
  batched evaluation (einsums over a (W, N) grid with masks);
- per-landmark 3x3 blocks inverted in a single batched op (the Schur
  elimination — 'landmark blocks eliminated locally', SURVEY.md §2);
- the reduced camera system (6W x 6W, W = window of 8 -> 48x48) solved
  densely; landmarks back-substituted in batch;
- Huber weighting, LM damping, gauge fixed by freezing selected poses
  (the first window pose; its stereo right-view observations then pin
  scale through the landmarks).

Left-multiplicative pose perturbation on cam-from-world transforms,
matching :mod:`ros_stereo_slam_tpu.ops.pnp`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.ops import linalg
from ros_stereo_slam_tpu.utils import lie
from ros_stereo_slam_tpu.utils.camera import Pinhole


class BAResult(NamedTuple):
    T_cw: jnp.ndarray  # (W, 4, 4) refined cam-from-world poses
    landmarks: jnp.ndarray  # (N, 3) refined world points
    rms_before: jnp.ndarray  # () masked reprojection RMS (px)
    rms_after: jnp.ndarray  # ()


def _residual_jacobians(cam: Pinhole, T_cw, X, uv):
    """All-pairs residuals/Jacobians.

    T_cw: (W, 4, 4); X: (N, 3); uv: (W, N, 2).
    Returns r (W, N, 2), Jp (W, N, 2, 6), Jl (W, N, 2, 3), pos_z (W, N).
    """
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    p = jnp.einsum("wij,nj->wni", R, X) + t[:, None, :]  # (W, N, 3)
    z = p[..., 2]
    pos = z > 1e-3
    zs = jnp.where(pos, z, 1.0)
    inv_z = 1.0 / zs
    u = cam.fx * p[..., 0] * inv_z + cam.cx
    v = cam.fy * p[..., 1] * inv_z + cam.cy
    r = jnp.stack([u - uv[..., 0], v - uv[..., 1]], axis=-1)  # (W, N, 2)

    zero = jnp.zeros_like(z)
    Ju = jnp.stack([cam.fx * inv_z, zero, -cam.fx * p[..., 0] * inv_z * inv_z], -1)
    Jv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * p[..., 1] * inv_z * inv_z], -1)
    Jproj = jnp.stack([Ju, Jv], axis=-2)  # (W, N, 2, 3)

    # d p / d xi (left twist on T_cw): [I | -hat(p)]  -> (W, N, 3, 6)
    def dpdxi(pp):
        return jnp.concatenate([jnp.eye(3, dtype=pp.dtype), -lie.hat_so3(pp)], axis=1)

    Jp = jnp.einsum("wnab,wnbc->wnac", Jproj, jax.vmap(jax.vmap(dpdxi))(p))
    # d p / d X = R  -> Jl = Jproj @ R
    Jl = jnp.einsum("wnab,wbc->wnac", Jproj, R)
    return r, Jp, Jl, pos


@partial(jax.jit, static_argnames=("iters", "cg_iters", "axis_name"))
def ba_solve(
    cam: Pinhole,
    T_cw: jnp.ndarray,  # (W, 4, 4) — replicated across shards
    landmarks: jnp.ndarray,  # (N, 3) — N is the LOCAL shard when sharded
    obs: jnp.ndarray,  # (W, N, 2)
    obs_mask: jnp.ndarray,  # (W, N) bool
    fixed: jnp.ndarray,  # (W,) bool — poses excluded from optimization
    iters: int = 10,
    damping: float | jnp.ndarray = 1e-4,
    huber_px: float | jnp.ndarray = 2.0,
    axis_name: str | None = None,
    cg_iters: int = 48,
) -> BAResult:
    """Single-chip and multi-chip BA share this body.

    With `axis_name` set (inside ``shard_map`` over a landmark-sharded
    mesh), each device eliminates ITS landmark blocks locally and the
    reduced camera system is combined with ``psum`` collectives over the
    mesh axis — the distributed-BA layout of SURVEY.md §2 ('landmark
    blocks eliminated locally, camera reduced system via psum').
    """

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    W = T_cw.shape[0]
    N = landmarks.shape[0]
    lm_valid = jnp.any(obs_mask, axis=0)  # (N,)

    def rms(T, X):
        r, _, _, pos = _residual_jacobians(cam, T, X, obs)
        m = obs_mask & pos
        n = jnp.maximum(allsum(jnp.sum(m)), 1)
        return jnp.sqrt(
            allsum(jnp.sum(jnp.where(m, jnp.sum(r * r, -1), 0.0))) / n
        )

    rms0 = rms(T_cw, landmarks)

    def gn_step(_, state):
        T, X = state
        r, Jp, Jl, pos = _residual_jacobians(cam, T, X, obs)
        rn = jnp.linalg.norm(r, axis=-1)
        wh = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        wgt = wh * (obs_mask & pos).astype(T.dtype)  # (W, N)

        Jp_w = Jp * wgt[..., None, None]
        Jl_w = Jl * wgt[..., None, None]

        U = allsum(jnp.einsum("wnka,wnkb->wab", Jp_w, Jp))  # (W, 6, 6)
        V = jnp.einsum("wnka,wnkb->nab", Jl_w, Jl)  # (N, 3, 3) local
        Wc = jnp.einsum("wnka,wnkb->wnab", Jp_w, Jl)  # (W, N, 6, 3) local
        bp = allsum(jnp.einsum("wnka,wnk->wa", Jp_w, r))  # (W, 6)
        bl = jnp.einsum("wnka,wnk->na", Jl_w, r)  # (N, 3) local

        # Marquardt (diag-relative) damping: keeps the equilibrated reduced
        # system's condition number <= ~1/damping, which f32 CG needs; the
        # absolute epsilon keeps zero-observation blocks invertible.
        I6 = jnp.eye(6, dtype=T.dtype)
        I3 = jnp.eye(3, dtype=T.dtype)
        dU = jnp.diagonal(U, axis1=-2, axis2=-1)
        dV = jnp.diagonal(V, axis1=-2, axis2=-1)
        U = U + (damping * dU + 1e-6)[..., None] * I6[None]
        V = V + (damping * dV + 1e-6)[..., None] * I3[None]
        V_inv = linalg.inv3x3(V)  # batched 3x3 — the local elimination
        V_inv = jnp.where(lm_valid[:, None, None], V_inv, 0.0)

        # Reduced camera system: S = U - W V^-1 W^T (cross-pose coupling);
        # the landmark-sum contractions combine across shards via psum.
        WVi = jnp.einsum("wnab,nbc->wnac", Wc, V_inv)  # (W, N, 6, 3)
        S_off = -allsum(jnp.einsum("wnac,vnbc->wvab", WVi, Wc))  # (W, W, 6, 6)
        S = S_off.at[jnp.arange(W), jnp.arange(W)].add(U)
        rhs = -(bp - allsum(jnp.einsum("wnac,nc->wa", WVi, bl)))  # (W, 6)

        # Gauge: freeze `fixed` poses (identity rows/cols, zero rhs).
        free = (~fixed).astype(T.dtype)
        mask_wv = free[:, None] * free[None, :]
        S = S * mask_wv[:, :, None, None]
        S = S.at[jnp.arange(W), jnp.arange(W)].add(
            (1.0 - free)[:, None, None] * I6[None]
        )
        rhs = rhs * free[:, None]

        # Solve the (symmetric PD after damping + gauge) reduced system with
        # block-Jacobi-preconditioned CG: matvecs are (W, W, 6, 6) x (W, 6)
        # einsums and the 6x6 diagonal-block inverses use the unrolled
        # Cholesky — no serial LAPACK-style custom calls (jnp.linalg.solve
        # costs milliseconds per call on TPU; this is microseconds).
        #
        # f32 note: raw reduced systems reach cond ~1e7 (fx^2-scaled
        # rotation entries vs unit gauge rows), beyond f32 CG.  Symmetric
        # diagonal equilibration  S~ = E S E, E = diag(S)^-1/2  collapses
        # the scale disparity first; CG then runs on S~ and the update is
        # mapped back through E.
        diag = jnp.diagonal(
            S[jnp.arange(W), jnp.arange(W)], axis1=-2, axis2=-1
        )  # (W, 6)
        e = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-12))
        S_sc = S * (e[:, None, :, None] * e[None, :, None, :])
        rhs_sc = rhs * e
        D_inv = linalg.spd_inverse_small(S_sc[jnp.arange(W), jnp.arange(W)])

        def hx(x):
            return jnp.einsum("wvab,vb->wa", S_sc, x)

        def pc(v):
            return jnp.einsum("wab,wb->wa", D_inv, v)

        def cg_body(_, st):
            x, rr, z, pdir, rz = st
            Ap = hx(pdir)
            alpha = rz / jnp.maximum(jnp.sum(pdir * Ap), 1e-30)
            x = x + alpha * pdir
            rr = rr - alpha * Ap
            z = pc(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            return (x, rr, z, z + beta * pdir, rz_new)

        def cg(b):
            z0 = pc(b)
            x, *_ = jax.lax.fori_loop(
                0, cg_iters, cg_body, (jnp.zeros_like(b), b, z0, z0,
                                       jnp.sum(b * z0))
            )
            return x

        # One round of iterative refinement recovers the last f32 digits.
        y = cg(rhs_sc)
        y = y + cg(rhs_sc - hx(y))
        dp = y * e
        # A degenerate window can still produce non-finite directions; a
        # nan pose would mask out EVERY observation and make the final
        # rms-guard see a spurious "0" rms.  Zero the update instead.
        dp = jnp.where(jnp.all(jnp.isfinite(dp)), dp, 0.0)
        dp = dp * free[:, None]

        # Back-substitute landmarks: dx = V^-1 (-bl - W^T dp).
        dx = jnp.einsum("nab,nb->na", V_inv, -bl - jnp.einsum("wnab,wa->nb", Wc, dp))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = dx * lm_valid[:, None]

        T_new = jnp.einsum(
            "wij,wjk->wik", jax.vmap(lie.exp_se3)(dp), T
        )
        return (T_new, X + dx)

    T_fin, X_fin = jax.lax.fori_loop(0, iters, gn_step, (T_cw, landmarks))
    rms1 = rms(T_fin, X_fin)
    # Safety: if the refinement diverged (rare, ill-conditioned windows),
    # keep the input state.
    better = (
        (rms1 <= rms0)
        & jnp.all(jnp.isfinite(T_fin))
        & jnp.all(jnp.isfinite(X_fin))
    )
    T_out = jnp.where(better, T_fin, T_cw)
    X_out = jnp.where(better, X_fin, landmarks)
    return BAResult(T_cw=T_out, landmarks=X_out, rms_before=rms0, rms_after=jnp.minimum(rms1, rms0))


def dense_solve_reference(
    cam: Pinhole, T_cw, landmarks, obs, obs_mask, fixed,
    damping=1e-4, huber_px=2.0,
):
    """One GN step solved with the FULL dense normal equations (no Schur).

    Test oracle: the Schur-complement step must produce the same update
    (SURVEY.md §4 property test: 'Schur solve == direct solve').
    """
    W = T_cw.shape[0]
    N = landmarks.shape[0]
    r, Jp, Jl, pos = _residual_jacobians(cam, T_cw, landmarks, obs)
    rn = jnp.linalg.norm(r, axis=-1)
    wh = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
    wgt = wh * (obs_mask & pos).astype(T_cw.dtype)
    lm_valid = jnp.any(obs_mask, axis=0)

    n_vars = 6 * W + 3 * N
    J_full = jnp.zeros((W, N, 2, n_vars))
    for w in range(W):
        J_full = J_full.at[w, :, :, 6 * w : 6 * w + 6].set(Jp[w])
    for n in range(N):
        J_full = J_full.at[:, n, :, 6 * W + 3 * n : 6 * W + 3 * n + 3].set(Jl[:, n])
    Jf = (J_full * wgt[..., None, None]).reshape(-1, n_vars)
    J_unw = J_full.reshape(-1, n_vars)
    rf = r.reshape(-1)
    H = Jf.T @ J_unw
    # Same Marquardt damping semantics as ba_solve.
    H = H + jnp.diag(damping * jnp.diagonal(H) + 1e-6)
    b = Jf.T @ rf
    # gauge + invalid landmarks: identity rows
    fix_idx = []
    for w in range(W):
        if bool(fixed[w]):
            fix_idx += list(range(6 * w, 6 * w + 6))
    for n in range(N):
        if not bool(lm_valid[n]):
            fix_idx += list(range(6 * W + 3 * n, 6 * W + 3 * n + 3))
    # Solve in float64 on the host — this is a precision oracle.
    import numpy as np

    H64 = np.asarray(H, np.float64)
    b64 = np.asarray(b, np.float64)
    if fix_idx:
        ix = np.asarray(fix_idx)
        H64[ix, :] = 0.0
        H64[:, ix] = 0.0
        H64[ix, ix] = 1.0
        b64[ix] = 0.0
    delta = np.linalg.solve(H64, -b64).astype(np.float32)
    return delta[: 6 * W].reshape(W, 6), delta[6 * W :].reshape(N, 3)
