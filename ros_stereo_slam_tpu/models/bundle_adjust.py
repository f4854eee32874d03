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


def _proj_nlast(cam: Pinhole, T_cw, Xl):
    """Project landmarks in the N-last layout.

    T_cw: (W, 4, 4); Xl: (3, N) — landmarks live in the LANE dimension.
    Returns p (W, 3, N) camera-frame points, inv_z (W, N), pos (W, N),
    u, v (W, N) pixel projections.
    """
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]
    p = jnp.einsum("wij,jn->win", R, Xl) + t[:, :, None]  # (W, 3, N)
    z = p[:, 2]
    pos = z > 1e-3
    inv_z = 1.0 / jnp.where(pos, z, 1.0)
    u = cam.fx * p[:, 0] * inv_z + cam.cx
    v = cam.fy * p[:, 1] * inv_z + cam.cy
    return p, inv_z, pos, u, v


def _residuals_nlast(cam: Pinhole, T_cw, Xl, obs_t):
    """r (W, 2, N), pos (W, N); obs_t is (W, 2, N)."""
    _, _, pos, u, v = _proj_nlast(cam, T_cw, Xl)
    r = jnp.stack([u - obs_t[:, 0], v - obs_t[:, 1]], axis=1)
    return r, pos


def _jacobians_nlast(cam: Pinhole, T_cw, Xl, obs_t):
    """N-last residuals + Jacobians.

    TPU layout note: the (W, N, 2, 6) layout of :func:`_residual_jacobians`
    puts the TINY dims (2, 6) in the trailing two positions, which the TPU
    tiler pads to (8, 128) — e.g. a (8, 16384, 6, 3) f32 array occupies
    ~537 MB of HBM instead of 9.4 MB, and every op on it runs at ~2% lane
    utilization.  Keeping N in the lane dimension makes per-landmark 3x3
    algebra elementwise VPU code and N-contractions true MXU matmuls.

    Returns r (W, 2, N), Jp (W, 2, 6, N), Jl (W, 2, 3, N), pos (W, N).
    """
    R = T_cw[:, :3, :3]
    p, inv_z, pos, u, v = _proj_nlast(cam, T_cw, Xl)
    r = jnp.stack([u - obs_t[:, 0], v - obs_t[:, 1]], axis=1)

    zero = jnp.zeros_like(inv_z)
    # Jproj (W, 2, 3, N): d(u,v)/d p
    Ju = jnp.stack([cam.fx * inv_z, zero, -cam.fx * p[:, 0] * inv_z * inv_z], 1)
    Jv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * p[:, 1] * inv_z * inv_z], 1)
    Jproj = jnp.stack([Ju, Jv], axis=1)

    # Jl[w,k,b,n] = sum_c Jproj[w,k,c,n] R[w,c,b] — 9 fused multiply-adds.
    Jl = jnp.stack(
        [
            sum(Jproj[:, :, c] * R[:, c, b, None, None] for c in range(3))
            for b in range(3)
        ],
        axis=2,
    )  # (W, 2, 3, N)

    # Jp = Jproj @ [I | -hat(p)]: first three columns are Jproj itself;
    # the rotational columns are componentwise cross-product terms.
    p0 = p[:, 0, None, :]
    p1 = p[:, 1, None, :]
    p2 = p[:, 2, None, :]
    c3 = -Jproj[:, :, 1] * p2 + Jproj[:, :, 2] * p1
    c4 = Jproj[:, :, 0] * p2 - Jproj[:, :, 2] * p0
    c5 = -Jproj[:, :, 0] * p1 + Jproj[:, :, 1] * p0
    Jp = jnp.concatenate(
        [Jproj, jnp.stack([c3, c4, c5], axis=2)], axis=2
    )  # (W, 2, 6, N)
    return r, Jp, Jl, pos


def _inv3x3_leading(M, eps: float = 1e-30):
    """Adjugate inverse of a (3, 3, ...) stack — elementwise over the
    trailing (lane) dims, mirroring :func:`ops.linalg.inv3x3`."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], 0),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], 0),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], 0),
        ],
        axis=0,
    )
    return adj * inv_det[None, None]


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

    # N-last internal layout (see _jacobians_nlast): landmarks ride the
    # lane dimension; the API-level (N, 3)/(W, N, 2) arrays are transposed
    # ONCE here (a few MB) instead of paying (8, 128)-tile padding on
    # every (W, N, 6, 3)-shaped intermediate of every GN iteration.
    Xl0 = landmarks.T  # (3, N)
    obs_t = jnp.swapaxes(obs, 1, 2)  # (W, 2, N)

    def rms(T, Xl):
        r, pos = _residuals_nlast(cam, T, Xl, obs_t)
        m = obs_mask & pos
        n = jnp.maximum(allsum(jnp.sum(m)), 1)
        return jnp.sqrt(
            allsum(jnp.sum(jnp.where(m, jnp.sum(r * r, 1), 0.0))) / n
        )

    rms0 = rms(T_cw, Xl0)

    def gn_step(_, state):
        T, Xl = state
        r, Jp, Jl, pos = _jacobians_nlast(cam, T, Xl, obs_t)
        rn = jnp.sqrt(jnp.sum(r * r, axis=1))  # (W, N)
        wh = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        wgt = wh * (obs_mask & pos).astype(T.dtype)  # (W, N)

        Jp_w = Jp * wgt[:, None, None, :]
        Jl_w = Jl * wgt[:, None, None, :]

        # N-contractions are MXU matmuls (contraction dim in lanes);
        # small-dim contractions (k=2, b/c=3) are unrolled multiply-adds —
        # a dot_general over them would lower to padded micro-matmuls.
        U = allsum(
            sum(jnp.einsum("wan,wbn->wab", Jp_w[:, k], Jp[:, k])
                for k in range(2))
        )  # (W, 6, 6)
        V = jnp.sum(
            Jl_w[:, :, :, None, :] * Jl[:, :, None, :, :], axis=(0, 1)
        )  # (3, 3, N) local
        Wc = jnp.sum(
            Jp_w[:, :, :, None, :] * Jl[:, :, None, :, :], axis=1
        )  # (W, 6, 3, N) local
        bp = allsum(
            sum(jnp.einsum("wan,wn->wa", Jp_w[:, k], r[:, k])
                for k in range(2))
        )  # (W, 6)
        bl = jnp.sum(Jl_w * r[:, :, None, :], axis=(0, 1))  # (3, N) local

        # Marquardt (diag-relative) damping: keeps the equilibrated reduced
        # system's condition number <= ~1/damping, which f32 CG needs; the
        # absolute epsilon keeps zero-observation blocks invertible.
        I6 = jnp.eye(6, dtype=T.dtype)
        dU = jnp.diagonal(U, axis1=-2, axis2=-1)
        U = U + (damping * dU + 1e-6)[..., None] * I6[None]
        for i in range(3):
            V = V.at[i, i].add(damping * V[i, i] + 1e-6)
        V_inv = _inv3x3_leading(V)  # elementwise — the local elimination
        V_inv = V_inv * lm_valid[None, None, :].astype(T.dtype)

        # Reduced camera system: S = U - W V^-1 W^T (cross-pose coupling);
        # the landmark-sum contractions combine across shards via psum.
        WVi = jnp.sum(
            Wc[:, :, :, None, :] * V_inv[None, None, :, :, :], axis=2
        )  # (W, 6, 3, N)
        S_off = -allsum(
            sum(jnp.einsum("wan,vbn->wvab", WVi[:, :, c], Wc[:, :, c])
                for c in range(3))
        )  # (W, W, 6, 6)
        S = S_off.at[jnp.arange(W), jnp.arange(W)].add(U)
        rhs = -(bp - allsum(
            sum(jnp.einsum("wan,n->wa", WVi[:, :, c], bl[c])
                for c in range(3))
        ))  # (W, 6)

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
        tmp = -bl - jnp.sum(Wc * dp[:, :, None, None], axis=(0, 1))  # (3, N)
        dx = jnp.sum(V_inv * tmp[None, :, :], axis=1)  # (3, N)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = dx * lm_valid[None, :]

        T_new = jnp.einsum(
            "wij,wjk->wik", jax.vmap(lie.exp_se3)(dp), T
        )
        return (T_new, Xl + dx)

    T_fin, Xl_fin = jax.lax.fori_loop(0, iters, gn_step, (T_cw, Xl0))
    rms1 = rms(T_fin, Xl_fin)
    X_fin = Xl_fin.T
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
