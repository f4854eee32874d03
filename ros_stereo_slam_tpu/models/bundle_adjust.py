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


@partial(jax.jit, static_argnames=("iters", "axis_name"))
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

        I6 = jnp.eye(6, dtype=T.dtype)
        I3 = jnp.eye(3, dtype=T.dtype)
        U = U + damping * I6[None]
        V = V + damping * I3[None]
        V_inv = jnp.linalg.inv(V)  # batched 3x3 — the local elimination
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

        S_flat = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
        dp = jnp.linalg.solve(S_flat, rhs.reshape(-1)).reshape(W, 6)
        # A singular reduced system (degenerate window) yields inf/nan from
        # the solve; a nan pose would then mask out EVERY observation and
        # make the final rms-guard see a spurious "0" rms. Zero the update
        # instead so the iteration is a no-op.
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
    H = Jf.T @ J_unw + damping * jnp.eye(n_vars)
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
