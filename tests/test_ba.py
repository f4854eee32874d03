"""Bundle adjustment tests: Schur == dense oracle, convergence, robustness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.models import bundle_adjust as ba
from ros_stereo_slam_tpu.utils import lie
from ros_stereo_slam_tpu.utils.camera import Pinhole


def _cam():
    return Pinhole.from_K(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]))


def _problem(W=4, N=48, noise_px=0.3, seed=0):
    # Wide-baseline, close-landmark geometry: strong parallax so the
    # problem has no weakly-constrained depth manifold and GT recovery is
    # meaningful (low-parallax windows have a near-zero-residual gauge
    # drift direction that breaks GT comparisons).
    rng = np.random.default_rng(seed)
    cam = _cam()
    X = np.stack(
        [rng.uniform(-6, 6, N), rng.uniform(-3, 3, N), rng.uniform(5, 14, N)], 1
    ).astype(np.float32)
    T_cw = np.zeros((W, 4, 4), np.float32)
    for w in range(W):
        xi = np.concatenate(
            [rng.normal(0, 0.3, 3) + [1.5 * w - 2.0, 0, 0], rng.normal(0, 0.05, 3)]
        ).astype(np.float32)
        T_cw[w] = np.asarray(lie.exp_se3(jnp.asarray(xi)))
    obs = np.zeros((W, N, 2), np.float32)
    for w in range(W):
        p = X @ T_cw[w, :3, :3].T + T_cw[w, :3, 3]
        uv = p[:, :2] / p[:, 2:3]
        obs[w] = uv * [float(cam.fx), float(cam.fy)] + [float(cam.cx), float(cam.cy)]
    obs += rng.normal(0, noise_px, obs.shape)
    mask = np.ones((W, N), bool)
    return cam, jnp.asarray(T_cw), jnp.asarray(X), jnp.asarray(obs.astype(np.float32)), jnp.asarray(mask)


def test_schur_matches_dense_solve():
    cam, T_cw, X, obs, mask = _problem(W=3, N=12, noise_px=0.5, seed=1)
    fixed = jnp.asarray([True, False, False])
    # Perturb so the GN step is non-trivial.
    key = jax.random.PRNGKey(0)
    dT = jax.vmap(lie.exp_se3)(0.01 * jax.random.normal(key, (3, 6)))
    T_pert = jnp.einsum("wij,wjk->wik", dT, T_cw)
    X_pert = X + 0.05 * jax.random.normal(key, X.shape)

    dp_ref, dx_ref = ba.dense_solve_reference(
        cam, T_pert, X_pert, obs, mask, fixed, damping=1e-3, huber_px=1e9
    )
    # One Schur GN step with the same damping / no Huber clipping.
    res = ba.ba_solve(
        cam, T_pert, X_pert, obs, mask, fixed,
        iters=1, damping=1e-3, huber_px=1e9,
    )
    # Extract the applied update from the result.
    dp_schur = np.stack(
        [
            np.asarray(lie.log_se3(jnp.asarray(np.asarray(res.T_cw[w]) @ np.linalg.inv(np.asarray(T_pert[w])), jnp.float32)))
            for w in range(3)
        ]
    )
    dx_schur = np.asarray(res.landmarks - X_pert)
    # Both paths run at the f32 floor of a cond~1e5 normal system; the
    # equivalence check guards structure/sign errors (O(1) mismatches).
    np.testing.assert_allclose(dp_schur, np.asarray(dp_ref), atol=6e-3)
    np.testing.assert_allclose(dx_schur, np.asarray(dx_ref), atol=3e-2)


def test_ba_converges_to_ground_truth():
    cam, T_cw, X, obs, mask = _problem(W=4, N=64, noise_px=0.0, seed=2)
    rng = np.random.default_rng(3)
    T_pert = np.asarray(T_cw).copy()
    for w in range(1, 4):
        xi = np.concatenate([rng.normal(0, 0.05, 3), rng.normal(0, 0.005, 3)]).astype(np.float32)
        T_pert[w] = np.asarray(lie.exp_se3(jnp.asarray(xi))) @ T_pert[w]
    X_pert = np.asarray(X) + rng.normal(0, 0.2, X.shape).astype(np.float32)
    # Monocular BA has a free global-scale gauge (scaling about a camera
    # center leaves every projection invariant); fixing TWO poses pins it.
    # In the pipeline the stereo right-view observations play this role.
    fixed = jnp.asarray([True, True, False, False])
    T_pert[1] = np.asarray(T_cw[1])
    res = ba.ba_solve(
        cam, jnp.asarray(T_pert), jnp.asarray(X_pert), obs, mask, fixed,
        iters=15, damping=1e-5,
    )
    assert float(res.rms_after) < 0.02, float(res.rms_after)
    # Poses recovered (pose 0 fixed = gauge anchor shared with GT).
    for w in range(4):
        err = np.asarray(res.T_cw[w]) @ np.linalg.inv(np.asarray(T_cw[w]))
        t_err = np.linalg.norm(err[:3, 3])
        assert t_err < 5e-3, (w, t_err)


def test_ba_huber_rejects_outlier_observations():
    cam, T_cw, X, obs, mask = _problem(W=4, N=64, noise_px=0.2, seed=4)
    obs_np = np.asarray(obs).copy()
    rng = np.random.default_rng(5)
    # corrupt 10% of observations grossly
    for _ in range(25):
        w = rng.integers(4)
        n = rng.integers(64)
        obs_np[w, n] += rng.uniform(30, 80, 2)
    fixed = jnp.asarray([True, True, False, False])
    rng2 = np.random.default_rng(6)
    X_pert = np.asarray(X) + rng2.normal(0, 0.1, X.shape).astype(np.float32)
    res = ba.ba_solve(
        cam, T_cw, jnp.asarray(X_pert), jnp.asarray(obs_np), mask, fixed,
        iters=15, damping=1e-4, huber_px=2.0,
    )
    for w in range(2, 4):
        err = np.asarray(res.T_cw[w]) @ np.linalg.inv(np.asarray(T_cw[w]))
        assert np.linalg.norm(err[:3, 3]) < 0.05


def test_ba_no_op_when_diverging():
    # A pathological window (all obs masked) must return inputs unchanged.
    cam, T_cw, X, obs, mask = _problem(W=3, N=12, seed=7)
    res = ba.ba_solve(
        cam, T_cw, X, obs, jnp.zeros_like(mask), jnp.asarray([True, False, False]),
        iters=3,
    )
    np.testing.assert_allclose(np.asarray(res.T_cw), np.asarray(T_cw), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.landmarks), np.asarray(X), atol=1e-6)
