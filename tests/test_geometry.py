"""RANSAC F-matrix, triangulation, and PnP tests against exact oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import CameraConfig
from ros_stereo_slam_tpu.ops import pnp, ransac, triangulate
from ros_stereo_slam_tpu.utils import lie
from ros_stereo_slam_tpu.utils.camera import Pinhole


def _cam():
    return Pinhole.from_K(
        np.array([[700.0, 0, 320.0], [0, 700.0, 240.0], [0, 0, 1.0]])
    )


def _scene(n=256, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-8, 8, n), rng.uniform(-4, 4, n), rng.uniform(6, 40, n)],
        axis=1,
    ).astype(np.float32)
    return rng, X


def _project_np(K, R, t, X):
    pc = X @ R.T + t
    uv = pc[:, :2] / pc[:, 2:3]
    return (uv @ K[:2, :2].T + K[:2, 2]), pc[:, 2]


def test_fmat_ransac_inliers_and_epipolar():
    rng, X = _scene()
    cam = _cam()
    K = np.asarray(cam.K)
    # Two views: identity and a rotated+translated second view.
    R2 = np.asarray(lie.exp_so3(jnp.asarray([0.02, -0.05, 0.01], dtype=jnp.float32)))
    t2 = np.array([0.3, 0.05, 0.8], dtype=np.float32)
    uv1, _ = _project_np(K, np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32), X)
    uv2, _ = _project_np(K, R2, t2, X)
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    # Corrupt 25% with gross outliers.
    n_out = 64
    uv2[:n_out] += rng.uniform(20, 80, (n_out, 2)) * np.sign(rng.standard_normal((n_out, 2)))
    mask = np.ones(X.shape[0], dtype=bool)

    res = ransac.fmat_ransac(
        jax.random.PRNGKey(0),
        jnp.asarray(uv1, dtype=jnp.float32),
        jnp.asarray(uv2, dtype=jnp.float32),
        jnp.asarray(mask),
        thresh_px=2.0,
        iters=256,
    )
    inl = np.asarray(res.inliers)
    # Outliers must be rejected, most true inliers kept.
    assert inl[:n_out].sum() <= 3
    assert inl[n_out:].sum() > 0.9 * (X.shape[0] - n_out)


def test_triangulate_rectified_exact():
    cam = _cam()
    _, X = _scene(n=128, seed=1)
    b = 0.54
    K = np.asarray(cam.K)
    uv_l, _ = _project_np(K, np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32), X)
    uv_r, _ = _project_np(K, np.eye(3, dtype=np.float32), np.array([-b, 0, 0], dtype=np.float32), X)
    res = triangulate.triangulate_rectified(
        cam, b, jnp.asarray(uv_l, jnp.float32), jnp.asarray(uv_r, jnp.float32),
        jnp.ones(128, dtype=bool),
    )
    assert bool(np.all(np.asarray(res.valid)))
    np.testing.assert_allclose(np.asarray(res.points), X, rtol=2e-3, atol=1e-2)


def test_triangulate_dlt_matches_rectified():
    cam = _cam()
    _, X = _scene(n=64, seed=2)
    b = 0.54
    K = np.asarray(cam.K, dtype=np.float32)
    uv_l, _ = _project_np(K, np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32), X)
    uv_r, _ = _project_np(K, np.eye(3, dtype=np.float32), np.array([-b, 0, 0], dtype=np.float32), X)
    P1 = K @ np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)
    P2 = K @ np.concatenate([np.eye(3), np.array([[-b], [0], [0]])], axis=1).astype(np.float32)
    out = triangulate.triangulate_dlt(
        jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv_l, jnp.float32), jnp.asarray(uv_r, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out), X, rtol=2e-3, atol=2e-2)


def test_pnp_ransac_recovers_pose():
    rng, X = _scene(n=512, seed=3)
    cam = _cam()
    K = np.asarray(cam.K)
    R = np.asarray(lie.exp_so3(jnp.asarray([0.1, -0.2, 0.05], dtype=jnp.float32)))
    t = np.array([0.5, -0.3, 1.2], dtype=np.float32)
    uv, z = _project_np(K, R, t, X)
    uv += rng.normal(0, 0.25, uv.shape)
    n_out = 128  # 25% outliers
    uv[:n_out] += rng.uniform(15, 60, (n_out, 2)) * np.sign(rng.standard_normal((n_out, 2)))
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(1),
        cam,
        jnp.asarray(X),
        jnp.asarray(uv, jnp.float32),
        jnp.ones(512, dtype=bool),
        thresh_px=2.0,
        iters=256,
    )
    T = np.asarray(res.T_cw)
    rot_err = np.degrees(
        np.linalg.norm(np.asarray(lie.log_so3(jnp.asarray(T[:3, :3] @ R.T, jnp.float32))))
    )
    t_err = np.linalg.norm(T[:3, 3] - t)
    assert rot_err < 0.1, f"rotation error {rot_err} deg"
    assert t_err < 0.05, f"translation error {t_err} m"
    inl = np.asarray(res.inliers)
    assert inl[:n_out].sum() <= 3
    assert inl[n_out:].sum() > 0.95 * (512 - n_out)


def test_pnp_degrades_gracefully_few_points():
    # With very few valid points PnP must still return a finite pose.
    cam = _cam()
    _, X = _scene(n=64, seed=4)
    K = np.asarray(cam.K)
    uv, _ = _project_np(K, np.eye(3, dtype=np.float32), np.array([0, 0, 0.5], dtype=np.float32), X)
    mask = np.zeros(64, dtype=bool)
    mask[:8] = True
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(2), cam, jnp.asarray(X), jnp.asarray(uv, jnp.float32),
        jnp.asarray(mask), thresh_px=2.0, iters=64,
    )
    assert np.all(np.isfinite(np.asarray(res.T_cw)))
    assert int(res.n_inliers) >= 6
