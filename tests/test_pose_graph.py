"""Pose-graph optimizer tests (oracle: constructed ground truth)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import PGOConfig
from ros_stereo_slam_tpu.models import pose_graph
from ros_stereo_slam_tpu.utils import lie


def _circle_trajectory(n, radius=10.0, closed=False):
    """Poses around a circle; with closed=True the LAST pose coincides with
    the first (a true revisit, matching identity-closure semantics)."""
    poses = np.zeros((n, 4, 4), dtype=np.float32)
    steps = (n - 1) if closed else n
    for i in range(n):
        th = 2 * np.pi * i / steps
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([radius * np.sin(th), 0.0, radius * (1 - np.cos(th))], np.float32)
        poses[i] = np.eye(4)
        poses[i, :3, :3] = R
        poses[i, :3, 3] = t
    return poses


def _drifted(poses, drift_per_step=0.02, seed=0):
    """Integrate GT relative motions with noise -> drifting estimate."""
    rng = np.random.default_rng(seed)
    n = poses.shape[0]
    out = np.zeros_like(poses)
    out[0] = poses[0]
    for i in range(1, n):
        Z = np.linalg.inv(poses[i - 1]) @ poses[i]
        noise = np.concatenate(
            [rng.normal(0, drift_per_step, 3), rng.normal(0, drift_per_step * 0.1, 3)]
        ).astype(np.float32)
        Zn = Z @ np.asarray(lie.exp_se3(jnp.asarray(noise)))
        out[i] = out[i - 1] @ Zn
    return out


def test_pgo_noop_on_consistent_graph():
    gt = _circle_trajectory(32)
    pg = pose_graph.PoseGraph(PGOConfig(max_poses=64, max_loop_edges=4, iters=5))
    pg.initialize()
    for i in range(1, 32):
        Z = np.linalg.inv(gt[i - 1]) @ gt[i]
        pg.add_odometry(jnp.asarray(Z, jnp.float32))
    poses = jnp.asarray(np.pad(gt, ((0, 32), (0, 0), (0, 0))) + 0.0)
    # Make padding identity (valid region is [0, 32)).
    poses = poses.at[32:].set(jnp.eye(4))
    out = np.asarray(pg.optimize(poses))
    np.testing.assert_allclose(out[:32], gt, atol=2e-3)


def test_pgo_closes_drifted_loop():
    n = 48
    gt = _circle_trajectory(n, closed=True)
    est = _drifted(gt, drift_per_step=0.03)
    err_before = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)

    pg = pose_graph.PoseGraph(PGOConfig(max_poses=64, max_loop_edges=4, iters=10))
    pg.initialize()
    for i in range(1, n):
        Z = np.linalg.inv(est[i - 1]) @ est[i]
        pg.add_odometry(jnp.asarray(Z, jnp.float32))
    # The trajectory revisits the start: identity loop edge (reference
    # semantics) between the last pose and vertex 0.
    pg.add_loop(n - 1, 0)

    poses0 = np.tile(np.eye(4, dtype=np.float32), (64, 1, 1))
    poses0[:n] = est
    out = np.asarray(pg.optimize(jnp.asarray(poses0)))[:n]
    err_after = np.linalg.norm(out[:, :3, 3] - gt[:, :3, 3], axis=1)

    # Loop closure must pull the endpoint home and reduce overall error.
    assert err_after[-1] < 0.3 * err_before[-1] + 1e-3, (
        err_before[-1], err_after[-1]
    )
    assert err_after.mean() < 0.6 * err_before.mean()


def test_pgo_identity_loop_pulls_endpoints_together():
    n = 24
    gt = _circle_trajectory(n)
    est = _drifted(gt, drift_per_step=0.05, seed=3)
    pg = pose_graph.PoseGraph(PGOConfig(max_poses=32, max_loop_edges=4, iters=10))
    pg.initialize()
    for i in range(1, n):
        pg.add_odometry(jnp.asarray(np.linalg.inv(est[i - 1]) @ est[i], jnp.float32))
    pg.add_loop(n - 1, 0)
    poses0 = np.tile(np.eye(4, dtype=np.float32), (32, 1, 1))
    poses0[:n] = est
    out = np.asarray(pg.optimize(jnp.asarray(poses0)))[:n]
    gap = np.linalg.norm(out[-1, :3, 3] - out[0, :3, 3])
    gap_before = np.linalg.norm(est[-1, :3, 3] - est[0, :3, 3])
    # GT gap between consecutive ring poses is ~2*pi*R/n; closure should
    # bring the endpoint well below the drifted gap.
    assert gap < 0.5 * gap_before


def test_chain_measurements_roundtrip():
    gt = jnp.asarray(_circle_trajectory(16))
    Z = pose_graph.chain_measurements(gt)
    # re-integrate
    T = np.asarray(gt[0])
    for i in range(1, 16):
        T = T @ np.asarray(Z[i])
        np.testing.assert_allclose(T, np.asarray(gt[i]), atol=1e-4)


def test_rewrite_points():
    old = jnp.asarray(_circle_trajectory(8))
    new = jnp.asarray(_drifted(np.asarray(old), 0.05, seed=1))
    pts_cam = np.random.default_rng(0).normal(0, 5, (3, 64, 3)).astype(np.float32)
    kf_idx = jnp.asarray([0, 3, 6], jnp.int32)
    # world points under old poses
    pts_world_old = np.stack(
        [np.asarray(lie.transform_points(old[i], jnp.asarray(pts_cam[k])))
         for k, i in enumerate([0, 3, 6])]
    )
    out = np.asarray(
        pose_graph.rewrite_points(jnp.asarray(pts_world_old), kf_idx, old, new)
    )
    expect = np.stack(
        [np.asarray(lie.transform_points(new[i], jnp.asarray(pts_cam[k])))
         for k, i in enumerate([0, 3, 6])]
    )
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_g2o_save(tmp_path):
    pg = pose_graph.PoseGraph(PGOConfig(max_poses=8, max_loop_edges=2))
    pg.initialize()
    gt = _circle_trajectory(4)
    for i in range(1, 4):
        pg.add_odometry(jnp.asarray(np.linalg.inv(gt[i - 1]) @ gt[i], jnp.float32))
    pg.add_loop(3, 0)
    path = str(tmp_path / "graph.g2o")
    pg.save(path, gt)
    lines = open(path).read().splitlines()
    assert sum(ln.startswith("VERTEX_SE3:QUAT") for ln in lines) == 4
    assert sum(ln.startswith("EDGE_SE3:QUAT") for ln in lines) == 4  # 3 odo + 1 loop


def test_g2o_roundtrip(tmp_path):
    cfg = PGOConfig(max_poses=8, max_loop_edges=2)
    pg = pose_graph.PoseGraph(cfg)
    pg.initialize()
    gt = _circle_trajectory(5)
    for i in range(1, 5):
        pg.add_odometry(jnp.asarray(np.linalg.inv(gt[i - 1]) @ gt[i], jnp.float32))
    Z_loop = jnp.asarray(np.linalg.inv(gt[4]) @ gt[1], jnp.float32)
    pg.add_loop(4, 1, Z_loop)
    path = str(tmp_path / "graph.g2o")
    pg.save(path, gt)

    pg2, poses = pose_graph.PoseGraph.load(path, cfg)
    assert pg2.count == 5
    assert pg2.n_loops == 1
    assert poses.shape == (cfg.max_poses, 4, 4)
    np.testing.assert_allclose(poses[:5], gt[:5], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pg2.odo_Z[1:5]), np.asarray(pg.odo_Z[1:5]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pg2.loop_Z[0]), np.asarray(Z_loop), atol=1e-5
    )
    assert int(pg2.loop_i[0]) == 4 and int(pg2.loop_j[0]) == 1
    # optimizing the reloaded graph gives the same result as the original
    gt_pad = np.tile(np.eye(4, dtype=np.float32), (cfg.max_poses, 1, 1))
    gt_pad[:5] = gt[:5]
    a = np.asarray(pg.optimize(jnp.asarray(gt_pad)))
    b = np.asarray(pg2.optimize(jnp.asarray(poses)))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_capacity_exhaustion_raises():
    """Capacity overflows must fail loudly: in jit an OOB scatter clamps or
    drops silently, which would corrupt the newest pose / overwrite the
    oldest loop edge on a >max_poses run."""
    cfg = PGOConfig(max_poses=4, max_loop_edges=2)
    pg = pose_graph.PoseGraph(cfg)
    pg.initialize()
    Z = jnp.eye(4, dtype=jnp.float32)
    pg.add_odometry(Z)
    pg.add_odometry(Z)
    pg.add_odometry(Z)  # count == 4 == max_poses
    with pytest.raises(RuntimeError, match="capacity"):
        pg.add_odometry(Z)
    pg.add_loop(3, 0)
    pg.add_loop(3, 1)
    with pytest.raises(RuntimeError, match="capacity"):
        pg.add_loop(3, 2)
