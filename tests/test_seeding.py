"""Motion-model seeding tests (FrontendConfig.lk_seed).

The seeded temporal track predicts each landmark's position by replaying
the last inter-frame motion and refines on a shallow pyramid; the
keyframe branch's stereo rematch starts from each static grid slot's
last measured disparity.  These tests pin (a) accuracy parity with the
unseeded coarse-to-fine search, (b) recovery when the prior is wrong
(velocity change), (c) the carry bookkeeping of the dT / stereo_flow
priors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.config import FrontendConfig, KeyframeConfig, preset_odometry
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.models import step as step_mod
from ros_stereo_slam_tpu.models.pipeline import run_offline
from ros_stereo_slam_tpu.utils import metrics

pytestmark = pytest.mark.slow  # multi-minute XLA compile; excluded from the default run (pytest.ini)


def _cfg(world, **fe_kw):
    fe = FrontendConfig(grid_step=12, max_points=1024, **fe_kw)
    return preset_odometry().replace(
        camera=world.camera,
        frontend=fe,
        keyframes=KeyframeConfig(max_keyframes=16, min_pnp_inliers=150,
                                 map_block_points=1024),
    )


@pytest.fixture(scope="module")
def seq():
    world = small_world(n_frames=10, seed=5)
    L = jnp.asarray(
        np.stack([world.render(i)[0] for i in range(world.n_frames)]),
        jnp.float32,
    )
    R = jnp.asarray(
        np.stack([world.render(i)[1] for i in range(world.n_frames)]),
        jnp.float32,
    )
    return world, L, R


def test_seeded_matches_unseeded_accuracy(seq):
    world, L, R = seq
    gt = world.poses[: L.shape[0]]
    res_s = run_offline(_cfg(world), L, R)
    res_u = run_offline(_cfg(world, lk_seed="none"), L, R)
    assert bool(res_s.tracking_ok.all()) and bool(res_u.tracking_ok.all())
    ate_s = metrics.ate_rmse(res_s.trajectory, gt)
    ate_u = metrics.ate_rmse(res_u.trajectory, gt)
    assert ate_s < 0.10, f"seeded ATE {ate_s:.3f} m"
    # seeding must not cost accuracy (2x slack over the unseeded run)
    assert ate_s < max(2.0 * ate_u, 0.05), (ate_s, ate_u)


def test_seeded_survives_velocity_change(seq):
    """The constant-velocity prior is WRONG at a sudden stop: the frame
    repeats (zero motion after 0.8 m/frame).  The F-gate + PnP must still
    localize — the seed is a prior, not a constraint."""
    world, L, R = seq
    # splice: frames 0..5 normal, then frame 5 repeated (full stop)
    Ls = jnp.concatenate([L[:6], L[5:6], L[5:6]], axis=0)
    Rs = jnp.concatenate([R[:6], R[5:6], R[5:6]], axis=0)
    res = run_offline(_cfg(world), Ls, Rs)
    assert bool(res.tracking_ok.all())
    # held pose: the two repeated frames must land where frame 5 is
    d = np.linalg.norm(
        res.trajectory[-1][:3, 3] - res.trajectory[5][:3, 3]
    )
    assert d < 0.05, f"stop-frame drift {d:.3f} m"


def test_carry_priors_updated(seq):
    world, L, R = seq
    cfg = _cfg(world)
    from ros_stereo_slam_tpu.models.pipeline import _grid_for

    grid_pts, grid_mask = _grid_for(cfg)
    carry = step_mod.init_carry(
        L[0], R[0], grid_pts, grid_mask, jax.random.PRNGKey(0), cfg
    )
    assert carry.dT is not None and carry.stereo_flow is not None
    np.testing.assert_allclose(np.asarray(carry.dT), np.eye(4), atol=1e-6)
    # init bootstrap measured disparities: flow is negative-u (right image
    # shifts features left), zero where the slot never matched
    flow = np.asarray(carry.stereo_flow)
    m = np.asarray(carry.track.mask)
    assert (flow[m][:, 0] < 0).mean() > 0.95
    carry2, _ = step_mod.slam_frame_step(
        carry, L[1], R[1], grid_pts, grid_mask, cfg
    )
    # after one 0.8 m step the velocity prior must be non-identity and
    # close to the GT inter-frame motion
    dT = np.asarray(carry2.dT)
    gt_dT = np.linalg.inv(world.poses[0]) @ world.poses[1]
    assert np.linalg.norm(dT[:3, 3] - gt_dT[:3, 3]) < 0.05


def test_lazy_pyramid_carry_depth(seq):
    """Seeded configs carry only the happy-path pyramid depth; the coarse
    levels are rebuilt inside the rescue branch (models/step.py).  Config
    flavors whose keyframe branch runs unseeded (ANMS sampler, ORB stereo)
    must keep the full pyramid."""
    world, L, R = seq
    from ros_stereo_slam_tpu.models.pipeline import _grid_for

    cfg = _cfg(world)
    fe = cfg.frontend
    assert step_mod._happy_levels(fe) == max(
        fe.lk_seeded_levels, fe.lk_stereo_seeded_levels
    )
    grid_pts, grid_mask = _grid_for(cfg)
    carry = step_mod.init_carry(
        L[0], R[0], grid_pts, grid_mask, jax.random.PRNGKey(0), cfg
    )
    assert len(carry.ref_pyr) == step_mod._happy_levels(fe)
    carry2, _ = step_mod.slam_frame_step(
        carry, L[1], R[1], grid_pts, grid_mask, cfg
    )
    assert len(carry2.ref_pyr) == step_mod._happy_levels(fe)
    # unseeded-keyframe flavors need the full pyramid every frame
    for kw in (dict(sampler="anms"), dict(stereo_matcher="orb")):
        fe_v = FrontendConfig(grid_step=12, max_points=1024, **kw)
        assert step_mod._happy_levels(fe_v) == fe_v.lk_levels
    # lk_seed="none" carries the full pyramid
    cfg_u = _cfg(world, lk_seed="none")
    carry_u = step_mod.init_carry(
        L[0], R[0], grid_pts, grid_mask, jax.random.PRNGKey(0), cfg_u
    )
    assert len(carry_u.ref_pyr) == cfg_u.frontend.lk_levels


def test_rescue_recovers_from_bad_prior(seq):
    """A LARGE motion discontinuity (frame sequence jumps backward by two
    frames) starves the single-level seeded track; the rescue branch's
    full-pyramid re-track must keep PnP alive."""
    world, L, R = seq
    Ls = jnp.concatenate([L[:6], L[3:4]], axis=0)
    Rs = jnp.concatenate([R[:6], R[3:4]], axis=0)
    res = run_offline(_cfg(world), Ls, Rs)
    assert bool(res.tracking_ok.all())
    d = np.linalg.norm(res.trajectory[-1][:3, 3] - res.trajectory[3][:3, 3])
    assert d < 0.10, f"rescue failed to relocalize: {d:.3f} m"
