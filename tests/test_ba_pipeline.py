"""Config-4 pipeline test: odometry + windowed Schur BA end to end."""

import numpy as np
import pytest

from ros_stereo_slam_tpu.config import (
    BAConfig,
    FrontendConfig,
    KeyframeConfig,
    preset_ba,
    preset_odometry,
)
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.models.pipeline import StereoOdometry
from ros_stereo_slam_tpu.utils import metrics

pytestmark = pytest.mark.slow  # multi-minute XLA compile; excluded from the default run (pytest.ini)


def _run(cfg, world):
    slam = StereoOdometry(cfg)
    slam.initialize(*world.render(0)[:2])
    for i in range(1, world.n_frames):
        left, right, _ = world.render(i)
        slam.process_frame(left, right)
    return slam


@pytest.fixture(scope="module")
def runs():
    world = small_world(n_frames=14, seed=21)
    fe = FrontendConfig(grid_step=12, max_points=1024)
    kf = KeyframeConfig(max_keyframes=16, min_pnp_inliers=150, map_block_points=1024)
    cfg_odo = preset_odometry().replace(camera=world.camera, frontend=fe, keyframes=kf)
    cfg_ba = preset_ba().replace(
        camera=world.camera, frontend=fe, keyframes=kf,
        ba=BAConfig(window=6, iters=6, damping=1e-4, huber_px=2.0),
    )
    return world, _run(cfg_odo, world), _run(cfg_ba, world)


def test_ba_pipeline_tracks(runs):
    world, slam_odo, slam_ba = runs
    assert not slam_ba.tracking_failed


def test_ba_pipeline_ate_not_worse(runs):
    world, slam_odo, slam_ba = runs
    gt = world.poses
    ate_odo = metrics.ate_rmse(slam_odo.trajectory_array(), gt)
    ate_ba = metrics.ate_rmse(slam_ba.trajectory_array(), gt)
    # BA must not blow up the trajectory; typically it tightens it.
    assert ate_ba < max(1.5 * ate_odo, 0.05), (ate_odo, ate_ba)


def test_ba_pipeline_finite_map(runs):
    world, _, slam_ba = runs
    pts, _ = slam_ba.map_points()
    assert np.isfinite(pts).all()
