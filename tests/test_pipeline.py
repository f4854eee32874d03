"""End-to-end odometry pipeline test on the synthetic GT world.

The golden-trajectory strategy from SURVEY.md §4: run the full config-1
pipeline over a synthetic sequence and bound ATE against exact ground
truth.
"""

import numpy as np
import pytest

from ros_stereo_slam_tpu.config import (
    CameraConfig,
    FrontendConfig,
    KeyframeConfig,
    preset_odometry,
)
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.models.pipeline import StereoOdometry
from ros_stereo_slam_tpu.utils import metrics


@pytest.fixture(scope="module")
def odometry_run():
    world = small_world(n_frames=12, seed=5)
    c = world.camera
    cfg = preset_odometry().replace(
        camera=c,
        frontend=FrontendConfig(grid_step=12, max_points=1024),
        keyframes=KeyframeConfig(max_keyframes=16, min_pnp_inliers=150,
                                 map_block_points=1024),
    )
    slam = StereoOdometry(cfg)
    infos = [slam.initialize(*world.render(0)[:2])]
    for i in range(1, world.n_frames):
        left, right, _ = world.render(i)
        infos.append(slam.process_frame(left, right))
    return world, slam, infos


def test_odometry_tracks_through_sequence(odometry_run):
    world, slam, infos = odometry_run
    assert all(f.tracking_ok for f in infos), [
        (f.frame, f.n_inliers) for f in infos if not f.tracking_ok
    ]
    assert slam.frame_count == world.n_frames


def test_odometry_ate(odometry_run):
    world, slam, infos = odometry_run
    est = slam.trajectory_array()
    gt = world.poses[: est.shape[0]]
    err = metrics.ate_rmse(est, gt, align=True)
    # 12 frames x 0.8 m = ~9.6 m path; sub-decimeter ATE expected.
    assert err < 0.10, f"ATE RMSE {err:.3f} m"


def test_odometry_rpe(odometry_run):
    world, slam, infos = odometry_run
    est = slam.trajectory_array()
    t_rmse, r_rmse = metrics.rpe(est, world.poses)
    # Half-resolution world => half the stereo depth precision; worst frames
    # land right before keyframe re-triangulation (same decay the reference
    # exhibits — its keyframe trigger fires every few frames too).
    assert t_rmse < 0.08, f"RPE trans {t_rmse:.4f} m/frame"
    assert r_rmse < 0.2, f"RPE rot {r_rmse:.4f} deg/frame"


def test_keyframes_recorded(odometry_run):
    world, slam, infos = odometry_run
    # Frame 0 is always a keyframe; map points exist in world frame.
    assert int(slam.keyframes.count) >= 1
    pts, cols = slam.map_points()
    assert pts.shape[0] > 200
    assert np.isfinite(pts).all()


def test_ate_metric_identity():
    # Sanity of the metric itself: identical trajectories -> 0.
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 2, 3] = np.arange(10)
    assert metrics.ate_rmse(poses, poses) < 1e-9
    t, r = metrics.rpe(poses, poses)
    assert t < 1e-9 and r < 1e-6
