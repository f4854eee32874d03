"""Checkpoint/resume: a resumed run must match an uninterrupted run."""

import numpy as np
import pytest

from ros_stereo_slam_tpu.config import (
    FrontendConfig,
    KeyframeConfig,
    preset_odometry,
)
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.models.slam import StereoSLAM

pytestmark = pytest.mark.slow  # multi-minute XLA compile; excluded from the default run (pytest.ini)


def _cfg(world):
    return preset_odometry().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=14, max_points=512),
        keyframes=KeyframeConfig(max_keyframes=16, min_pnp_inliers=120,
                                 map_block_points=512),
    )


def test_resume_matches_uninterrupted(tmp_path):
    world = small_world(n_frames=10, seed=41)
    frames = [world.render(i)[:2] for i in range(10)]
    cfg = _cfg(world)

    # Uninterrupted run.
    a = StereoSLAM(cfg)
    a.initialize(*frames[0])
    for i in range(1, 10):
        a.process_frame(*frames[i])

    # Interrupted at frame 5, checkpointed, resumed in a NEW object.
    b = StereoSLAM(cfg)
    b.initialize(*frames[0])
    for i in range(1, 6):
        b.process_frame(*frames[i])
    ckpt = str(tmp_path / "state.npz")
    b.save_checkpoint(ckpt)

    c = StereoSLAM(cfg)
    c.initialize(*frames[0])  # materialize shapes
    c.load_checkpoint(ckpt)
    assert c.frame_count == 6
    for i in range(6, 10):
        c.process_frame(*frames[i])

    np.testing.assert_allclose(
        c.trajectory_array(), a.trajectory_array(), atol=1e-5
    )
    assert c.keyframe_frames == a.keyframe_frames


def test_checkpoint_rejects_wrong_shapes(tmp_path):
    world = small_world(n_frames=3, seed=42)
    frames = [world.render(i)[:2] for i in range(3)]
    cfg = _cfg(world)
    a = StereoSLAM(cfg)
    a.initialize(*frames[0])
    ckpt = str(tmp_path / "s.npz")
    a.save_checkpoint(ckpt)

    cfg2 = cfg.replace(frontend=FrontendConfig(grid_step=14, max_points=256))
    b = StereoSLAM(cfg2)
    b.initialize(*frames[0])
    with pytest.raises(ValueError):
        b.load_checkpoint(ckpt)
