"""PnP-measured loop edges vs the reference's identity closures.

The reference ships "absolute" identity loop edges (``poseGraph.h:118``,
``README.md:39``) and lists a PnP-estimated measurement as future work
(``getLCMeasurement``, ``dump.cpp:331-348``).  Our framework implements
that upgrade (``StereoSLAM._measure_loop_edge``).  This test constructs
the case where the two differ: the camera re-traverses its starting views
laterally displaced, so the matched frames SEE the same scene from a
DIFFERENT pose.  An identity edge then asserts a false constraint; the
PnP edge measures the true offset.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ros_stereo_slam_tpu.config import (
    FrontendConfig,
    KeyframeConfig,
    LoopClosureConfig,
    PGOConfig,
    preset_loop_closure,
)
from ros_stereo_slam_tpu.data.synthetic import loop_trajectory, small_world
from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.models.slam import StereoSLAM
from ros_stereo_slam_tpu.ops import orb
from ros_stereo_slam_tpu.utils import metrics

pytestmark = pytest.mark.slow  # multi-minute XLA compile; excluded from the default run (pytest.ini)

OFFSET = 0.4  # m of lateral displacement on the revisit


@pytest.fixture(scope="module")
def offset_world():
    n = 80
    poses = loop_trajectory(n, radius=2.5, overlap=8, revisit_offset=OFFSET)
    world = small_world(custom_poses=poses, seed=13)
    world.half_w = 10.0
    frames = [world.render(i)[:2] for i in range(n)]
    descs, docs = [], []
    for i in range(0, n, 4):
        f = orb.detect_and_compute(jnp.asarray(frames[i][0]), 128)
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc_sign)[v])
        docs.append(np.full(v.sum(), i))
    voc = vocab_mod.train(
        np.concatenate(descs), k=4, levels=3, doc_ids=np.concatenate(docs)
    )
    return world, frames, voc


def _run(world, frames, voc, edge_measurement: str):
    cfg = preset_loop_closure().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=12, max_points=1024),
        keyframes=KeyframeConfig(
            max_keyframes=64, min_pnp_inliers=150, map_block_points=1024
        ),
        loop=LoopClosureConfig(
            orb_features=128, dislocal=8, min_separation=30, cooldown=10,
            max_db_results=12, k_consistency=1, geom_min_points=12,
            db_capacity=128, alpha=0.9, min_nss=0.001,
            edge_measurement=edge_measurement,
        ),
        pgo=PGOConfig(max_poses=128, max_loop_edges=8, iters=10, cg_iters=64),
    )
    slam = StereoSLAM(cfg, vocab=voc)
    slam.initialize(*frames[0])
    for i in range(1, len(frames)):
        slam.process_frame(*frames[i])
    est = slam.trajectory_array()
    ate = metrics.ate_rmse(est, world.poses[: est.shape[0]], align=True)
    return slam, ate


def test_pnp_edge_beats_identity_on_offset_revisit(offset_world):
    world, frames, voc = offset_world
    slam_pnp, ate_pnp = _run(world, frames, voc, "pnp")
    assert slam_pnp.loop_events, "loop closure must fire on the revisit"
    slam_id, ate_id = _run(world, frames, voc, "identity")
    # The identity edge injects a false 0.4 m constraint; the measured
    # edge must do meaningfully better.  (A single end-of-orbit loop edge
    # cannot undo mid-orbit drift, so the bound is relative, not absolute.)
    assert ate_pnp < 0.8 * ate_id, (
        f"pnp ATE {ate_pnp:.3f} should beat identity ATE {ate_id:.3f}"
    )
    assert ate_pnp < 1.0, f"pnp-edge ATE too high: {ate_pnp:.3f}"


def test_pnp_edge_measures_the_offset(offset_world):
    """The captured measurement should match the ground-truth relative
    pose of the matched vertex (which includes the lateral offset)."""
    world, frames, voc = offset_world
    import ros_stereo_slam_tpu.models.slam as slam_mod

    captured = []
    orig = slam_mod.StereoSLAM._measure_loop_edge

    def spy(self, cand, right_dev):
        Z = orig(self, cand, right_dev)
        captured.append((cand, None if Z is None else np.asarray(Z)))
        return Z

    slam_mod.StereoSLAM._measure_loop_edge = spy
    try:
        _run(world, frames, voc, "pnp")
    finally:
        slam_mod.StereoSLAM._measure_loop_edge = orig
    assert captured
    cand, Z = captured[-1]
    assert Z is not None, "PnP measurement starved"
    gt = world.poses
    # the PnP edge attaches to the matched vertex itself: Z = T_q^-1 T_m
    Z_gt = np.linalg.inv(gt[cand.query]) @ gt[cand.match]
    t_err = np.linalg.norm(Z[:3, 3] - Z_gt[:3, 3])
    assert t_err < 0.1, f"measured edge off by {t_err:.3f} m"
    # and it is NOT the identity the reference would have used
    assert np.linalg.norm(Z_gt[:3, 3]) > 0.2
