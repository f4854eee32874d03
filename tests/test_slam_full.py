"""Full SLAM (config 3) golden test: circular revisit -> loop closure -> PGO.

The camera orbits inside the corridor and re-traverses its starting poses;
the full pipeline must (a) track through the whole orbit, (b) fire a loop
closure on the revisit, and (c) reduce trajectory drift via the pose-graph
rewrite.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

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


@pytest.fixture(scope="module")
def slam_run():
    # XLA CPU compiler aborts under heavy executable-cache pressure
    # (see tests/test_slam_scan.py); start from a clean cache.
    jax.clear_caches()
    n = 80
    poses = loop_trajectory(n, radius=2.5, overlap=8)
    world = small_world(custom_poses=poses, seed=13)
    # Widen the corridor: at half-res intrinsics the default walls sit close
    # enough that near-wall disparity exceeds the pyramid range.
    world.half_w = 10.0
    frames = [world.render(i)[:2] for i in range(n)]

    # Train the vocabulary on every 4th frame (offline step, reference C10).
    descs, docs = [], []
    for i in range(0, n, 4):
        f = orb.detect_and_compute(jnp.asarray(frames[i][0]), 128)
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc_sign)[v])
        docs.append(np.full(v.sum(), i))
    voc = vocab_mod.train(
        np.concatenate(descs), k=4, levels=3, doc_ids=np.concatenate(docs)
    )

    cfg = preset_loop_closure().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=12, max_points=1024),
        keyframes=KeyframeConfig(max_keyframes=64, min_pnp_inliers=150,
                                 map_block_points=1024),
        loop=LoopClosureConfig(
            orb_features=128, dislocal=8, min_separation=30, cooldown=10,
            max_db_results=12,
            k_consistency=1, geom_min_points=12, db_capacity=128,
            alpha=0.3, min_nss=0.001,
        ),
        pgo=PGOConfig(max_poses=128, max_loop_edges=8, iters=10, cg_iters=64),
    )
    slam = StereoSLAM(cfg, vocab=voc)
    slam.initialize(*frames[0])
    for i in range(1, n):
        slam.process_frame(*frames[i])
    return world, slam


def test_tracks_through_orbit(slam_run):
    world, slam = slam_run
    assert not slam.tracking_failed


def test_loop_closure_fires_on_revisit(slam_run):
    world, slam = slam_run
    assert slam.loop_events, "revisit must trigger a loop closure"
    ev = slam.loop_events[0]
    n = world.n_frames
    steps = n - 8
    # Query should be in the overlap region, match near the orbit start.
    assert ev.query >= steps - 4
    assert ev.match <= 12


def test_pgo_reduces_drift(slam_run):
    world, slam = slam_run
    est = slam.trajectory_array()
    gt = world.poses[: est.shape[0]]
    ate = metrics.ate_rmse(est, gt, align=True)
    assert ate < 0.5, f"post-closure ATE {ate:.3f} m"


def test_graph_and_map_export(slam_run, tmp_path):
    world, slam = slam_run
    gpath = str(tmp_path / "g.g2o")
    slam.save_graph(gpath)
    assert sum(
        ln.startswith("VERTEX") for ln in open(gpath).read().splitlines()
    ) == slam.frame_count
    mpath = str(tmp_path / "map.ply")
    n = slam.save_map(mpath)
    assert n > 500


def test_detect_every_cadence_still_closes(slam_run):
    """LoopClosureConfig.detect_every=2 in the STREAMING driver: detection
    (and the database add) run only on even frames — mirroring scan mode's
    fid %% every == 0 gating — and the stride-widened gater still accepts
    the revisit loop.  Reuses the fixture's compiled kernels."""
    import dataclasses

    world, slam0 = slam_run
    n = 80
    frames = [world.render(i)[:2] for i in range(n)]
    cfg = slam0.config.replace(
        loop=dataclasses.replace(slam0.config.loop, detect_every=2)
    )
    slam = StereoSLAM(cfg, vocab=slam0.detector.vocab)
    slam.initialize(*frames[0])
    for i in range(1, n):
        slam.process_frame(*frames[i])
    assert not slam.tracking_failed
    ids = np.asarray(slam.detector.db_ids)
    added = ids[ids >= 0]
    assert added.size > 0 and (added % 2 == 0).all(), (
        "off-cadence frames entered the BoW database"
    )
    assert len(slam.loop_events) >= 1, "loop missed at detect_every=2"
