"""All three execution postures accept the SAME closure set.

Round-3 finding (VERDICT): the per-frame streaming driver accepted 7 of
the 13 closures the scan and chunked postures found on the jittered
endurance world.  Two mechanisms, both fixed in round 4:

1. the streaming driver decremented its cooldown only on DETECTION
   frames, so at ``detect_every=2`` the effective cooldown was
   ``2 * cooldown`` frames (models/slam.py::_detect_loop docstring);
2. geometric-verification RANSAC keys came from per-driver running
   ``split`` streams, so one borderline divergence phase-shifted every
   later accept (models/loop_closure.py::geom_key rationale).

This test pins the fix: a 2.5-lap jittered revisit world is run through
scan (deferred epilogue), chunked online, and per-frame streaming, and
the accepted (query, match) sets must be IDENTICAL.  Detection is a pure
function of the images + database contents in all three postures, so
with per-frame cooldown accounting and pair-derived RANSAC keys the
accept sets must agree by construction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.config import (
    FrontendConfig,
    KeyframeConfig,
    LoopClosureConfig,
    PGOConfig,
    preset_loop_closure,
)
from ros_stereo_slam_tpu.data.synthetic import (
    SyntheticWorld, jitter_poses, small_world,
)
from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.ops import orb

pytestmark = pytest.mark.slow  # three full-driver runs; excluded by default

LAP = 56
N = 140  # 2.5 laps -> at least two well-separated revisit closures


def _lap_poses(lap: int, step_m: float = 0.45) -> np.ndarray:
    """Tangential-heading circular lap (the bench revisit geometry)."""
    r = lap * step_m / (2.0 * np.pi)
    poses = np.zeros((lap, 4, 4))
    for i in range(lap):
        th = 2 * np.pi * i / lap
        c, s = np.cos(th), np.sin(th)
        poses[i] = np.eye(4)
        poses[i, :3, :3] = np.array(
            [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        poses[i, :3, 3] = np.array([r * (1 - c), 0.0, r * s])
    return poses


@pytest.fixture(scope="module")
def parity_world():
    jax.clear_caches()
    lap_p = _lap_poses(LAP)
    rng = np.random.default_rng(5)
    frames, gt = [], []
    n_laps = int(np.ceil(N / LAP))
    for lap_i in range(n_laps):
        poses_l = (lap_p if lap_i == 0 else
                   jitter_poses(lap_p, rng, trans_m=0.05, rot_deg=0.5))
        world = small_world(n_frames=LAP, seed=3, custom_poses=poses_l)
        world.half_w = 12.0
        b = rng.uniform(0.9, 1.1) if lap_i > 0 else 1.0
        for i in range(LAP):
            if len(frames) >= N:
                break
            l, r, _ = world.render(i)
            if lap_i > 0:
                noise = rng.normal(0, 0.01, l.shape).astype(l.dtype)
                l = np.clip(l * b + noise, 0, 1)
                r = np.clip(r * b + noise, 0, 1)
            frames.append((l, r))
            gt.append(poses_l[i])
    cam = world.camera

    descs, docs = [], []
    for i in range(0, LAP, 4):
        f = orb.detect_and_compute(jnp.asarray(frames[i][0]), 128)
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc_sign)[v])
        docs.append(np.full(int(v.sum()), i))
    voc = vocab_mod.train(
        np.concatenate(descs), k=4, levels=3, doc_ids=np.concatenate(docs)
    )

    cfg = preset_loop_closure().replace(
        camera=cam,
        frontend=FrontendConfig(grid_step=12, max_points=1024),
        keyframes=KeyframeConfig(max_keyframes=64, min_pnp_inliers=150,
                                 map_block_points=1024),
        loop=LoopClosureConfig(
            orb_features=128, dislocal=8, min_separation=30, cooldown=20,
            detect_every=2, max_db_results=12, k_consistency=1,
            geom_min_points=12, db_capacity=256, alpha=0.3, min_nss=0.001,
        ),
        pgo=PGOConfig(max_poses=256, max_loop_edges=8, iters=10,
                      cg_iters=64),
    )
    return frames, np.stack(gt), cfg, voc


@pytest.fixture(scope="module")
def posture_events(parity_world):
    frames, gt, cfg, voc = parity_world
    lefts = np.stack([f[0] for f in frames])
    rights = np.stack([f[1] for f in frames])

    from ros_stereo_slam_tpu.models.slam import StereoSLAM
    from ros_stereo_slam_tpu.models.slam_chunked import run_online_slam
    from ros_stereo_slam_tpu.models.slam_scan import run_offline_slam

    scan_res = run_offline_slam(cfg, voc, lefts, rights)

    chunk_res = run_online_slam(cfg, voc, lefts, rights, chunk=28)

    stream = StereoSLAM(cfg, vocab=voc)
    stream.initialize(*frames[0])
    for i in range(1, N):
        stream.process_frame(*frames[i])

    scan_set = [(q, m) for q, m, _ in scan_res.loop_events]
    chunk_set = [(q, m) for q, m, _ in chunk_res.loop_events]
    stream_set = [(e.query, e.match) for e in stream.loop_events]
    return scan_set, chunk_set, stream_set


def test_scan_finds_multiple_closures(posture_events):
    scan_set, _, _ = posture_events
    assert len(scan_set) >= 2, (
        f"need >=2 closures to exercise cooldown phasing, got {scan_set}"
    )


def test_chunked_matches_scan(posture_events):
    scan_set, chunk_set, _ = posture_events
    assert chunk_set == scan_set


def test_streaming_matches_scan(posture_events):
    """The round-3 regression: streaming accepted a strict subset."""
    scan_set, _, stream_set = posture_events
    assert stream_set == scan_set


def test_speculative_equals_sequential_chunked(parity_world):
    """run_online_slam's speculative pipeline (dispatch k+1 before
    gating k, rollback + re-dispatch on accepted closures) must produce
    the sequential process_chunk loop's EXACT output — same closures,
    same corrections, bitwise-equal trajectory."""
    from ros_stereo_slam_tpu.models.slam_chunked import (
        ChunkedSLAM, run_online_slam,
    )

    frames, gt, cfg, voc = parity_world
    lefts = np.stack([f[0] for f in frames])
    rights = np.stack([f[1] for f in frames])

    spec = run_online_slam(cfg, voc, lefts, rights, chunk=28)

    seq = ChunkedSLAM(cfg, voc)
    seq.initialize(lefts[0], rights[0])
    pos = 1
    n_chunks = 0
    while pos < N:
        n = min(28, N - pos)
        seq.process_chunk(
            lefts[pos:pos + n], rights[pos:pos + n],
            query_frames=lambda fid: (lefts[fid], rights[fid]),
        )
        n_chunks += 1
        pos += n
    seq_res = seq.result(n_chunks=n_chunks)

    assert spec.loop_events == seq_res.loop_events
    assert spec.n_corrections == seq_res.n_corrections
    assert spec.n_corrections >= 1, (
        "world must exercise the rollback path (no correction fired)")
    np.testing.assert_array_equal(spec.trajectory, seq_res.trajectory)
