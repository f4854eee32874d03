"""Scan-mode full SLAM (models/slam_scan.py): loop detection inside the
lax.scan, host gates + deferred PGO as the epilogue.

Golden test on the circular-revisit world (same fixture family as
tests/test_slam_full.py): the closure must fire at the revisit and the
single deferred pose-graph solve must reduce drift.  Also pins the
equivalence of the in-scan detection stats against the streaming
LoopDetector (same ORB, same BoW, same db scoring on the same frames).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.config import (
    FrontendConfig,
    KeyframeConfig,
    LoopClosureConfig,
    PGOConfig,
    preset_loop_closure,
)
from ros_stereo_slam_tpu.data.synthetic import loop_trajectory, small_world
from ros_stereo_slam_tpu.models import loop_closure as lc_mod
from ros_stereo_slam_tpu.models import slam_scan
from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.ops import orb
from ros_stereo_slam_tpu.utils import metrics

pytestmark = pytest.mark.slow  # multi-minute XLA compile; excluded from the default run (pytest.ini)


@pytest.fixture(scope="module")
def scan_run():
    # The combined odometry+detection scan is the largest program in the
    # suite; entering with ~90 tests' worth of cached executables resident
    # has aborted the XLA CPU compiler (SIGABRT inside
    # backend_compile_and_load).  Dropping the caches first keeps the
    # compile within bounds.
    jax.clear_caches()
    n = 80
    poses = loop_trajectory(n, radius=2.5, overlap=8)
    world = small_world(custom_poses=poses, seed=13)
    world.half_w = 10.0
    frames = [world.render(i)[:2] for i in range(n)]
    L = np.stack([f[0] for f in frames]).astype(np.float32)
    R = np.stack([f[1] for f in frames]).astype(np.float32)

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
            max_db_results=12, k_consistency=1, geom_min_points=12,
            db_capacity=128, alpha=0.3, min_nss=0.001,
        ),
        pgo=PGOConfig(max_poses=128, max_loop_edges=8, iters=10, cg_iters=64),
    )
    res = slam_scan.run_offline_slam(cfg, voc, L, R)
    return world, cfg, voc, L, res


def test_scan_slam_finds_revisit_loop(scan_run):
    world, cfg, voc, L, res = scan_run
    assert res.tracking_ok.all()
    assert res.loop_events, "revisit must produce a loop closure"
    q, m, n_inl = res.loop_events[0]
    steps = world.n_frames - 8
    assert q >= steps - 4
    assert m <= 12
    assert n_inl >= cfg.loop.geom_min_points


def test_scan_slam_pgo_reduces_drift(scan_run):
    world, cfg, voc, L, res = scan_run
    gt = world.poses[: res.trajectory.shape[0]]
    ate_odo = metrics.ate_rmse(res.trajectory_odo, gt, align=True)
    ate = metrics.ate_rmse(res.trajectory, gt, align=True)
    assert ate < ate_odo, (ate, ate_odo)
    assert ate < 0.25, f"post-PGO ATE {ate:.3f} m"


def test_scan_map_follows_optimized_trajectory(scan_run):
    """The exported keyframe store must be consistent with the post-PGO
    trajectory (reference ``updateOdometry`` semantics,
    ``src/optimizationStuff.cpp:17-47``): keyframe poses are the optimized
    trajectory rows, and every cloud is the odometry-frame cloud carried
    through the same rigid correction."""
    world, cfg, voc, L, res = scan_run
    assert res.loop_events  # the rewrite only runs when PGO ran
    kf = res.keyframes
    valid = np.asarray(kf.valid)
    fidx = np.asarray(kf.frame_idx)[valid]
    poses = np.asarray(kf.poses)[valid]
    np.testing.assert_allclose(
        poses, res.trajectory[fidx], atol=1e-5,
        err_msg="keyframe poses must follow the optimized trajectory",
    )
    assert np.asarray(kf.retrack)[valid].all()
    # Cloud consistency: the camera-frame cloud inv(T) @ p is invariant
    # under the rewrite, so points must NOT sit at the odometry-world
    # positions wherever the correction moved the keyframe.
    deltas = np.linalg.norm(
        res.trajectory[fidx][:, :3, 3] - res.trajectory_odo[fidx][:, :3, 3],
        axis=-1,
    )
    k_moved = int(np.argmax(deltas))
    assert deltas[k_moved] > 1e-3, "PGO moved no keyframe — test world broken"
    pm = np.asarray(kf.point_mask)[valid][k_moved]
    pts = np.asarray(kf.points)[valid][k_moved][pm]
    T_new = poses[k_moved]
    cam_frame = (pts - T_new[:3, 3]) @ T_new[:3, :3]
    # re-lift through the ODOMETRY pose: must differ by the correction
    T_old = res.trajectory_odo[fidx][k_moved]
    lifted_old = cam_frame @ T_old[:3, :3].T + T_old[:3, 3]
    moved = np.linalg.norm(lifted_old - pts, axis=-1)
    assert np.median(moved) > 1e-3


def test_scan_map_matches_streaming_map(scan_run):
    """Cross-mode map equivalence: the scan epilogue's one deferred
    PGO + rewrite must land the exported map where the streaming driver's
    per-closure optimize + rewrite (slam.py) lands it on the same frames."""
    from ros_stereo_slam_tpu.models.slam import StereoSLAM

    world, cfg, voc, L, res = scan_run
    # re-render the right frames (the fixture only keeps L)
    R = np.stack(
        [world.render(i)[1] for i in range(world.n_frames)]
    ).astype(np.float32)
    slam = StereoSLAM(config=cfg, vocab=voc)
    slam.initialize(L[0], R[0])
    for i in range(1, world.n_frames):
        slam.process_frame(L[i], R[i])
    assert slam.loop_events, "streaming run must close the same loop"

    # Trajectories of the two postures agree closely on this short world.
    traj_s = slam.trajectory_array()
    dt = np.linalg.norm(
        res.trajectory[:, :3, 3] - traj_s[:, :3, 3], axis=-1
    )
    assert float(dt.max()) < 0.30, f"posture trajectory delta {dt.max():.3f}"

    # Keyframes present in BOTH stores (streaming inserts an extra forced
    # keyframe per closure) must carry near-identical world clouds after
    # each mode's rewrite.
    kf_a, kf_b = res.keyframes, slam._carry.keyframes
    va, vb = np.asarray(kf_a.valid), np.asarray(kf_b.valid)
    fa = {int(f): k for k, f in enumerate(np.asarray(kf_a.frame_idx)) if va[k]}
    fb = {int(f): k for k, f in enumerate(np.asarray(kf_b.frame_idx)) if vb[k]}
    common = sorted(set(fa) & set(fb))
    assert len(common) >= 3
    worst = 0.0
    for f in common:
        ka, kb = fa[f], fb[f]
        ma = np.asarray(kf_a.point_mask[ka])
        mb = np.asarray(kf_b.point_mask[kb])
        m = ma & mb
        if not m.any():
            continue
        pa = np.asarray(kf_a.points[ka])[m]
        pb = np.asarray(kf_b.points[kb])[m]
        worst = max(worst, float(np.median(np.linalg.norm(pa - pb, axis=-1))))
    assert worst < 0.30, f"cross-mode map delta (median/kf, worst): {worst:.3f} m"


def test_scan_stats_match_streaming_detector(scan_run):
    """The in-scan detection pipeline (ORB -> BoW -> masked L1 scoring ->
    top-K) must produce the SAME per-frame stats as the streaming
    LoopDetector on identical frames."""
    world, cfg, voc, L, res = scan_run
    lcc = cfg.loop
    det = lc_mod.LoopDetector(vocab=voc, config=lcc)
    check_frames = [20, 40, 72]
    stream = {}
    for i in range(max(check_frames) + 1):
        feats = orb.detect_and_compute(jnp.asarray(L[i]), lcc.orb_features,
                                       n_levels=lcc.orb_levels)
        bow = det._bow_of(feats)
        if det._last is not None and i > lcc.dislocal:
            q_dense = vocab_mod.dense_of_sparse(*bow, voc.n_words)
            ns = float(vocab_mod.score_pair_sparse(q_dense, *det._last))
            q_bins = vocab_mod.bin_of_sparse(*bow, lcc.n_bins)
            ids_d, sc_d = lc_mod._query_scores(
                *bow, q_bins, det.db_words, det.db_wvals, det.db_bins,
                det.db_valid, jnp.int32(i - lcc.dislocal - 1), det.db_ids,
                lcc.max_db_results, lcc.shortlist,
            )
            stream[i] = (ns, np.asarray(ids_d), np.asarray(sc_d))
        det.add(i, feats, bow)

    # recompute the scan stats (cheap CPU run already cached in fixture? —
    # res does not carry them, so re-run the lc-scan alone)
    lc0 = slam_scan.init_lc_state(cfg, voc.n_words)
    step = jax.jit(
        slam_scan._lc_scan_step, static_argnames=("cfg", "vocab_k")
    )
    stats = {}
    for i in range(max(check_frames) + 1):
        lc0, st = step(
            lc0, jnp.asarray(L[i]), jnp.int32(i), tuple(voc.centers),
            jnp.asarray(voc.idf), cfg, voc.k,
        )
        stats[i] = st
    for f in check_frames:
        ns_s, ids_s, sc_s = stream[f]
        assert abs(float(stats[f].ns) - ns_s) < 1e-4
        np.testing.assert_array_equal(np.asarray(stats[f].top_ids), ids_s)
        np.testing.assert_allclose(
            np.asarray(stats[f].top_scores), sc_s, atol=1e-5
        )


def test_chunked_online_driver(scan_run):
    """The chunked ONLINE driver (models/slam_chunked.py): same frames in
    32->16-frame micro-batches with per-chunk gates + immediate PGO
    correction of the live carry.

    Detection is image-driven (ORB/BoW/db never see poses), the gate
    chain is the shared EpilogueGater, and the geometric check consumes
    the same db features with the same PRNG stream — so the accepted
    closures must EXACTLY match the offline epilogue's.  The live
    trajectory must beat raw odometry, and the exported keyframe store
    must follow the live trajectory (reference VisualSLAM.cpp:120-146
    immediate-correction semantics)."""
    from ros_stereo_slam_tpu.models.slam_chunked import run_online_slam

    world, cfg, voc, L, res = scan_run
    R = np.stack(
        [world.render(i)[1] for i in range(world.n_frames)]
    ).astype(np.float32)
    out = run_online_slam(cfg, voc, L, R, chunk=16)
    assert out.tracking_ok.all()
    assert out.n_chunks == -(-(world.n_frames - 1) // 16)
    assert out.n_corrections >= 1
    assert [(q, m) for q, m, _ in out.loop_events] == [
        (q, m) for q, m, _ in res.loop_events
    ], "chunked driver must accept exactly the offline epilogue's closures"

    gt = world.poses[: out.trajectory.shape[0]]
    ate_odo = metrics.ate_rmse(res.trajectory_odo, gt, align=True)
    ate = metrics.ate_rmse(out.trajectory, gt, align=True)
    assert ate < ate_odo, (ate, ate_odo)
    assert ate < 0.25, f"chunked online ATE {ate:.3f} m"

    kf = out.keyframes
    valid = np.asarray(kf.valid)
    fidx = np.asarray(kf.frame_idx)[valid]
    np.testing.assert_allclose(
        np.asarray(kf.poses)[valid], out.trajectory[fidx], atol=1e-4,
        err_msg="keyframe poses must follow the live corrected trajectory",
    )


def test_orb_pallas_kernel_matches_oracle():
    """Pallas ORB descriptor kernel (interpret mode) vs the jnp path:
    same corners, near-identical descriptor bits."""
    from ros_stereo_slam_tpu.data.synthetic import _smooth_noise_2d
    from ros_stereo_slam_tpu.ops import interp, orb_pallas
    from ros_stereo_slam_tpu.ops import orb as orb_mod

    rng = np.random.default_rng(3)
    img = _smooth_noise_2d((256, 384), rng, octaves=5, base_period=16)
    imgj = jnp.asarray(img)
    n = 32
    pts = np.stack(
        [rng.integers(30, 384 - 30, n), rng.integers(30, 256 - 30, n)], axis=1
    ).astype(np.float32)
    sign_k, m = orb_pallas.orb_descriptors(
        imgj, jnp.asarray(pts), interpret=True
    )
    sign_k = np.asarray(sign_k)
    # jnp oracle
    cent = jnp.asarray(orb_mod._CENT)
    sp = jnp.asarray(pts)[:, None, :] + cent[None, :, :]
    vals = interp.bilinear_at(imgj, sp.reshape(-1, 2)).reshape(n, -1)
    m10 = np.asarray(jnp.sum(vals * cent[None, :, 0], axis=1))
    m01 = np.asarray(jnp.sum(vals * cent[None, :, 1], axis=1))
    np.testing.assert_allclose(np.asarray(m)[:, 0], m10, atol=2.0)
    np.testing.assert_allclose(np.asarray(m)[:, 1], m01, atol=2.0)
    angle = np.arctan2(m01, m10)
    ca, sa = np.cos(angle), np.sin(angle)
    rot = np.stack([np.stack([ca, -sa], -1), np.stack([sa, ca], -1)], -2)
    rp = np.einsum("nij,bj->nbi", rot, orb_mod._PAT_P) + pts[:, None, :]
    rq = np.einsum("nij,bj->nbi", rot, orb_mod._PAT_Q) + pts[:, None, :]
    vp = np.asarray(
        interp.bilinear_at(imgj, jnp.asarray(rp.reshape(-1, 2)))
    ).reshape(n, 256)
    vq = np.asarray(
        interp.bilinear_at(imgj, jnp.asarray(rq.reshape(-1, 2)))
    ).reshape(n, 256)
    sign_ref = np.where(vp < vq, 1.0, -1.0)
    assert (sign_k == sign_ref).mean() > 0.97


def test_batched_full_slam_lanes_close_loops(scan_run):
    """run_offline_slam_batched: each lane of the batched odometry +
    detection scan must independently track, detect the revisit, and
    close the loop to the same quality bars as the single-lane run
    (lanes carry distinct RNG streams, so the check is per-lane quality,
    not bit equality — the step-level bit parity lives in
    tests/test_batched.py)."""
    world, cfg, voc, L, res = scan_run
    jax.clear_caches()  # see scan_run: the XLA CPU compiler aborts when
    # entering another giant compile with many cached executables
    n = L.shape[0]
    R = np.stack(
        [world.render(i)[1] for i in range(n)]).astype(np.float32)
    Lb = np.stack([L, L])
    Rb = np.stack([R, R])
    results = slam_scan.run_offline_slam_batched(cfg, voc, Lb, Rb)
    assert len(results) == 2
    gt = world.poses
    steps = world.n_frames - 8
    for b, r in enumerate(results):
        assert r.tracking_ok.all(), f"lane {b} lost tracking"
        assert r.loop_events, f"lane {b} found no loop closure"
        q, m, n_inl = r.loop_events[0]
        assert q >= steps - 4 and m <= 12, f"lane {b}: ({q}, {m})"
        assert n_inl >= cfg.loop.geom_min_points
        ate = metrics.ate_rmse(
            r.trajectory, gt[: r.trajectory.shape[0]], align=True)
        ate_odo = metrics.ate_rmse(
            r.trajectory_odo, gt[: r.trajectory_odo.shape[0]], align=True)
        assert ate < ate_odo, f"lane {b}: PGO must reduce drift"
        assert ate < 0.25, f"lane {b} post-PGO ATE {ate:.3f} m"
