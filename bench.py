#!/usr/bin/env python
"""Benchmark harness: frames/sec/chip on a KITTI-scale sequence.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The default run covers BOTH headline configurations — odometry (config 1)
and full SLAM with on-device loop detection (config 3) — plus the online
streaming posture with a measured transfer-vs-compute breakdown, merged
into the single JSON line.  `--preset` narrows to one configuration
(odometry / loop_closure / mapping / ba).

Execution model: compute rows run the whole sequence as a single
``lax.scan`` XLA program with frames pre-staged in HBM (the TPU-native
offline-mapping posture).  The streaming rows measure the online posture:
chunked micro-batches dispatched back-to-back INCLUDING each chunk's
host->device transfer (uint8-staged, double-buffered), with pure-compute
and pure-transfer legs reported separately.

Baseline: the reference C++ pipeline publishes no numbers (BASELINE.md),
so the baseline is SELF-MEASURED: ``tools/reference_baseline.py``
re-executes the reference's exact per-frame OpenCV pipeline (same calls,
same parameters) on the same synthetic frames.  For context, the author's
full loop displayed ~10 fps on a desktop CPU (SURVEY.md §6).

Usage: python bench.py [--frames N] [--platform cpu] [--preset P]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Measured: tools/reference_baseline.py --frames 384 on this image
# (vision-only reference loop, modern server CPU — a conservative bar).
# At 192 frames the same tool measures 108.19 fps / 0.175 m (the late
# 192-384 stretch has harder near-wall views that slow OpenCV's adaptive
# RANSAC and roughly match-degrade both pipelines' ATE).
REFERENCE_CPU_FPS = 85.04
# Full-SLAM bar: the same re-execution with the reference's per-frame
# ORB added (tools/reference_baseline.py --full; its DBoW2 transform/
# query/geometry, PCL SOR, imshow and ROS costs are NOT included, so
# the bar is conservative).  The loop_closure preset compares to THIS.
REFERENCE_CPU_FULL_FPS = 64.4
REFERENCE_CPU_ATE_M = 1.277
AUTHOR_LOOP_FPS = 10.0


def _render_world(args, cam):
    """Render the benchmark world; returns (left, right, gt_poses) f32."""
    import numpy as np

    from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld

    n_total = args.frames + 1
    if args.world == "revisit":
        # Two laps of a circle (x-z plane, tangential heading): lap 2
        # revisits every pose of lap 1, so the loop_closure preset
        # detects and closes real loops inside the timed region.  Only
        # the lap's unique frames render; the stack tiles (the device
        # still processes every frame individually).  `--jitter` makes
        # lap-2+ frames non-identical (pose + photometric perturbation,
        # the appearance-change regime BoW retrieval exists to survive).
        lap = max(n_total // 2, 2)
        r = lap * 0.8 / (2.0 * np.pi)  # ~0.8 m/frame, endurance geometry
        lap_poses = np.zeros((lap, 4, 4))
        for i in range(lap):
            th = 2 * np.pi * i / lap
            c, sn = np.cos(th), np.sin(th)
            lap_poses[i] = np.eye(4)
            lap_poses[i, :3, :3] = np.array(
                [[c, 0.0, sn], [0.0, 1.0, 0.0], [-sn, 0.0, c]])
            lap_poses[i, :3, 3] = np.array([r * (1 - c), 0.0, r * sn])
        idx = np.arange(n_total) % lap
        if args.jitter:
            from ros_stereo_slam_tpu.data.synthetic import jitter_poses

            n_laps = int(np.ceil(n_total / lap))
            rng = np.random.default_rng(17)
            print(f"[bench] rendering {n_total} jittered revisit frames "
                  f"({n_laps} laps) at {cam.width}x{cam.height}...",
                  file=sys.stderr)
            lefts, rights, gt = [], [], []
            for lap_i in range(n_laps):
                poses_l = (lap_poses if lap_i == 0 else jitter_poses(
                    lap_poses, rng, trans_m=0.1, rot_deg=1.0))
                world = SyntheticWorld(
                    camera=cam, n_frames=lap, seed=11,
                    custom_poses=poses_l,
                    half_w=max(3.0 * r, 18.0), end_z=max(6.0 * r, 260.0),
                )
                # per-LAP illumination + per-frame sensor noise (see
                # tools/endurance_run.py: per-frame brightness flashes
                # are a vibration regime, not an appearance-change one)
                b = rng.uniform(0.85, 1.15) if lap_i > 0 else 1.0
                for i in range(lap):
                    if len(gt) >= n_total:
                        break
                    l, rr, _ = world.render(i)
                    if lap_i > 0:  # photometric jitter on revisit laps
                        noise = rng.normal(0, 0.02, l.shape).astype(l.dtype)
                        l = np.clip(l * b + noise, 0, 1)
                        rr = np.clip(rr * b + noise, 0, 1)
                    lefts.append(l)
                    rights.append(rr)
                    gt.append(poses_l[i])
            return np.stack(lefts), np.stack(rights), np.stack(gt)
        world = SyntheticWorld(
            camera=cam, n_frames=lap, seed=11, custom_poses=lap_poses,
            half_w=max(3.0 * r, 18.0), end_z=max(6.0 * r, 260.0),
        )
        print(f"[bench] rendering {lap} unique revisit-lap frames at "
              f"{cam.width}x{cam.height}...", file=sys.stderr)
        lefts, rights = [], []
        for i in range(lap):
            l, rr, _ = world.render(i)
            lefts.append(l)
            rights.append(rr)
        return (np.stack(lefts)[idx], np.stack(rights)[idx],
                lap_poses[idx])
    # Wider corridor (half_w): the trajectory's accumulated yaw (~26
    # deg by frame 96) otherwise walks the camera into the +/-7 m side
    # wall, which collapses scene depth and degrades tracking late in
    # the sequence.
    world = SyntheticWorld(camera=cam, n_frames=n_total, seed=11, half_w=18.0)
    print(f"[bench] rendering {n_total} synthetic frames at "
          f"{cam.width}x{cam.height}...", file=sys.stderr)
    lefts, rights = [], []
    for i in range(n_total):
        l, r, _ = world.render(i)
        lefts.append(l)
        rights.append(r)
    return np.stack(lefts), np.stack(rights), world.poses


def _time_stats(fn, reps):
    """Time `fn` over `reps` runs; returns (out, best_dt, median_dt).

    Headline rows report BEST-of-reps (cross-round continuity), but the
    artifact also carries the median per row (`*_median` keys) so the dev
    tunnel's run-to-run noise (±20 % claimed; up to 2.8x observed on the
    transfer-bound stream rows across rounds) is visible in the record
    instead of silently inflating the luckiest run."""
    dts = []
    out = None
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        out = fn()
        dts.append(time.perf_counter() - t0)
    dts.sort()
    n = len(dts)
    med = dts[n // 2] if n % 2 else 0.5 * (dts[n // 2 - 1] + dts[n // 2])
    return out, dts[0], med


def bench_odometry(args, cfg, left_seq, right_seq, gt_poses,
                   rgb_seq=None, tag=""):
    """Configs 1/2/4: whole-sequence scan, frames pre-staged in HBM (the
    timed region measures compute, not the dev-tunnel PCIe stand-in)."""
    import jax
    import jax.numpy as jnp

    from ros_stereo_slam_tpu.models.pipeline import run_offline
    from ros_stereo_slam_tpu.utils import metrics

    left_dev = jax.device_put(jnp.asarray(left_seq, jnp.float32))
    right_dev = jax.device_put(jnp.asarray(right_seq, jnp.float32))
    rgb_dev = (None if rgb_seq is None
               else jax.device_put(jnp.asarray(rgb_seq)))
    jax.block_until_ready((left_dev, right_dev))
    print(f"[bench] {tag or 'odometry'}: compile + first run...",
          file=sys.stderr)
    run_offline(cfg, left_dev, right_dev, rgb_seq=rgb_dev)
    print("[bench] timed runs...", file=sys.stderr)
    res, dt, med = _time_stats(
        lambda: run_offline(cfg, left_dev, right_dev, rgb_seq=rgb_dev),
        args.reps,
    )
    fps = args.frames / dt
    ate = metrics.ate_rmse(res.trajectory, gt_poses[: res.trajectory.shape[0]])
    return fps, float(ate), res, args.frames / med


def _slam_cfg(args, cam):
    """The full-SLAM bench configuration at reference scale: k=9, L=6 =
    531,441 words and a 4,096-frame database (the reference trains k=9
    L=6 vocabularies, bagOfWordsDetector.cpp:21, and allocates 4,000 db
    entries, visualSLAM.h:137).  The sparse BoW database makes this
    ~100 MB of device state; a dense (capacity, n_words) matrix would
    be ~8.7 GB."""
    import dataclasses

    from ros_stereo_slam_tpu.config import (
        LoopClosureConfig, preset_loop_closure,
    )

    return preset_loop_closure().replace(
        camera=cam,
        loop=dataclasses.replace(
            LoopClosureConfig(), db_capacity=4096,
            detect_every=args.detect_every,
        ),
    )


def _trained_vocab(cfg, left_seq):
    """Train (or load from the repo-local cache) the reference-scale
    vocabulary for a rendered world.  The trained vocabulary is a
    deterministic function of the world's pixels + ORB/vocab params —
    both pinned in the cache key — so repeated bench invocations skip
    the ~10 min offline training step (untimed either way; delete the
    cache file to retrain).  The cache lives under <repo>/runs/.cache,
    not a predictable world-writable /tmp path another user could
    pre-seed."""
    import hashlib

    import jax.numpy as jnp
    import numpy as np

    from ros_stereo_slam_tpu.models import vocab as vocab_mod
    from ros_stereo_slam_tpu.ops import orb

    n_total = left_seq.shape[0]
    wkey = hashlib.sha1(
        np.ascontiguousarray(left_seq[:: max(n_total // 8, 1)])
    ).hexdigest()[:16]
    ckey = (f"{wkey}_{n_total}_{cfg.loop.orb_features}_"
            f"{cfg.loop.orb_levels}_{cfg.loop.vocab_k}_"
            f"{cfg.loop.vocab_levels}")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "runs", ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"bench_vocab_{ckey}.npz")
    if os.path.exists(cache):
        print(f"[bench] loading cached vocabulary ({cache})...",
              file=sys.stderr)
        return vocab_mod.Vocabulary.load(cache)
    print("[bench] training vocabulary (untimed offline step)...",
          file=sys.stderr)
    descs, docs = [], []
    for i in range(0, n_total, 8):
        f = orb.detect_and_compute(
            jnp.asarray(left_seq[i]), cfg.loop.orb_features,
            n_levels=cfg.loop.orb_levels,
        )
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc_sign)[v])
        docs.append(np.full(int(v.sum()), i))
    voc = vocab_mod.train_batched(
        np.concatenate(descs), k=cfg.loop.vocab_k,
        levels=cfg.loop.vocab_levels, doc_ids=np.concatenate(docs),
    )
    voc.save(cache)
    return voc


def bench_full_slam(args, cam, left_seq, right_seq, gt_poses):
    """Config 3: odometry + on-device loop detection in the SAME scan +
    host gate/PGO/map-rewrite epilogue (models/slam_scan.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ros_stereo_slam_tpu.models.slam_scan import run_offline_slam
    from ros_stereo_slam_tpu.utils import metrics

    cfg = _slam_cfg(args, cam)
    n_total = left_seq.shape[0]
    voc = _trained_vocab(cfg, left_seq)
    left_dev = jax.device_put(jnp.asarray(left_seq, jnp.float32))
    right_dev = jax.device_put(jnp.asarray(right_seq, jnp.float32))
    jax.block_until_ready((left_dev, right_dev))
    print("[bench] full SLAM: compile + first run...", file=sys.stderr)
    run_offline_slam(cfg, voc, left_dev, right_dev)
    print("[bench] timed runs...", file=sys.stderr)
    res, dt, med = _time_stats(
        lambda: run_offline_slam(cfg, voc, left_dev, right_dev), args.reps
    )
    fps = args.frames / dt
    fps_med = args.frames / med
    ate = metrics.ate_rmse(
        res.trajectory, gt_poses[: res.trajectory.shape[0]]
    )

    # Online posture: the same scan step in 32-frame micro-batches with
    # per-chunk gates + immediate PGO correction of the live carry
    # (models/slam_chunked.py) — correction latency <= chunk length,
    # reference immediate-correction semantics.  Frames pre-staged as
    # uint8 (the compute posture; transfers decompose separately, see
    # bench_streaming).  Timed region includes the per-chunk host gate
    # work and D2H stat fetches — the honest online number.
    from ros_stereo_slam_tpu.models.slam_chunked import run_online_slam

    l8 = jax.device_put(jnp.asarray(
        np.clip(left_seq * 255.0, 0, 255).astype(np.uint8)))
    r8 = jax.device_put(jnp.asarray(
        np.clip(right_seq * 255.0, 0, 255).astype(np.uint8)))
    jax.block_until_ready((l8, r8))
    # Chunk sweep (ATE vs throughput vs correction latency): correction
    # latency is bounded by the chunk length, so larger chunks amortize
    # more per-chunk host round trips at the cost of later corrections.
    # Chunk 32 stays the headline (<= 31-frame latency, the reference's
    # immediate-correction regime priced honestly); the sweep documents
    # the knee.
    online = {}
    sweep = {}
    for ch in (32, 64, 128):
        print(f"[bench] online (chunked {ch}) SLAM: compile + first "
              "run...", file=sys.stderr)
        run_online_slam(cfg, voc, l8, r8, chunk=ch)
        print("[bench] timed runs...", file=sys.stderr)
        ores, odt, omed = _time_stats(
            lambda ch=ch: run_online_slam(cfg, voc, l8, r8, chunk=ch),
            args.reps,
        )
        o_ate = float(metrics.ate_rmse(
            ores.trajectory, gt_poses[: ores.trajectory.shape[0]]))
        sweep[str(ch)] = {
            "fps": round(args.frames / odt, 2),
            "fps_median": round(args.frames / omed, 2),
            "vs_baseline": round(
                args.frames / odt / REFERENCE_CPU_FULL_FPS, 2),
            "ate_rmse_m": round(o_ate, 4),
            "corrections": ores.n_corrections,
        }
        if ch == 32:
            online = {
                "slam_online_fps": round(args.frames / odt, 2),
                "slam_online_fps_median": round(args.frames / omed, 2),
                "slam_online_vs_baseline": round(
                    args.frames / odt / REFERENCE_CPU_FULL_FPS, 2),
                "slam_online_ate_rmse_m": round(o_ate, 4),
                "slam_online_chunk": 32,
                "slam_online_corrections": ores.n_corrections,
            }
    online["slam_online_chunk_sweep"] = sweep

    # Batched full SLAM (DP-over-sequences): the sequence split into 2
    # lanes of odometry + detection through ONE scan (per-lane 531k-word
    # databases), per-lane host epilogue included in the timed region —
    # the fleet-mapping posture at full retrieval scale.  Exact
    # single-lane keyframe semantics (batch_align_window=1): the shared-
    # cadence alignment was measured SLOWER AND less accurate
    # (tools/profile_kf_align.py: w1 307.9 fps / 1.06 m, w2 290.5 /
    # 1.62, w4 302.9 / 2.03 — deferred re-bootstraps track longer on
    # degraded feature sets, costing more than the shared branch saves;
    # RESULTS.md "Batched FULL SLAM").
    from ros_stereo_slam_tpu.models.slam_scan import run_offline_slam_batched

    B = 2
    per = (n_total - 1) // B
    # pre-staged in HBM like every other compute row (a numpy stack here
    # would re-cross the dev tunnel's ~45 MB/s link on every timed rep)
    lanes_l = jax.device_put(jnp.asarray(
        np.stack([left_seq[s:s + per + 1] for s in (0, per)]), jnp.float32))
    lanes_r = jax.device_put(jnp.asarray(
        np.stack([right_seq[s:s + per + 1] for s in (0, per)]), jnp.float32))
    jax.block_until_ready((lanes_l, lanes_r))
    print(f"[bench] batched full SLAM x{B}: compile + first run...",
          file=sys.stderr)
    run_offline_slam_batched(cfg, voc, lanes_l, lanes_r)
    print("[bench] timed runs...", file=sys.stderr)
    bres, bdt, bmed = _time_stats(
        lambda: run_offline_slam_batched(cfg, voc, lanes_l, lanes_r),
        args.reps,
    )
    bates = [
        float(metrics.ate_rmse(
            r.trajectory, gt_poses[s:s + per + 1][: r.trajectory.shape[0]]))
        for r, s in zip(bres, (0, per))
    ]
    online.update({
        "slam_batched_lanes": B,
        "slam_batched_kf_align": cfg.keyframes.batch_align_window,
        "slam_batched_fps_aggregate": round(B * per / bdt, 2),
        "slam_batched_fps_aggregate_median": round(B * per / bmed, 2),
        "slam_batched_vs_baseline": round(
            B * per / bdt / REFERENCE_CPU_FULL_FPS, 2),
        "slam_batched_ate_rmse_m_worst_lane": round(max(bates), 4),
    })
    return fps, float(ate), res, cfg, voc, online, fps_med


def bench_revisit_slam(args, cam, gt_unused=None):
    """Closures INSIDE the driver-captured timed region.

    The reference's only operating mode detects every frame and closes
    loops live (``/root/reference/src/optimizationStuff.cpp:49-65``,
    ``src/VisualSLAM.cpp:76-86``); the corridor headline world has no
    revisits, so its full-SLAM row exercises zero closures.  This row
    renders the jittered 2-lap revisit world (lap 2 re-rendered under
    smooth viewpoint + illumination perturbation — revisits are
    NON-identical frames) and times the same scan + epilogue path:
    detection, gate chain, geometric verification, PnP loop-edge
    measurement, deferred PGO over all accepted edges, and the keyframe
    cloud/pose rewrite all run inside the measurement.  Shares the
    corridor full-SLAM row's cfg, so XLA reuses its compilation.
    """
    import argparse as _ap
    import copy

    import jax
    import jax.numpy as jnp

    from ros_stereo_slam_tpu.models.slam_scan import run_offline_slam
    from ros_stereo_slam_tpu.utils import metrics

    rv_args = copy.copy(args) if not isinstance(args, _ap.Namespace) \
        else _ap.Namespace(**vars(args))
    rv_args.world = "revisit"
    rv_args.jitter = True
    left_seq, right_seq, gt_poses = _render_world(rv_args, cam)
    cfg = _slam_cfg(args, cam)
    voc = _trained_vocab(cfg, left_seq)
    left_dev = jax.device_put(jnp.asarray(left_seq, jnp.float32))
    right_dev = jax.device_put(jnp.asarray(right_seq, jnp.float32))
    jax.block_until_ready((left_dev, right_dev))
    print("[bench] revisit full SLAM: compile + first run...",
          file=sys.stderr)
    run_offline_slam(cfg, voc, left_dev, right_dev)
    print("[bench] timed runs...", file=sys.stderr)
    res, dt, med = _time_stats(
        lambda: run_offline_slam(cfg, voc, left_dev, right_dev), args.reps
    )
    fps = args.frames / dt
    ate = metrics.ate_rmse(
        res.trajectory, gt_poses[: res.trajectory.shape[0]]
    )
    out = {
        "slam_revisit_fps": round(fps, 2),
        "slam_revisit_fps_median": round(args.frames / med, 2),
        "slam_revisit_vs_baseline": round(fps / REFERENCE_CPU_FULL_FPS, 2),
        "slam_revisit_ate_rmse_m": round(float(ate), 4),
        "slam_revisit_loop_events": len(res.loop_events),
        "slam_revisit_world": "revisit+jitter",
    }
    # Matched baseline: re-execute the reference's CPU pipeline (with its
    # per-frame ORB front half) on THESE jittered revisit frames, so the
    # one closures-in-region row has an apples-to-apples denominator
    # instead of the corridor-world bar.
    try:
        import importlib.util

        import numpy as np

        spec = importlib.util.spec_from_file_location(
            "reference_baseline",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "reference_baseline.py"))
        refb = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(refb)
        frames_u8 = [
            ((np.clip(l, 0, 1) * 255).astype(np.uint8),
             (np.clip(r, 0, 1) * 255).astype(np.uint8))
            for l, r in zip(left_seq, right_seq)
        ]
        K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy],
                      [0, 0, 1]])
        print("[bench] revisit CPU baseline (reference pipeline on the "
              "same frames)...", file=sys.stderr)
        ref_dt, ref_traj = refb.run_pipeline(
            frames_u8, K, cam.baseline, full=True)
        ref_fps = args.frames / ref_dt
        ref_ate = float(metrics.ate_rmse(
            ref_traj, gt_poses[: ref_traj.shape[0]]))
        out.update({
            "baseline_cpu_full_revisit_fps": round(ref_fps, 2),
            "baseline_cpu_revisit_ate_m": round(ref_ate, 4),
            "slam_revisit_vs_baseline": round(fps / ref_fps, 2),
        })
    except Exception as e:
        print(f"[bench] revisit baseline skipped: {e!r}", file=sys.stderr)
    return out


def bench_batched(args, cfg, left_seq, right_seq, gt_poses):
    """DP-over-sequences on ONE chip: the rendered sequence splits into
    ``--lanes`` independent sub-sequences run as a SINGLE vmapped scan.

    SLAM odometry is gather/latency-bound (~0.3 % MFU, RESULTS.md), so
    one sequence leaves most of the chip idle between tiny kernels;
    vmapping lanes amortizes every kernel launch, gather and small
    matmul across B sequences.  This is the multi-session mapping
    posture (a robot fleet's sequences, or one long sequence split into
    shards, mapped concurrently) — and the per-chip aggregate the
    multi-chip DP axis multiplies (each lane is embarrassingly parallel
    across devices; `__graft_entry__.dryrun_multichip` shards the same
    computation's point dimension instead).

    Reported fps is AGGREGATE frames/s across lanes; ATE is checked per
    lane against that lane's GT segment so batching cannot hide quality
    regressions.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ros_stereo_slam_tpu.models import step as step_mod
    from ros_stereo_slam_tpu.models import step_batched
    from ros_stereo_slam_tpu.models.pipeline import _grid_for
    from ros_stereo_slam_tpu.utils import metrics

    B = args.lanes
    n_total = left_seq.shape[0]
    per = (n_total - 1) // B
    if per < 8:
        return {}
    grid_pts, grid_mask = _grid_for(cfg)
    L = jax.device_put(jnp.asarray(left_seq, jnp.float32))
    R = jax.device_put(jnp.asarray(right_seq, jnp.float32))
    starts = [b * per for b in range(B)]
    L0 = jnp.stack([L[s] for s in starts])
    R0 = jnp.stack([R[s] for s in starts])
    Ls = jnp.stack([L[s + 1:s + 1 + per] for s in starts])  # (B,per,H,W)
    Rs = jnp.stack([R[s + 1:s + 1 + per] for s in starts])
    jax.block_until_ready((Ls, Rs))

    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), B)
    carry0 = jax.vmap(
        lambda l0, r0, k: step_mod.init_carry(
            l0, r0, grid_pts, grid_mask, k, cfg)
    )(L0, R0, keys)

    def run(ls, rs, c):
        # hoisted-cond batched step (NOT jax.vmap(run_sequence): vmap
        # forces both lax.cond branches — measured 463 -> 180 fps/lane)
        return step_batched.run_sequence_batched(
            ls, rs, c, grid_pts, grid_mask, cfg)

    print(f"[bench] batched x{B}: compile + first run...", file=sys.stderr)
    _, stats = run(Ls, Rs, carry0)
    np.asarray(stats.T_wc)
    print("[bench] timed runs...", file=sys.stderr)

    def timed():
        _, st = run(Ls, Rs, carry0)
        jax.block_until_ready(st.T_wc)
        return st

    stats, dt, med = _time_stats(timed, args.reps)
    fps = B * per / dt
    Twc = np.swapaxes(np.asarray(stats.T_wc), 0, 1)  # (B, per, 4, 4)
    ates = [
        float(metrics.ate_rmse(Twc[b], gt_poses[s + 1:s + 1 + per]))
        for b, s in enumerate(starts)
    ]
    return {
        "batched_lanes": B,
        "batched_frames_per_lane": per,
        "batched_fps_aggregate": round(fps, 2),
        "batched_fps_aggregate_median": round(B * per / med, 2),
        "batched_vs_baseline": round(fps / REFERENCE_CPU_FPS, 2),
        "batched_ate_rmse_m_worst_lane": round(max(ates), 4),
        "batched_tracked_pct": round(
            100.0 * float(np.asarray(stats.tracking_ok).mean()), 2),
    }


def bench_streaming(args, cfg, left_seq, right_seq, gt_poses):
    """Online posture: per-frame and chunked dispatch INCLUDING transfers.

    The chunked mode stages uint8 (4x less H2D than f32) and
    double-buffers the next chunk's transfer against the current chunk's
    compute.  Pure-compute (chunks pre-staged) and pure-transfer legs are
    measured separately so the posture's cost decomposes into bytes vs
    math — over the dev tunnel the transfer leg dominates; production
    PCIe is ~100x the tunnel's effective bandwidth.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ros_stereo_slam_tpu.models import step as step_mod
    from ros_stereo_slam_tpu.models.pipeline import StereoOdometry, _grid_for

    out = {}
    n_total = left_seq.shape[0]

    # Per-frame dispatch (f32, as an online robot would feed single frames)
    n_stream = min(96, n_total - 1)
    slam = StereoOdometry(cfg)
    slam.initialize(left_seq[0], right_seq[0])
    slam.process_frame(left_seq[1], right_seq[1])  # compile
    slam2 = StereoOdometry(cfg)
    slam2.initialize(left_seq[0], right_seq[0])
    t0 = time.perf_counter()
    for i in range(1, n_stream + 1):
        slam2.process_frame(left_seq[i], right_seq[i])
    out["stream_fps"] = round(n_stream / (time.perf_counter() - t0), 2)
    # Per-frame streaming is pure dispatch+transfer latency over the dev
    # tunnel — the row is tunnel-bound, not compute-bound, and varies
    # 2.8x across rounds with no code change (BENCH_r02 3.93 vs r04
    # 1.42).  Read it with stream_h2d_mb_s from the SAME run; production
    # PCIe is ~100x the tunnel's effective bandwidth.
    out["stream_note"] = ("tunnel-latency-bound; compare against "
                          "stream_h2d_mb_s of this run, not across rounds")

    chunk = 32
    if n_total - 1 < 2 * chunk:
        return out
    grid_pts, grid_mask = _grid_for(cfg)
    l8 = np.ascontiguousarray(
        np.clip(left_seq * 255.0, 0, 255).astype(np.uint8))
    r8 = np.ascontiguousarray(
        np.clip(right_seq * 255.0, 0, 255).astype(np.uint8))
    carry0 = step_mod.init_carry(
        jnp.asarray(l8[0]), jnp.asarray(r8[0]),
        grid_pts, grid_mask, jax.random.PRNGKey(cfg.seed), cfg,
    )
    n_chunks = (n_total - 1) // chunk
    bytes_per_chunk = 2 * chunk * l8[0].nbytes  # L+R uint8

    def put_chunk(k):
        # device_put on the numpy slice is ONE async H2D transfer
        # (jnp.asarray would transfer eagerly and defeat double-buffering)
        lo = 1 + k * chunk
        return (jax.device_put(l8[lo:lo + chunk]),
                jax.device_put(r8[lo:lo + chunk]))

    def run_chunk(c, bufs):
        return step_mod.run_sequence(
            bufs[0], bufs[1], c, grid_pts, grid_mask, cfg)

    # compile
    c, st = run_chunk(carry0, put_chunk(0))
    np.asarray(st.T_wc)

    # (a) pure transfer: H2D of every chunk, blocked
    t0 = time.perf_counter()
    for k in range(n_chunks):
        jax.block_until_ready(put_chunk(k))
    dt_h2d = time.perf_counter() - t0
    out["stream_h2d_mb_s"] = round(
        n_chunks * bytes_per_chunk / dt_h2d / 1e6, 1)
    out["stream_bytes_per_frame"] = 2 * l8[0].nbytes

    # (b) pure compute: chunks pre-staged in HBM, carry threaded
    staged = [put_chunk(k) for k in range(n_chunks)]
    jax.block_until_ready(staged[-1])
    t0 = time.perf_counter()
    c = carry0
    for k in range(n_chunks):
        c, st = run_chunk(c, staged[k])
    np.asarray(st.T_wc)
    out["stream_chunk32_compute_fps"] = round(
        n_chunks * chunk / (time.perf_counter() - t0), 2)
    del staged

    # (c) online: transfer + compute, double-buffered (the next chunk's
    # H2D overlaps the current chunk's device compute — both dispatches
    # are async)
    t0 = time.perf_counter()
    c = carry0
    nxt = put_chunk(0)
    for k in range(n_chunks):
        cur = nxt
        if k + 1 < n_chunks:
            nxt = put_chunk(k + 1)
        c, st = run_chunk(c, cur)
    np.asarray(st.T_wc)
    out["stream_chunk32_fps"] = round(
        n_chunks * chunk / (time.perf_counter() - t0), 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=384, help="timed frames")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions; best is the headline and "
                    "the median ships alongside as *_median (the dev "
                    "TPU tunnel adds ±20%% run-to-run noise)")
    ap.add_argument("--preset",
                    choices=["headline", "odometry", "loop_closure",
                             "mapping", "ba", "streaming", "batched"],
                    default="headline",
                    help="headline = odometry + full SLAM + streaming "
                    "breakdown (one merged JSON line); the named presets "
                    "run a single BASELINE.json configuration; streaming "
                    "= the online-posture rows alone (useful with "
                    "--platform cpu: same-machine comparison against the "
                    "CPU baseline with no tunnel in the path)")
    ap.add_argument("--world", choices=["corridor", "revisit"],
                    default="corridor",
                    help="corridor (headline; no revisits, measures "
                    "full-SLAM overhead honestly) or revisit (2-lap "
                    "circle: the loop_closure preset detects + closes "
                    "real loops inside the timed region)")
    ap.add_argument("--jitter", action="store_true",
                    help="revisit world only: perturb lap-2+ rendering "
                    "(pose ~0.1 m/1 deg + brightness/noise) so revisits "
                    "are non-identical")
    ap.add_argument("--detect-every", type=int, default=None,
                    help="loop-detection cadence for the full-SLAM rows "
                    "(default: LoopClosureConfig default)")
    ap.add_argument("--no-stream", action="store_true",
                    help="skip the streaming-posture rows")
    ap.add_argument("--lanes", type=int, default=2,
                    help="batched preset: independent sequence lanes in "
                    "one batched scan (DP-over-sequences).  Default 2 — "
                    "the measured sweet spot: the batch-hoisted keyframe/"
                    "rescue branches fire whenever ANY lane triggers, so "
                    "P(branch) grows with lane count (2: 594 fps, 3: 555, "
                    "4: 499 aggregate on the 384-frame world)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ros_stereo_slam_tpu.config import (
        CameraConfig, LoopClosureConfig, preset_ba, preset_odometry,
    )

    if args.detect_every is None:
        args.detect_every = LoopClosureConfig().detect_every

    cam = CameraConfig()  # full KITTI geometry: 1241x376
    left_seq, right_seq, gt_poses = _render_world(args, cam)
    cfg = preset_odometry().replace(camera=cam)
    platform = jax.devices()[0].platform
    print(f"[bench] preset={args.preset} platform={platform}",
          file=sys.stderr)

    result = {
        "unit": "frames/s",
        "frames": args.frames,
        "world": args.world + ("+jitter" if args.jitter else ""),
        "resolution": f"{cam.width}x{cam.height}",
        "platform": platform,
        "n_devices": len(jax.devices()),
        "reps": args.reps,
        "timing": "best-of-reps headline; *_median = median of reps",
        "baseline_cpu_fps": REFERENCE_CPU_FPS,
        "baseline_cpu_full_fps": REFERENCE_CPU_FULL_FPS,
        "baseline_cpu_ate_m": REFERENCE_CPU_ATE_M,
        "baseline_note": (
            "baseline = measured re-execution of the reference's OpenCV "
            "pipeline on identical frames (tools/reference_baseline.py); "
            "the author's full loop displayed ~10 fps (SURVEY.md §6)"
        ),
    }

    if args.preset in ("headline", "odometry", "mapping"):
        rgb = None
        mcfg = cfg
        if args.preset == "mapping":
            # Config 2: the scan carries the RGB map path (per-keyframe
            # cloud coloring) and the map is exported after the timed
            # region (I/O, untimed).
            import numpy as np

            from ros_stereo_slam_tpu.config import preset_mapping

            mcfg = preset_mapping().replace(camera=cam)
            rgb = np.repeat(left_seq[..., None], 3, axis=-1)
        fps, ate, res, fps_med = bench_odometry(
            args, mcfg, left_seq, right_seq, gt_poses, rgb_seq=rgb,
            tag=args.preset,
        )
        result.update({
            "metric": "odometry_frames_per_sec_per_chip",
            "value": round(fps, 2),
            "value_median": round(fps_med, 2),
            "vs_baseline": round(fps / REFERENCE_CPU_FPS, 2),
            "ate_rmse_m": round(ate, 4),
            "vs_author_loop": round(fps / AUTHOR_LOOP_FPS, 2),
            "mode": "scan",
        })
        if args.preset == "mapping":
            from ros_stereo_slam_tpu.models.pipeline import map_points_of
            from ros_stereo_slam_tpu.utils import ply

            pts, cols = map_points_of(res.keyframes)
            n = ply.save_ply("/tmp/bench_map.ply", pts, cols)
            result.update({
                "metric": "mapping_frames_per_sec_per_chip",
                "map_points": int(n),
            })

    if args.preset == "headline":
        # Config 2 (mapping) and config 4 (BA) rows in the driver-
        # captured artifact — previously reachable only via --preset.
        import numpy as np

        from ros_stereo_slam_tpu.config import preset_mapping
        from ros_stereo_slam_tpu.models.pipeline import map_points_of
        from ros_stereo_slam_tpu.utils import ply

        try:
            mcfg = preset_mapping().replace(camera=cam)
            # uint8 RGB staging (cast per frame inside the scan)
            rgb = np.repeat(
                np.clip(left_seq * 255.0, 0, 255).astype(np.uint8)[..., None],
                3, axis=-1)
            m_fps, m_ate, m_res, m_med = bench_odometry(
                args, mcfg, left_seq, right_seq, gt_poses, rgb_seq=rgb,
                tag="mapping",
            )
            del rgb
            pts, cols = map_points_of(m_res.keyframes)
            n_pts = ply.save_ply("/tmp/bench_map.ply", pts, cols)
            result.update({
                "mapping_fps": round(m_fps, 2),
                "mapping_fps_median": round(m_med, 2),
                "mapping_vs_baseline": round(m_fps / REFERENCE_CPU_FPS, 2),
                "mapping_ate_rmse_m": round(m_ate, 4),
                "map_points": int(n_pts),
            })
        except Exception as e:  # keep the headline row robust
            print(f"[bench] mapping row skipped: {e!r}", file=sys.stderr)
        try:
            bcfg = preset_ba().replace(camera=cam)
            b_fps, b_ate, _, b_med = bench_odometry(
                args, bcfg, left_seq, right_seq, gt_poses, tag="ba",
            )
            result.update({
                "ba_fps": round(b_fps, 2),
                "ba_fps_median": round(b_med, 2),
                "ba_vs_baseline": round(b_fps / REFERENCE_CPU_FPS, 2),
                "ba_ate_rmse_m": round(b_ate, 4),
                "ba_window": bcfg.ba.window,
                "ba_iters": bcfg.ba.iters,
            })
        except Exception as e:
            print(f"[bench] ba row skipped: {e!r}", file=sys.stderr)

    if args.preset == "ba":
        # Config 4: windowed Schur BA inside the per-frame step.
        bcfg = preset_ba().replace(camera=cam)
        fps, ate, _, fps_med = bench_odometry(
            args, bcfg, left_seq, right_seq, gt_poses, tag="ba",
        )
        result.update({
            "metric": "ba_frames_per_sec_per_chip",
            "value": round(fps, 2),
            "value_median": round(fps_med, 2),
            "vs_baseline": round(fps / REFERENCE_CPU_FPS, 2),
            "ate_rmse_m": round(ate, 4),
            "mode": "scan",
            "ba_window": bcfg.ba.window,
            "ba_iters": bcfg.ba.iters,
        })

    if args.preset in ("headline", "loop_closure"):
        (s_fps, s_ate, s_res, s_cfg, s_voc, s_online,
         s_med) = bench_full_slam(
            args, cam, left_seq, right_seq, gt_poses
        )
        slam_row = {
            "slam_fps": round(s_fps, 2),
            "slam_fps_median": round(s_med, 2),
            "slam_vs_baseline": round(s_fps / REFERENCE_CPU_FULL_FPS, 2),
            "slam_ate_rmse_m": round(s_ate, 4),
            "slam_loop_events": len(s_res.loop_events),
            "vocab_words": s_voc.n_words,
            "db_capacity": s_cfg.loop.db_capacity,
            "detect_every": s_cfg.loop.detect_every,
            **s_online,
        }
        if args.preset == "loop_closure":
            result.update({
                "metric": "slam_frames_per_sec_per_chip",
                "value": round(s_fps, 2),
                "vs_baseline": round(s_fps / REFERENCE_CPU_FULL_FPS, 2),
                "ate_rmse_m": round(s_ate, 4),
                "mode": "scan+epilogue",
            })
        result.update(slam_row)

    if args.preset == "headline" and args.world == "corridor":
        # Closures in the timed region: the jittered revisit full-SLAM
        # row (detection + verification + PGO + rewrite all inside the
        # measurement — the reference's only operating mode).
        try:
            result.update(bench_revisit_slam(args, cam))
        except Exception as e:
            print(f"[bench] revisit row skipped: {e!r}", file=sys.stderr)

    if args.preset in ("headline", "batched"):
        try:
            brow = bench_batched(args, cfg, left_seq, right_seq, gt_poses)
        except Exception as e:  # keep the headline row robust
            if args.preset == "batched":
                raise
            print(f"[bench] batched preset skipped: {e!r}", file=sys.stderr)
            brow = {}
        result.update(brow)
        if args.preset == "batched" and brow:
            result.update({
                "metric": "batched_frames_per_sec_per_chip",
                "value": brow["batched_fps_aggregate"],
                "vs_baseline": brow["batched_vs_baseline"],
                "ate_rmse_m": brow["batched_ate_rmse_m_worst_lane"],
                "mode": f"vmap x{brow['batched_lanes']} scan",
            })

    if (args.preset in ("headline", "streaming")) and not args.no_stream:
        result.update(
            bench_streaming(args, cfg, left_seq, right_seq, gt_poses)
        )
        if args.preset == "streaming":
            result.update({
                "metric": "stream_chunk32_frames_per_sec",
                "value": result["stream_chunk32_fps"],
                "vs_baseline": round(
                    result["stream_chunk32_fps"] / REFERENCE_CPU_FPS, 2),
                "mode": "chunked-stream",
            })

    print(json.dumps(result))


if __name__ == "__main__":
    main()
