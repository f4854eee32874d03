#!/usr/bin/env python
"""Benchmark harness: odometry frames/sec/chip on a KITTI-scale sequence.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Two modes (compute is the headline — the whole sequence runs as a single
``lax.scan`` XLA program on device, the TPU-native execution model):
- scan    (default): stacked frames pre-staged in HBM, one dispatch.
- stream: one fused dispatch per frame incl. host transfer overheads.

Baseline: the reference C++ pipeline publishes no numbers (BASELINE.md),
so the baseline is SELF-MEASURED: ``tools/reference_baseline.py``
re-executes the reference's exact per-frame OpenCV pipeline (same calls,
same parameters, no loop-closure/viz/ROS overhead) on the same synthetic
frames — 50.7 fps / ATE 0.692 m at 192 frames on this image's CPU
(OpenCV 5.0).  vs_baseline = our_fps / 50.7.  For context, the author's
full loop (with per-frame ORB+DBoW2, PCL SOR, imshow, ROS publish,
Pangolin) displayed ~10 fps on a desktop CPU and the Python prototype was
throttled to 5 Hz (SURVEY.md §6) — vs_author_loop reports against that.

Usage: python bench.py [--frames N] [--platform cpu] [--mode scan|stream]
"""

from __future__ import annotations

import argparse
import json
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=384, help="timed frames")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--mode", choices=["scan", "stream"], default="scan")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions; best is reported (the dev "
                    "TPU tunnel adds ±20%% run-to-run noise)")
    ap.add_argument("--preset", choices=["odometry", "loop_closure"],
                    default="odometry",
                    help="loop_closure adds per-frame on-device ORB + BoW "
                    "database scoring inside the scan (config 3) plus the "
                    "host gate/PGO epilogue to the timed region")
    ap.add_argument("--world", choices=["corridor", "revisit"],
                    default="corridor",
                    help="corridor (headline; no revisits, measures "
                    "full-SLAM overhead honestly) or revisit (2-lap "
                    "circle: the loop_closure preset detects + closes "
                    "real loops inside the timed region)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from ros_stereo_slam_tpu.config import CameraConfig, preset_odometry
    from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
    from ros_stereo_slam_tpu.models.pipeline import StereoOdometry, run_offline
    from ros_stereo_slam_tpu.utils import metrics

    n_total = args.frames + 1
    cam = CameraConfig()  # full KITTI geometry: 1241x376
    if args.world == "revisit":
        # Two laps of a circle (x-z plane, tangential heading): lap 2
        # revisits every pose of lap 1, so the loop_closure preset
        # detects and closes real loops inside the timed region.  Only
        # the lap's unique frames render; the stack tiles (the device
        # still processes every frame individually).
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
        idx = np.arange(n_total) % lap
        left_seq = np.stack(lefts)[idx]
        right_seq = np.stack(rights)[idx]
        gt_poses = lap_poses[idx]
    else:
        # Wider corridor (half_w): the trajectory's accumulated yaw (~26
        # deg by frame 96) otherwise walks the camera into the +/-7 m side
        # wall, which collapses scene depth and degrades tracking late in
        # the sequence.
        world = SyntheticWorld(
            camera=cam, n_frames=n_total, seed=11, half_w=18.0)
        print(f"[bench] rendering {n_total} synthetic frames at "
              f"{cam.width}x{cam.height}...", file=sys.stderr)
        lefts, rights = [], []
        for i in range(n_total):
            l, r, _ = world.render(i)
            lefts.append(l)
            rights.append(r)
        left_seq = np.stack(lefts)
        right_seq = np.stack(rights)
        gt_poses = world.poses

    cfg = preset_odometry().replace(camera=cam)
    platform = jax.devices()[0].platform
    print(f"[bench] mode={args.mode} platform={platform}", file=sys.stderr)

    if args.preset == "loop_closure":
        # Config 3: odometry + on-device loop detection in the SAME scan +
        # host gate/PGO epilogue (models/slam_scan.py).  The corridor has
        # no revisits, so this measures full-SLAM detection overhead.
        import dataclasses

        import jax.numpy as jnp

        from ros_stereo_slam_tpu.config import (
            LoopClosureConfig, preset_loop_closure,
        )
        from ros_stereo_slam_tpu.models import vocab as vocab_mod
        from ros_stereo_slam_tpu.models.slam_scan import run_offline_slam
        from ros_stereo_slam_tpu.ops import orb

        # Reference scale: k=9, L=6 = 531,441 words and a 4,096-frame
        # database (the reference trains k=9 L=6 vocabularies,
        # bagOfWordsDetector.cpp:21, and allocates 4,000 db entries,
        # visualSLAM.h:137).  The sparse BoW database makes this ~100 MB
        # of device state; a dense (capacity, n_words) matrix would be
        # ~8.7 GB.
        cfg = preset_loop_closure().replace(
            camera=cam,
            loop=dataclasses.replace(LoopClosureConfig(), db_capacity=4096),
        )
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
        # Pre-stage frames in HBM (same rule as the odometry mode: the
        # timed region measures compute, not the dev-tunnel PCIe stand-in).
        left_dev = jax.device_put(jnp.asarray(left_seq, jnp.float32))
        right_dev = jax.device_put(jnp.asarray(right_seq, jnp.float32))
        jax.block_until_ready((left_dev, right_dev))
        print("[bench] compile + first run...", file=sys.stderr)
        res = run_offline_slam(cfg, voc, left_dev, right_dev)
        print("[bench] timed runs...", file=sys.stderr)
        dt = float("inf")
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            res = run_offline_slam(cfg, voc, left_dev, right_dev)
            dt = min(dt, time.perf_counter() - t0)
        fps = args.frames / dt
        ate = metrics.ate_rmse(
            res.trajectory, gt_poses[: res.trajectory.shape[0]]
        )
        print(json.dumps({
            "metric": "slam_frames_per_sec_per_chip",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / REFERENCE_CPU_FULL_FPS, 2),
            "baseline_cpu_full_fps": REFERENCE_CPU_FULL_FPS,
            "ate_rmse_m": round(float(ate), 4),
            "loop_events": len(res.loop_events),
            "frames": args.frames,
            "mode": "scan+epilogue",
            "preset": "loop_closure",
            "world": args.world,
            "vocab_words": voc.n_words,
            "db_capacity": cfg.loop.db_capacity,
            "detect_every": cfg.loop.detect_every,
            "platform": platform,
        }))
        return

    if args.mode == "scan":
        import jax.numpy as jnp

        # Pre-stage frames in HBM: the timed region measures compute, not
        # the dev-tunnel PCIe stand-in (production hosts stream via real
        # PCIe and overlap transfers with compute).
        left_dev = jax.device_put(jnp.asarray(left_seq, jnp.float32))
        right_dev = jax.device_put(jnp.asarray(right_seq, jnp.float32))
        jax.block_until_ready((left_dev, right_dev))
        print("[bench] compile + first run...", file=sys.stderr)
        res = run_offline(cfg, left_dev, right_dev)
        print("[bench] timed runs...", file=sys.stderr)
        dt = float("inf")
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            res = run_offline(cfg, left_dev, right_dev)
            dt = min(dt, time.perf_counter() - t0)
    else:
        slam = StereoOdometry(cfg)
        slam.initialize(left_seq[0], right_seq[0])
        slam.process_frame(left_seq[1], right_seq[1])  # compile
        slam2 = StereoOdometry(cfg)
        slam2.initialize(left_seq[0], right_seq[0])
        t0 = time.perf_counter()
        for i in range(1, n_total):
            slam2.process_frame(left_seq[i], right_seq[i])
        dt = time.perf_counter() - t0

        class _R:  # adapt for metrics below
            trajectory = slam2.trajectory_array()
            tracking_ok = np.asarray([True])
        res = _R()

    fps = args.frames / dt
    ate = metrics.ate_rmse(res.trajectory, gt_poses[: res.trajectory.shape[0]])

    # Online-SLAM posture: per-frame dispatch incl. host->device transfer
    # of each frame (the number an online robot sees, vs scan's offline
    # mapping posture).  Measured over a short prefix — per-frame cost is
    # flat after warmup, and this keeps the added bench time bounded.
    stream_fps = None
    if args.mode == "scan":
        n_stream = min(96, args.frames)
        slam = StereoOdometry(cfg)
        slam.initialize(left_seq[0], right_seq[0])
        slam.process_frame(left_seq[1], right_seq[1])  # compile
        slam2 = StereoOdometry(cfg)
        slam2.initialize(left_seq[0], right_seq[0])
        t0 = time.perf_counter()
        for i in range(1, n_stream + 1):
            slam2.process_frame(left_seq[i], right_seq[i])
        stream_fps = n_stream / (time.perf_counter() - t0)

    # Chunked online posture: C-frame micro-batches dispatched
    # back-to-back through ONE compiled C-frame scan, carry threaded
    # across chunks — the fixed-latency streaming mode a production
    # robot runs (C frames of latency; per-dispatch overhead amortizes
    # C-fold).  Timed INCLUDING each chunk's host->device transfer.
    chunk = 32
    chunk_fps = None
    if args.mode == "scan" and args.frames >= 2 * chunk:
        import jax.numpy as jnp

        from ros_stereo_slam_tpu.models import step as step_mod
        from ros_stereo_slam_tpu.models.pipeline import _grid_for

        grid_pts, grid_mask = _grid_for(cfg)
        carry0 = step_mod.init_carry(
            jnp.asarray(left_seq[0], jnp.float32),
            jnp.asarray(right_seq[0], jnp.float32),
            grid_pts, grid_mask, jax.random.PRNGKey(cfg.seed), cfg,
        )
        n_chunks = (n_total - 1) // chunk

        def run_chunk(c, k):
            lc = jnp.asarray(
                left_seq[1 + k * chunk : 1 + (k + 1) * chunk], jnp.float32)
            rc = jnp.asarray(
                right_seq[1 + k * chunk : 1 + (k + 1) * chunk], jnp.float32)
            return step_mod.run_sequence(lc, rc, c, grid_pts, grid_mask, cfg)

        c, st = run_chunk(carry0, 0)  # compile the C-frame program
        np.asarray(st.T_wc)
        t0 = time.perf_counter()
        c = carry0
        for k in range(n_chunks):
            c, st = run_chunk(c, k)
        np.asarray(st.T_wc)  # forced D2H sync of the last chunk
        chunk_fps = n_chunks * chunk / (time.perf_counter() - t0)

    result = {
        "metric": "odometry_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_CPU_FPS, 2),
        "ate_rmse_m": round(ate, 4),
        "baseline_cpu_fps": REFERENCE_CPU_FPS,
        "baseline_cpu_ate_m": REFERENCE_CPU_ATE_M,
        "vs_author_loop": round(fps / AUTHOR_LOOP_FPS, 2),
        "frames": args.frames,
        "mode": args.mode,
        "stream_fps": None if stream_fps is None else round(stream_fps, 2),
        "stream_chunk32_fps": (
            None if chunk_fps is None else round(chunk_fps, 2)
        ),
        "world": args.world,
        "resolution": f"{cam.width}x{cam.height}",
        "platform": platform,
        "n_devices": len(jax.devices()),
        "baseline_note": (
            "baseline = measured re-execution of the reference's OpenCV "
            "pipeline on identical frames (tools/reference_baseline.py); "
            "the author's full loop displayed ~10 fps (SURVEY.md §6)"
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
