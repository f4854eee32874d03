#!/usr/bin/env python
"""Ablation: batched full-SLAM aggregate fps vs batch_align_window.

Measures the shared-keyframe-cadence fix for the batched full-SLAM
regression (RESULTS.md "Batched FULL SLAM" section): 2 lanes of
odometry + in-scan detection through run_offline_slam_batched, with the
keyframe branch fired on any-lane triggers (window=1, exact single-lane
semantics) vs snapped to a shared even-frame cadence (window=2).
Also runs the single-lane scan on the same frames for the break-even
comparison.  Prints one JSON line.

Usage: python tools/profile_kf_align.py [--frames 384] [--reps 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--windows", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()
    args.world = "corridor"
    args.jitter = False
    args.detect_every = None

    import bench as bench_mod
    from ros_stereo_slam_tpu.config import CameraConfig, LoopClosureConfig

    if args.detect_every is None:
        args.detect_every = LoopClosureConfig().detect_every
    cam = CameraConfig()
    left_seq, right_seq, gt_poses = bench_mod._render_world(args, cam)
    cfg = bench_mod._slam_cfg(args, cam)
    voc = bench_mod._trained_vocab(cfg, left_seq)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ros_stereo_slam_tpu.models.slam_scan import (
        run_offline_slam, run_offline_slam_batched,
    )
    from ros_stereo_slam_tpu.utils import metrics

    out = {"frames": args.frames, "reps": args.reps}

    ld = jax.device_put(jnp.asarray(left_seq, jnp.float32))
    rd = jax.device_put(jnp.asarray(right_seq, jnp.float32))
    jax.block_until_ready((ld, rd))
    print("[align] single-lane compile+run...", file=sys.stderr)
    run_offline_slam(cfg, voc, ld, rd)
    res, dt, med = bench_mod._time_stats(
        lambda: run_offline_slam(cfg, voc, ld, rd), args.reps)
    out["single_fps"] = round(args.frames / dt, 2)
    out["single_fps_median"] = round(args.frames / med, 2)

    B = 2
    n_total = left_seq.shape[0]
    per = (n_total - 1) // B
    lanes_l = jax.device_put(jnp.asarray(
        np.stack([left_seq[s:s + per + 1] for s in (0, per)]), jnp.float32))
    lanes_r = jax.device_put(jnp.asarray(
        np.stack([right_seq[s:s + per + 1] for s in (0, per)]), jnp.float32))
    jax.block_until_ready((lanes_l, lanes_r))

    for W in args.windows:
        wcfg = cfg.replace(
            keyframes=dataclasses.replace(cfg.keyframes,
                                          batch_align_window=W))
        print(f"[align] batched x{B} window={W} compile+run...",
              file=sys.stderr)
        run_offline_slam_batched(wcfg, voc, lanes_l, lanes_r)
        bres, bdt, bmed = bench_mod._time_stats(
            lambda wcfg=wcfg: run_offline_slam_batched(
                wcfg, voc, lanes_l, lanes_r),
            args.reps)
        ates = [
            float(metrics.ate_rmse(
                r.trajectory,
                gt_poses[s:s + per + 1][: r.trajectory.shape[0]]))
            for r, s in zip(bres, (0, per))
        ]
        out[f"batched_w{W}_fps_aggregate"] = round(B * per / bdt, 2)
        out[f"batched_w{W}_fps_aggregate_median"] = round(B * per / bmed, 2)
        out[f"batched_w{W}_ate_worst"] = round(max(ates), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
