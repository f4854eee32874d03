#!/usr/bin/env python
"""Run a SLAM preset over the synthetic ground-truth world.

The synthetic analog of the reference's ``rosrun fusion SLAM``
(``/root/reference/src/VisualSLAM.cpp:217-237``), with proper outputs:
trajectory (KITTI + CSV + PNG), map.ply, poseGraph.g2o, metrics.jsonl,
ATE/RPE summary.

Examples:
  python tools/run_synthetic.py --preset odometry --frames 32
  python tools/run_synthetic.py --preset loop_closure --orbit --frames 80
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="odometry",
                    choices=["odometry", "mapping", "loop_closure", "ba"])
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--orbit", action="store_true",
                    help="closed circular trajectory (enables loop closure)")
    ap.add_argument("--out", default="runs/synthetic")
    ap.add_argument("--scale", type=int, default=2, help="resolution divisor")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--mode", default="stream",
                    choices=["stream", "chunked", "scan"],
                    help="stream = per-frame dispatch (models/slam.py); "
                    "chunked = 16-frame micro-batch scans with per-chunk "
                    "PGO correction (models/slam_chunked.py; requires a "
                    "loop-closure preset); scan = whole-sequence "
                    "single-dispatch offline posture (the throughput "
                    "headline), correction deferred to the epilogue")
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from ros_stereo_slam_tpu.config import PRESETS
    from ros_stereo_slam_tpu.data.synthetic import loop_trajectory, small_world
    from ros_stereo_slam_tpu.models import vocab as vocab_mod
    from ros_stereo_slam_tpu.models.slam import StereoSLAM
    from ros_stereo_slam_tpu.ops import orb
    from ros_stereo_slam_tpu.utils.outputs import RunOutputs
    from ros_stereo_slam_tpu.utils.profiling import FpsMeter, StageTimer

    import dataclasses

    poses = loop_trajectory(args.frames) if args.orbit else None
    world = small_world(n_frames=args.frames, seed=args.seed, scale=args.scale,
                        custom_poses=poses)
    if args.orbit:
        world.half_w = 10.0
    cfg = PRESETS[args.preset]().replace(camera=world.camera)
    # Scale sampling density and triggers with resolution (the defaults
    # target full KITTI 1241x376).
    cfg = cfg.replace(
        frontend=dataclasses.replace(
            cfg.frontend, grid_step=max(8, cfg.frontend.grid_step // args.scale)
        ),
        keyframes=dataclasses.replace(
            cfg.keyframes, min_pnp_inliers=cfg.keyframes.min_pnp_inliers // args.scale
        ),
    )
    if cfg.loop.enabled:
        # The reference's acceptance gates target 4,500-frame KITTI runs
        # (query-match > 100, cooldown 100, skip 20 recent); scale them to
        # the demo's sequence length so a short orbit can actually close.
        cfg = cfg.replace(
            loop=dataclasses.replace(
                cfg.loop,
                dislocal=min(cfg.loop.dislocal, max(4, args.frames // 8)),
                min_separation=min(cfg.loop.min_separation, args.frames // 2),
                cooldown=min(cfg.loop.cooldown, args.frames // 4),
            )
        )

    print(f"[run] rendering {world.n_frames} frames...")
    frames = [world.render(i)[:2] for i in range(world.n_frames)]
    # RGB source for map colors when exporting a map (config 2 — the
    # reference ships RGB maps; getColors, monoUtils.h:180-193)
    rgbs = (
        [world.render_rgb(i) for i in range(world.n_frames)]
        if cfg.export_map else [None] * world.n_frames
    )

    vocab = None
    if cfg.loop.enabled:
        import jax.numpy as jnp

        print("[run] training vocabulary from sequence frames...")
        descs, docs = [], []
        for i in range(0, world.n_frames, 4):
            f = orb.detect_and_compute(jnp.asarray(frames[i][0]),
                                       cfg.loop.orb_features,
                                       n_levels=cfg.loop.orb_levels)
            v = np.asarray(f.valid)
            descs.append(np.asarray(f.desc_sign)[v])
            docs.append(np.full(int(v.sum()), i))
        # 8^3 = 512 words: enough leaves that unrelated frames stop
        # saturating the L1 scores (a 64-word tree scores everything ~0.8
        # on the self-similar synthetic texture, drowning true revisits).
        vocab = vocab_mod.train(
            np.concatenate(descs), k=8, levels=3, doc_ids=np.concatenate(docs)
        )

    out = RunOutputs(args.out)
    timer = StageTimer()
    fps = FpsMeter()

    if args.mode == "scan":
        from ros_stereo_slam_tpu.utils.outputs import ScanRun

        lefts = np.stack([f[0] for f in frames])
        rights = np.stack([f[1] for f in frames])
        rgb = (np.stack(rgbs) if rgbs[0] is not None else None)
        with timer.stage("scan"):
            if cfg.loop.enabled:
                from ros_stereo_slam_tpu.models.slam_scan import (
                    run_offline_slam,
                )

                res = run_offline_slam(cfg, vocab, lefts, rights,
                                       rgb_seq=rgb)
            else:
                from ros_stereo_slam_tpu.models.pipeline import run_offline

                res = run_offline(cfg, lefts, rights, rgb_seq=rgb)
        slam = ScanRun(res, cfg)
        for info in slam.frame_infos():
            out.log_frame(info)
        for q, m, n_inl in slam.loop_events:
            print(f"[run] LOOP {q} -> {m} ({n_inl} inliers)")
    elif args.mode == "chunked":
        if vocab is None:
            print("ERROR: --mode chunked needs a loop-closure preset "
                  "(in-scan detection requires a vocabulary)",
                  file=sys.stderr)
            sys.exit(2)
        from ros_stereo_slam_tpu.models.slam_chunked import ChunkedSLAM

        from ros_stereo_slam_tpu.models.pipeline import FrameInfo

        slam = ChunkedSLAM(cfg, vocab)
        with timer.stage("initialize"):
            slam.initialize(frames[0][0], frames[0][1], rgb0=rgbs[0])
        out.log_frame(FrameInfo(
            frame=0, T_wc=np.eye(4, dtype=np.float32), n_tracked=0,
            n_inliers=0, is_keyframe=True, tracking_ok=True,
            used_retry=False,
        ))
        C = args.chunk
        for s in range(1, world.n_frames, C):
            e = min(s + C, world.n_frames)
            lefts = np.stack([frames[i][0] for i in range(s, e)])
            rights = np.stack([frames[i][1] for i in range(s, e)])
            rg = (np.stack([rgbs[i] for i in range(s, e)])
                  if rgbs[0] is not None else None)
            with timer.stage("chunk"):
                info = slam.process_chunk(
                    lefts, rights, rgbs=rg,
                    query_frames=lambda fid: frames[fid][:2],
                )
            for k2 in range(e - s):
                out.log_frame(FrameInfo(
                    frame=s + k2, T_wc=info.T_wc[k2],
                    n_tracked=int(info.n_tracked[k2]),
                    n_inliers=int(info.n_inliers[k2]),
                    is_keyframe=bool(info.is_keyframe[k2]),
                    tracking_ok=bool(info.tracking_ok[k2]),
                    used_retry=False,
                ))
            print(f"[run] chunk {s}..{e - 1}: "
                  f"inl_med={int(np.median(info.n_inliers))} "
                  f"kf={int(info.is_keyframe.sum())} "
                  f"accepted={info.n_accepted} corrected={info.corrected}")
        for q, m, n_inl in slam.loop_events:
            print(f"[run] LOOP {q} -> {m} ({n_inl} inliers)")
    else:
        slam = StereoSLAM(cfg, vocab=vocab)
        with timer.stage("initialize"):
            info = slam.initialize(*frames[0], left_rgb=rgbs[0])
        out.log_frame(info)
        for i in range(1, world.n_frames):
            with timer.stage("frame"):
                info = slam.process_frame(*frames[i], left_rgb=rgbs[i])
            out.log_frame(info, {"fps": round(fps.tick(), 2)})
            if info.is_keyframe or not info.tracking_ok:
                print(f"[run] f{info.frame}: inl={info.n_inliers} "
                      f"kf={info.is_keyframe} ok={info.tracking_ok}")
        for ev in slam.loop_events:
            print(f"[run] LOOP {ev.query} -> {ev.match} "
                  f"({ev.n_inliers} inliers)")

    summary = out.finalize(slam, gt_poses=world.poses)
    timer.dump(os.path.join(args.out, "stages.json"))
    print(f"[run] summary: {summary}")


if __name__ == "__main__":
    main()
