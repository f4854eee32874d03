#!/usr/bin/env python
"""Run the SLAM pipeline on a KITTI odometry sequence.

The direct equivalent of the reference's main entry
(``/root/reference/src/VisualSLAM.cpp:217-237``), without its hardcoded
paths ("edit the cpp and recompile", reference README:27-32).

  python tools/run_kitti.py --root /data/kitti --seq 00 \
      --preset loop_closure --vocab vocab_00.npz --frames 4500
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None, help="KITTI odometry root")
    ap.add_argument("--seq", default="00")
    ap.add_argument("--preset", default="odometry",
                    choices=["odometry", "mapping", "loop_closure", "ba"])
    ap.add_argument("--vocab", default=None, help="vocabulary .npz (required for loop_closure)")
    ap.add_argument("--frames", type=int, default=4500)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--mode", default="stream",
                    choices=["stream", "chunked"],
                    help="stream = per-frame dispatch (models/slam.py); "
                    "chunked = 32-frame micro-batch scans with per-chunk "
                    "PGO correction (models/slam_chunked.py; requires "
                    "--preset loop_closure + --vocab)")
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ros_stereo_slam_tpu.config import PRESETS
    from ros_stereo_slam_tpu.data import kitti
    from ros_stereo_slam_tpu.models import vocab as vocab_mod
    from ros_stereo_slam_tpu.models.slam import StereoSLAM
    from ros_stereo_slam_tpu.utils.outputs import RunOutputs
    from ros_stereo_slam_tpu.utils.profiling import FpsMeter, StageTimer

    root = args.root or kitti.find_kitti_root()
    if root is None:
        print("ERROR: no KITTI dataset found (set --root or KITTI_ROOT)",
              file=sys.stderr)
        sys.exit(2)
    seq = kitti.KittiSequence(root, args.seq)
    if not seq.available:
        print(f"ERROR: sequence {args.seq} not found under {root}", file=sys.stderr)
        sys.exit(2)
    n = min(len(seq), args.frames)
    cfg = PRESETS[args.preset]().replace(camera=seq.camera)
    vocab = vocab_mod.Vocabulary.load(args.vocab) if args.vocab else None
    if cfg.loop.enabled and vocab is None:
        print("ERROR: --vocab required for loop_closure preset "
              "(build one with tools/build_vocab.py)", file=sys.stderr)
        sys.exit(2)

    out = RunOutputs(args.out or f"runs/kitti_{args.seq}_{args.preset}")
    timer = StageTimer()
    fps = FpsMeter()

    if args.mode == "chunked":
        if vocab is None:
            print("ERROR: --mode chunked needs --preset loop_closure + "
                  "--vocab (in-scan detection requires a vocabulary)",
                  file=sys.stderr)
            sys.exit(2)
        import numpy as np

        from ros_stereo_slam_tpu.models.slam_chunked import ChunkedSLAM

        slam = ChunkedSLAM(cfg, vocab)
        with timer.stage("initialize"):
            l0, r0 = seq.frame(0)
            rgb0 = seq.frame_rgb(0) if seq.rgb_available else None
            slam.initialize(l0, r0, rgb0=rgb0)
        C = args.chunk
        for s in range(1, n, C):
            e = min(s + C, n)
            with timer.stage("io"):
                fr = [seq.frame(i) for i in range(s, e)]
                lefts = np.stack([f[0] for f in fr])
                rights = np.stack([f[1] for f in fr])
                rg = (np.stack([seq.frame_rgb(i) for i in range(s, e)])
                      if seq.rgb_available else None)
            with timer.stage("chunk"):
                info = slam.process_chunk(
                    lefts, rights, rgbs=rg,
                    query_frames=lambda fid: seq.frame(fid),
                )
            if (s - 1) // C % 4 == 0:
                print(f"[kitti] {e}/{n} "
                      f"inl_med={int(np.median(info.n_inliers))} "
                      f"accepted={info.n_accepted}")
        for q, m, n_inl in slam.loop_events:
            print(f"[kitti] LOOP {q} -> {m} ({n_inl} inliers)")
    else:
        slam = StereoSLAM(cfg, vocab=vocab)
        with timer.stage("initialize"):
            l0, r0 = seq.frame(0)
            rgb0 = seq.frame_rgb(0) if seq.rgb_available else None
            info = slam.initialize(l0, r0, left_rgb=rgb0)
        out.log_frame(info)
        for i in range(1, n):
            with timer.stage("io"):
                left, right = seq.frame(i)
                rgb = seq.frame_rgb(i) if seq.rgb_available else None
            with timer.stage("frame"):
                info = slam.process_frame(left, right, left_rgb=rgb)
            out.log_frame(info, {"fps": round(fps.tick(), 2)})
            if i % 100 == 0:
                print(f"[kitti] {i}/{n} fps={fps.fps:.1f} "
                      f"inl={info.n_inliers}")
        for ev in slam.loop_events:
            print(f"[kitti] LOOP {ev.query} -> {ev.match} "
                  f"({ev.n_inliers} inliers)")

    summary = out.finalize(slam, gt_poses=seq.gt_poses())
    timer.dump(os.path.join(out.out_dir, "stages.json"))
    print(f"[kitti] summary: {summary}")


if __name__ == "__main__":
    main()
