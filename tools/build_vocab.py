#!/usr/bin/env python
"""Offline ORB vocabulary builder (reference C10 — the `BoWtest` tool,
``/root/reference/src/bagOfWordsDetector.cpp:109-135``).

Extracts ORB descriptors from every Nth image of a sequence (KITTI or
synthetic), trains the hierarchical binary vocabulary, and saves it as
``.npz`` for tools/run_kitti.py.

  python tools/build_vocab.py --root /data/kitti --seq 00 --out vocab_00.npz
  python tools/build_vocab.py --synthetic --frames 64 --out vocab_syn.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None)
    ap.add_argument("--seq", default="00")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--k", type=int, default=9, help="branching (reference: 9)")
    ap.add_argument("--levels", type=int, default=6,
                    help="depth (reference: 6 = 531,441 words; the sparse "
                         "BoW database scores any size in O(features))")
    ap.add_argument("--orb_levels", type=int, default=None,
                    help="ORB pyramid octaves; defaults to "
                         "LoopClosureConfig.orb_levels so vocabulary "
                         "training sees the SAME descriptor distribution "
                         "the detector extracts at query time")
    ap.add_argument("--features", type=int, default=512)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from ros_stereo_slam_tpu.config import LoopClosureConfig
    from ros_stereo_slam_tpu.data import kitti
    from ros_stereo_slam_tpu.data.synthetic import small_world
    from ros_stereo_slam_tpu.models import vocab as vocab_mod
    from ros_stereo_slam_tpu.ops import orb

    if args.orb_levels is None:
        args.orb_levels = LoopClosureConfig().orb_levels

    if args.synthetic:
        world = small_world(n_frames=args.frames, seed=3)
        def frame(i):
            return world.render(i)[0]
        n = args.frames
    else:
        root = args.root or kitti.find_kitti_root()
        if root is None:
            print("ERROR: no KITTI root", file=sys.stderr)
            sys.exit(2)
        seq = kitti.KittiSequence(root, args.seq)
        def frame(i):
            return seq.frame(i)[0]
        n = min(len(seq), args.frames)

    descs, docs = [], []
    for i in range(0, n, args.stride):
        f = orb.detect_and_compute(jnp.asarray(frame(i)), args.features,
                                   n_levels=args.orb_levels)
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc_sign)[v])
        docs.append(np.full(int(v.sum()), i))
        if i % 40 == 0:
            print(f"[vocab] {i}/{n} ({sum(len(d) for d in descs)} descriptors)")
    X = np.concatenate(descs)
    print(f"[vocab] training k={args.k} L={args.levels} on {len(X)} descriptors...")
    trainer = (
        vocab_mod.train_batched if args.k ** args.levels > 4096
        else vocab_mod.train
    )
    voc = trainer(X, k=args.k, levels=args.levels,
                  doc_ids=np.concatenate(docs))
    voc.save(args.out)
    print(f"[vocab] saved {voc.n_words}-word vocabulary to {args.out}")


if __name__ == "__main__":
    main()
