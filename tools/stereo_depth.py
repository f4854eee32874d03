#!/usr/bin/env python
"""Standalone dense-disparity node (reference C18 — the `stereo` exe,
``/root/reference/src/StereoCV.cpp:252-273``): SGBM disparity -> depth
cloud -> SOR -> PLY + disparity PNGs per frame.

  python tools/stereo_depth.py --synthetic --frames 8 --out runs/stereo
  python tools/stereo_depth.py --root /data/kitti --seq 00 --frames 100
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
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--max-disp", type=int, default=96)
    ap.add_argument("--out", default="runs/stereo")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from ros_stereo_slam_tpu.config import CameraConfig
    from ros_stereo_slam_tpu.data import kitti
    from ros_stereo_slam_tpu.data.synthetic import small_world
    from ros_stereo_slam_tpu.ops import sgbm, sor
    from ros_stereo_slam_tpu.utils import ply
    from ros_stereo_slam_tpu.utils.camera import Pinhole
    from ros_stereo_slam_tpu.viz import draw

    if args.synthetic:
        world = small_world(n_frames=args.frames, seed=5)
        camc = world.camera
        def pair(i):
            L, R, _ = world.render(i)
            return L, R
        n = args.frames
    else:
        root = args.root or kitti.find_kitti_root()
        if root is None:
            print("ERROR: no KITTI root", file=sys.stderr)
            sys.exit(2)
        seq = kitti.KittiSequence(root, args.seq)
        camc = seq.camera
        pair = seq.frame
        n = min(len(seq), args.frames)

    cam = Pinhole(fx=jnp.float32(camc.fx), fy=jnp.float32(camc.fy),
                  cx=jnp.float32(camc.cx), cy=jnp.float32(camc.cy))
    os.makedirs(args.out, exist_ok=True)
    all_pts = []
    for i in range(n):
        L, R = pair(i)
        res = sgbm.sgbm(jnp.asarray(L), jnp.asarray(R), max_disp=args.max_disp)
        draw.draw_disparity(np.asarray(res.disparity),
                            os.path.join(args.out, f"disp_{i:04d}.png"),
                            max_disp=args.max_disp)
        pts, ok = sgbm.disparity_to_cloud(cam, camc.baseline, res.disparity,
                                          res.valid)
        pts_np = np.asarray(pts)[np.asarray(ok)]
        # subsample + SOR (reference: meanK=20, 0.8, StereoCV.cpp:288)
        if len(pts_np) > 4096:
            sel = np.linspace(0, len(pts_np) - 1, 4096).astype(int)
            pts_np = pts_np[sel]
        keep = np.asarray(
            sor.sor_filter(jnp.asarray(pts_np), jnp.ones(len(pts_np), bool),
                           mean_k=20, std_mul=0.8)
        )
        all_pts.append(pts_np[keep])
        print(f"[stereo] frame {i}: {keep.sum()} cloud points")
    cloud = np.concatenate(all_pts)
    n_out = ply.save_ply(os.path.join(args.out, "StereoCloud.ply"), cloud)
    print(f"[stereo] wrote {n_out} points to {args.out}/StereoCloud.ply")


if __name__ == "__main__":
    main()
