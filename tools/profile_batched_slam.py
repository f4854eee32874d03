"""A/B the batched full-SLAM detection cadence: interleaved vs lockstep.

Round-3 finding: 2-lane batched full SLAM (all lanes detecting together
every ``detect_every`` frames) delivered LESS aggregate throughput than
single-lane (230 vs 272 fps).  The interleaved cadence phase-shifts each
lane across the stride so at most ceil(B/every) lanes detect per frame
(models/slam_scan.run_sequence_slam_batched).  This tool measures both
modes plus the single-lane reference on the bench corridor world.

Usage: python tools/profile_batched_slam.py [frames] [lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 384
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2

import bench  # noqa: E402  (repo-root bench harness: world + vocab cache)
from ros_stereo_slam_tpu.config import CameraConfig  # noqa: E402
from ros_stereo_slam_tpu.models.slam_scan import (  # noqa: E402
    run_offline_slam, run_offline_slam_batched,
)
from ros_stereo_slam_tpu.utils import metrics  # noqa: E402


class A:
    frames = N
    world = "corridor"
    jitter = False
    detect_every = None
    reps = 3


args = A()
from ros_stereo_slam_tpu.config import LoopClosureConfig  # noqa: E402

args.detect_every = LoopClosureConfig().detect_every
cam = CameraConfig()
left, right, gt = bench._render_world(args, cam)
cfg = bench._slam_cfg(args, cam)
voc = bench._trained_vocab(cfg, left)

per = (N - 1) // B
starts = [b * per for b in range(B)]
lanes_l = jax.device_put(jnp.asarray(
    np.stack([left[s:s + per + 1] for s in starts]), jnp.float32))
lanes_r = jax.device_put(jnp.asarray(
    np.stack([right[s:s + per + 1] for s in starts]), jnp.float32))
L1 = jax.device_put(jnp.asarray(left, jnp.float32))
R1 = jax.device_put(jnp.asarray(right, jnp.float32))
jax.block_until_ready((lanes_l, lanes_r, L1, R1))


def timeit(label, fn, frames):
    fn()
    dt = np.inf
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = fn()
        dt = min(dt, time.perf_counter() - t0)
    print(f"{label:28s}: {frames/dt:8.2f} fps aggregate "
          f"({dt*1e3/frames:6.3f} ms/frame)")
    return out


res1 = timeit("single-lane", lambda: run_offline_slam(cfg, voc, L1, R1),
              N - 1)
print("  single ATE:",
      round(float(metrics.ate_rmse(
          res1.trajectory, gt[: res1.trajectory.shape[0]])), 4))
for mode, ilv in (("lockstep", False), ("interleaved", True)):
    res = timeit(
        f"batched x{B} {mode}",
        lambda ilv=ilv: run_offline_slam_batched(
            cfg, voc, lanes_l, lanes_r, interleave=ilv),
        B * per,
    )
    ates = [
        round(float(metrics.ate_rmse(
            r.trajectory, gt[s:s + per + 1][: r.trajectory.shape[0]])), 4)
        for r, s in zip(res, starts)
    ]
    print(f"  per-lane ATE: {ates}")
