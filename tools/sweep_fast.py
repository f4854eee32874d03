"""Accuracy-aware throughput sweep: fps AND ATE per config variant.

profile_scan.py attributes cost but ignores accuracy; this runs the same
scan-mode measurement and reports ATE RMSE next to each variant's fps so
speed/accuracy trades are decided on data (the 5x-baseline target also
caps ATE at the reference re-execution's 1.277 m — BASELINE.md).

Usage: python tools/sweep_fast.py [frames=192]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import preset_odometry
from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
from ros_stereo_slam_tpu.models.pipeline import run_offline
from ros_stereo_slam_tpu.utils import metrics

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 192

cfg0 = preset_odometry()
world = SyntheticWorld(camera=cfg0.camera, n_frames=N_FRAMES + 1, seed=11,
                       half_w=18.0)
frames = [world.render(i) for i in range(N_FRAMES + 1)]
L = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
R = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
L = jax.device_put(L); R = jax.device_put(R)
jax.block_until_ready((L, R))
gt = world.poses[: N_FRAMES + 1]


def run(cfg, label, reps=3):
    res = run_offline(cfg, L, R)  # compile+run
    dt = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run_offline(cfg, L, R)
        dt = min(dt, time.perf_counter() - t0)
    ate = metrics.ate_rmse(res.trajectory, gt)
    print(f"{label:46s}: {N_FRAMES/dt:7.2f} fps  {dt/N_FRAMES*1e3:6.2f} ms/f"
          f"  ATE {ate:7.4f} m", flush=True)
    return dt / N_FRAMES, ate


def fe(**kw):
    return dataclasses.replace(
        cfg0, frontend=dataclasses.replace(cfg0.frontend, **kw))


def pn(base=None, **kw):
    base = base or cfg0
    return dataclasses.replace(base, pnp=dataclasses.replace(base.pnp, **kw))


print(f"platform: {jax.devices()[0].platform}  frames: {N_FRAMES}",
      flush=True)
run(cfg0, "baseline")
VARIANTS = [
    (fe(lk_seeded_iters=6), "seeded iters 10 -> 6 (all walk)"),
    (fe(lk_seeded_walk_iters=3), "seeded walk 3 + polish 7"),
    (fe(lk_seeded_walk_iters=2), "seeded walk 2 + polish 8"),
    (fe(lk_seeded_iters=8, lk_seeded_walk_iters=3), "seeded 8 = walk 3 + polish 5"),
    (pn(iters=128), "pnp iters 256 -> 128"),
    (pn(refine_iters=4), "pnp refine 8 -> 4"),
    (pn(base=fe(lk_seeded_iters=8, lk_seeded_walk_iters=3),
        iters=128, refine_iters=4),
     "COMBO walk3+polish5, pnp 128/4"),
]
for cfg, label in VARIANTS:
    run(cfg, label)
run(cfg0, "baseline (re-measured)")
