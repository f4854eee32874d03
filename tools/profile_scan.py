"""Scan-mode ablation profiler: attribute on-device frame cost by knob.

Host-side per-stage timing is useless over the dev TPU tunnel (round-trip
latency ~40 ms swamps compute), so cost attribution runs the WHOLE
sequence as one scan program per config variant and differences the
frames/s.  Each variant's delta vs baseline estimates that stage's
on-device share.
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

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 32

cfg0 = preset_odometry()
world = SyntheticWorld(camera=cfg0.camera, n_frames=N_FRAMES + 1, seed=11,
                       half_w=18.0)
frames = [world.render(i) for i in range(N_FRAMES + 1)]
L = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
R = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
L = jax.device_put(L); R = jax.device_put(R)
jax.block_until_ready((L, R))


def fps_of(cfg, label, reps=3):
    run_offline(cfg, L, R)  # compile+run (run_offline np-converts)
    dt = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run_offline(cfg, L, R)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{label:40s}: {N_FRAMES/dt:7.2f} fps   {dt/N_FRAMES*1e3:7.2f} ms/frame")
    return dt / N_FRAMES


def fe(**kw):
    return dataclasses.replace(cfg0, frontend=dataclasses.replace(cfg0.frontend, **kw))


def pn(**kw):
    return dataclasses.replace(cfg0, pnp=dataclasses.replace(cfg0.pnp, **kw))


base = fps_of(cfg0, "baseline")
variants = [
    (fe(lk_seed="none"), "seeding off (4-level coarse-to-fine)"),
    (fe(lk_seeded_iters=6), "seeded iters 10 -> 6"),
    (fe(lk_stereo_seeded_levels=1), "stereo seeded levels 2 -> 1"),
    (fe(lk_stereo_iters=4), "stereo iters 6 -> 4"),
    (fe(lk_window=15), "lk_window 21 -> 15"),
    (fe(fmat_iters=128), "fmat_iters 256 -> 128"),
    (fe(grid_step=30, max_points=512), "grid 20/1152 -> 30/512"),
    (pn(iters=cfg0.pnp.iters // 2), f"pnp iters {cfg0.pnp.iters} -> half"),
    (pn(refine_iters=max(1, cfg0.pnp.refine_iters // 2)),
     f"pnp refine {cfg0.pnp.refine_iters} -> half"),
    (dataclasses.replace(cfg0, keyframes=dataclasses.replace(
        cfg0.keyframes, min_pnp_inliers=0)), "keyframes never trigger"),
]
for cfg, label in variants:
    dt = fps_of(cfg, label)
    print(f"{'':40s}  delta {1e3*(base-dt):+7.2f} ms/frame")
fps_of(cfg0, "baseline (re-measured)")
