"""Where does scan-mode full SLAM time go, vs odometry-only scan?

Times three regions on identical pre-staged frames:
  1. odometry-only run_sequence (models/step.py)
  2. combined odometry+LC run_sequence_slam scan dispatch only
  3. full run_offline_slam (scan + host epilogue)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import (
    LoopClosureConfig, preset_loop_closure, preset_odometry,
)
from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
from ros_stereo_slam_tpu.models import slam_scan, step as step_mod
from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.models.pipeline import _grid_for, run_offline
from ros_stereo_slam_tpu.ops import orb as orb_mod

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128

cap = 1 << N.bit_length()
cfg = preset_loop_closure().replace(
    loop=dataclasses.replace(LoopClosureConfig(), db_capacity=max(cap, 512))
)
cfg_odo = preset_odometry()
world = SyntheticWorld(camera=cfg.camera, n_frames=N + 1, seed=11, half_w=18.0)
fr = [world.render(i) for i in range(N + 1)]
L = jax.device_put(jnp.asarray(np.stack([f[0] for f in fr]), jnp.float32))
R = jax.device_put(jnp.asarray(np.stack([f[1] for f in fr]), jnp.float32))
jax.block_until_ready((L, R))

descs = []
for i in range(0, N + 1, 8):
    f = orb_mod.detect_and_compute(L[i], cfg.loop.orb_features,
                                   n_levels=cfg.loop.orb_levels)
    v = np.asarray(f.valid)
    descs.append(np.asarray(f.desc_sign)[v])
voc = vocab_mod.train_batched(np.concatenate(descs), k=cfg.loop.vocab_k,
                              levels=cfg.loop.vocab_levels)


def timeit(label, fn, reps=3):
    fn()
    dt = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = min(dt, time.perf_counter() - t0)
    print(f"{label:34s}: {N/dt:7.2f} fps  {dt/N*1e3:7.3f} ms/frame")
    return dt


timeit("odometry-only scan (run_offline)", lambda: run_offline(cfg_odo, L, R))

grid_pts, grid_mask = _grid_for(cfg)
key = jax.random.PRNGKey(cfg.seed)
carry0 = step_mod.init_carry(L[0], R[0], grid_pts, grid_mask, key, cfg)
lc0 = slam_scan.init_lc_state(cfg, voc.n_words)
centers = tuple(voc.centers)
idf = jnp.asarray(voc.idf)


def scan_only():
    (c, lc), (fstats, lstats) = slam_scan.run_sequence_slam(
        L[1:], R[1:], carry0, lc0, grid_pts, grid_mask, centers, idf,
        cfg, voc.k)
    np.asarray(fstats.T_wc[-1])


timeit("combined scan dispatch only", scan_only)
timeit("full run_offline_slam", lambda: slam_scan.run_offline_slam(cfg, voc, L, R))

# odometry via the same slam config (keyframes etc identical) to isolate
# config differences from LC work
timeit("odometry scan w/ slam cfg", lambda: run_offline(
    cfg.replace(loop=dataclasses.replace(cfg.loop, enabled=False)), L, R))
