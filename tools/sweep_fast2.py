"""Round-2 throughput sweep: combos toward the 5x-baseline bar.

Usage: python tools/sweep_fast2.py [frames=192]
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
from ros_stereo_slam_tpu.ops import grid as grid_mod
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
    res = run_offline(cfg, L, R)
    dt = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run_offline(cfg, L, R)
        dt = min(dt, time.perf_counter() - t0)
    ate = metrics.ate_rmse(res.trajectory, gt)
    print(f"{label:46s}: {N_FRAMES/dt:7.2f} fps  {dt/N_FRAMES*1e3:6.2f} ms/f"
          f"  ATE {ate:7.4f} m", flush=True)


def mk(grid_step=None, **kw):
    fe_kw = dict(lk_seeded_iters=6)
    fe_kw.update({k: v for k, v in kw.items() if not k.startswith("pnp_")})
    if grid_step is not None:
        c = cfg0.camera
        pts, mask = grid_mod.grid_points(c.height, c.width, grid_step, 1 << 20)
        n = int(np.asarray(mask).sum())
        cap = -(-n // 128) * 128
        fe_kw.update(grid_step=grid_step, max_points=cap)
        print(f"  grid {grid_step}: {n} pts -> cap {cap}", flush=True)
    cfg = dataclasses.replace(
        cfg0,
        frontend=dataclasses.replace(cfg0.frontend, **fe_kw),
        pnp=dataclasses.replace(
            cfg0.pnp,
            iters=kw.get("pnp_iters", 128),
            refine_iters=kw.get("pnp_refine", 4),
        ),
    )
    return cfg


print(f"platform: {jax.devices()[0].platform}  frames: {N_FRAMES}",
      flush=True)
run(cfg0, "old baseline")
run(mk(), "A: seeded6 + pnp 128/4")
run(mk(fmat_gate="none"), "A + no temporal F-gate")
run(mk(fmat_iters=64), "A + fmat 64")
run(mk(grid_step=24), "A + grid 24")
run(mk(grid_step=28), "A + grid 28")
run(mk(grid_step=24, fmat_gate="none"), "A + grid 24 + no F-gate")
run(mk(), "A (re-measured)")
