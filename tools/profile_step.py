"""Per-stage honest timing of the fused frame step on the current platform.

Timings force a device->host transfer of each result (the dev TPU tunnel's
block_until_ready can return before execution completes), and chain the
dependency for the full-step measurement.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import preset_odometry
from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
from ros_stereo_slam_tpu.models import frontend, step as step_mod
from ros_stereo_slam_tpu.ops import grid, lk, pnp, pyramid, ransac
from ros_stereo_slam_tpu.utils import lie

cfg = preset_odometry()
cam_c = cfg.camera
world = SyntheticWorld(camera=cam_c, n_frames=3, seed=11)
L0, R0, _ = world.render(0)
L1, R1, _ = world.render(1)
L0 = jnp.asarray(L0, jnp.float32); R0 = jnp.asarray(R0, jnp.float32)
L1 = jnp.asarray(L1, jnp.float32); R1 = jnp.asarray(R1, jnp.float32)
fe = cfg.frontend
pts, mask = grid.grid_points(cam_c.height, cam_c.width, fe.grid_step, fe.max_points)
pts = jnp.asarray(pts); mask = jnp.asarray(mask)
carry = step_mod.init_carry(L0, R0, pts, mask, jax.random.PRNGKey(0), cfg)
jax.block_until_ready(carry)
from ros_stereo_slam_tpu.models.step import _cam_of
cam = _cam_of(cfg)


# Peak per v5e chip (public): 394 TF bf16, ~98 TF f32 (MXU), used only
# to turn XLA's own cost-analysis FLOP estimate into an MFU ballpark.
PEAK_BF16 = 394e12
PEAK_F32 = PEAK_BF16 / 4


def _flops(fn, *args):
    """XLA's cost-analysis FLOP estimate for fn(*args), or None."""
    try:
        c = jax.jit(fn).lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0)) or None
    except Exception:
        return None


def timed(name, fn, *args, reps=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    fl = _flops(fn, *args)
    if fl:
        # bf16 peak where the stage's matmuls run bf16 (the LK selects),
        # f32 otherwise — report against f32 peak as the conservative MFU.
        mfu = fl / dt / PEAK_F32 * 100.0
        print(f"{name:28s}: {dt*1e3:8.3f} ms  "
              f"{fl/1e9:8.3f} GFLOP  ~{mfu:5.1f}% of f32 peak")
    else:
        print(f"{name:28s}: {dt*1e3:8.3f} ms")
    return out


print(f"platform: {jax.devices()[0].platform}")

pyr_f = jax.jit(lambda im: tuple(pyramid.build_pyramid(im, fe.lk_levels)))
cur_pyr = timed("build_pyramid", pyr_f, L1)
ref_pyr = pyr_f(L0)
np.asarray(ref_pyr[0])

lk_f = jax.jit(lambda a, b, p: lk.track(a, b, p, None, frontend._lk_params(fe)))
res = timed("lk.track (temporal)", lk_f, ref_pyr, cur_pyr, pts)

m = mask & res.valid
fmat_f = jax.jit(lambda k, p1, p2, mm: ransac.fmat_ransac(
    k, p1, p2, mm, thresh_px=fe.fmat_thresh_px, iters=fe.fmat_iters))
fres = timed("fmat_ransac", fmat_f, jax.random.PRNGKey(1), pts, res.points, m)

m2 = m & fres.inliers
pc = cfg.pnp
pnp_f = jax.jit(lambda k, p3, p2, mm, Ti: pnp.pnp_ransac(
    k, cam, p3, p2, mm, thresh_px=pc.thresh_px, iters=pc.iters,
    refine_iters=pc.refine_iters, T_init=Ti,
    retry_thresh_px=pc.retry_thresh_px, min_inliers=pc.min_inliers))
timed("pnp_ransac", pnp_f, jax.random.PRNGKey(2), carry.track.pts3d,
      res.points, m2, jnp.eye(4, dtype=jnp.float32))

step_f = jax.jit(lambda c, l, r: step_mod.slam_frame_step(c, l, r, pts, mask, cfg))
c, st = step_f(carry, L1, R1)
np.asarray(st.T_wc)
t0 = time.perf_counter(); n = 20
for _ in range(n):
    c, st = step_f(c, L1, R1)
    np.asarray(st.T_wc)
print(f"{'FULL fused frame step':28s}: {(time.perf_counter()-t0)/n*1e3:8.3f} ms (incl host xfer)")
