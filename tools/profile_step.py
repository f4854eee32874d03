import time, sys
import jax, jax.numpy as jnp
import numpy as np
from ros_stereo_slam_tpu.config import preset_odometry
from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
from ros_stereo_slam_tpu.models import step as step_mod
from ros_stereo_slam_tpu.ops import grid

cfg = preset_odometry()
cam_c = cfg.camera
world = SyntheticWorld(camera=cam_c, n_frames=3, seed=11)
L0, R0, _ = world.render(0); L1, R1, _ = world.render(1)
L0 = jnp.asarray(L0, jnp.float32); R0 = jnp.asarray(R0, jnp.float32)
L1 = jnp.asarray(L1, jnp.float32); R1 = jnp.asarray(R1, jnp.float32)
fe = cfg.frontend
pts, mask = grid.grid_points(cam_c.height, cam_c.width, fe.grid_step, fe.max_points)
pts = jnp.asarray(pts); mask = jnp.asarray(mask)
carry = step_mod.init_carry(L0, R0, pts, mask, jax.random.PRNGKey(0), cfg)
jax.block_until_ready(carry)

step_f = jax.jit(lambda c, l, r: step_mod.slam_frame_step(c, l, r, pts, mask, cfg))
c = carry
c, st = step_f(c, L1, R1); jax.block_until_ready(st)

# serial chained timing (true dependency)
t0 = time.perf_counter(); n = 20
for _ in range(n):
    c, st = step_f(c, L1, R1)
jax.block_until_ready(st)
print(f"chained step: {(time.perf_counter()-t0)/n*1e3:.3f} ms")

with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(5):
        c, st = step_f(c, L1, R1)
    jax.block_until_ready(st)
print("trace done")
