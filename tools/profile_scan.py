import time
import jax, jax.numpy as jnp
import numpy as np
from ros_stereo_slam_tpu.config import preset_odometry
from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
from ros_stereo_slam_tpu.models.pipeline import run_offline

cfg = preset_odometry()
world = SyntheticWorld(camera=cfg.camera, n_frames=17, seed=11)
lefts, rights = [], []
for i in range(17):
    l, r, _ = world.render(i)
    lefts.append(l); rights.append(r)
L = np.stack(lefts); R = np.stack(rights)
res = run_offline(cfg, L, R)  # compile + run
print("keyframes:", res.is_keyframe.sum(), "/", len(res.is_keyframe))
t0 = time.perf_counter()
res = run_offline(cfg, L, R)
dt = time.perf_counter() - t0
print(f"scan 16 frames: {dt*1e3:.1f} ms -> {dt/16*1e3:.2f} ms/frame")
with jax.profiler.trace("/tmp/jaxtrace2"):
    res = run_offline(cfg, L, R)
print("traced")
