"""Multi-device windowed bundle adjustment (config 5).

Landmarks (and their observation columns) are sharded over the mesh
axis; each device eliminates its landmark blocks locally (batched 3x3
inversions) and the reduced camera system is summed across devices with
``psum`` inside :func:`ros_stereo_slam_tpu.models.bundle_adjust.ba_solve`
(its ``axis_name`` path).  Poses are replicated — they are tiny (W x 16
floats) next to the landmark blocks, so the collective traffic per GN
iteration is just the (W, W, 6, 6) reduced system.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ros_stereo_slam_tpu.models import bundle_adjust as ba_mod
from ros_stereo_slam_tpu.parallel.mesh import AXIS
from ros_stereo_slam_tpu.utils.camera import Pinhole


def ba_solve_sharded(
    mesh: Mesh,
    cam: Pinhole,
    T_cw,
    landmarks,  # (N, 3), N divisible by mesh size
    obs,  # (W, N, 2)
    obs_mask,  # (W, N)
    fixed,  # (W,)
    iters: int = 10,
    damping: float = 1e-4,
    huber_px: float = 2.0,
) -> ba_mod.BAResult:
    """Distributed BA over a 1-D mesh; same result as single-device."""

    fn = jax.shard_map(
        partial(
            ba_mod.ba_solve,
            iters=iters, damping=damping, huber_px=huber_px, axis_name=AXIS,
        ),
        mesh=mesh,
        in_specs=(
            P(),  # cam (pytree of scalars)
            P(),  # poses replicated
            P(AXIS),  # landmarks sharded on N
            P(None, AXIS),  # obs sharded on the landmark dim
            P(None, AXIS),
            P(),  # fixed
        ),
        out_specs=ba_mod.BAResult(
            T_cw=P(), landmarks=P(AXIS), rms_before=P(), rms_after=P()
        ),
        check_vma=False,
    )
    return fn(cam, T_cw, landmarks, obs, obs_mask, fixed)
