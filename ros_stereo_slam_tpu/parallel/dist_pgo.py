"""Multi-device pose-graph optimization (config 5).

The pose CHAIN's odometry edges are partitioned across the mesh axis
(the sequence-parallel analog for this workload, SURVEY.md §2): each
device assembles normal-equation contributions for its edge chunk against
the replicated pose array, and contributions are combined with ``psum``
inside :func:`ros_stereo_slam_tpu.models.pose_graph.optimize` (its
``axis_name`` path).  Loop edges (few) live on shard 0 only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ros_stereo_slam_tpu.models import pose_graph as pg_mod
from ros_stereo_slam_tpu.parallel.mesh import AXIS


def optimize_sharded(
    mesh: Mesh,
    poses,  # (F, 4, 4); F divisible by mesh size
    n_poses,
    odo_Z,  # (F, 4, 4)
    loop_i, loop_j, loop_Z, loop_valid,
    iters: int = 10,
    cg_iters: int = 64,
    damping: float = 1e-6,
):
    """Distributed PGO over a 1-D mesh; same result as single-device."""
    F = poses.shape[0]
    odo_idx = jnp.arange(F)

    def body(poses, n_poses, odo_Z_l, odo_idx_l, loop_i, loop_j, loop_Z, loop_valid_l):
        return pg_mod.optimize(
            poses, n_poses, odo_Z_l, loop_i, loop_j, loop_Z, loop_valid_l,
            iters=iters, cg_iters=cg_iters, damping=damping,
            odo_idx=odo_idx_l, axis_name=AXIS,
        )

    # Loop edges only counted on shard 0.
    n_dev = mesh.devices.size
    shard_ids = jnp.repeat(jnp.arange(n_dev), loop_valid.shape[0])
    loop_valid_stack = jnp.where(
        (jnp.arange(n_dev)[:, None] == 0), loop_valid[None, :], False
    ).reshape(n_dev * loop_valid.shape[0])

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),  # poses replicated
            P(),  # n_poses
            P(AXIS),  # odometry measurements sharded by edge
            P(AXIS),  # their vertex ids
            P(),  # loop_i (replicated; masked by per-shard validity)
            P(),
            P(),
            P(AXIS),  # per-shard loop validity (only shard 0 true)
        ),
        out_specs=P(),
        check_vma=False,
    )
    return fn(
        poses, n_poses, odo_Z, odo_idx,
        loop_i, loop_j, loop_Z, loop_valid_stack,
    )
