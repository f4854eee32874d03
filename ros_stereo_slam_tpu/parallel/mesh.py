"""Device-mesh construction helpers.

The reference is single-process with no distribution (SURVEY.md §2); the
TPU framework scales via ``jax.sharding.Mesh`` + collectives over ICI/DCN.
One 1-D mesh axis ("shard") carries all partitioning in this workload:
landmarks/map blocks for BA, odometry-edge chunks for PGO, and the point
dimension of the frontend kernels (DP-over-points).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ros_stereo_slam_tpu.config import ParallelConfig

AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis_name: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=(axis_name,))


def mesh_from_config(cfg: ParallelConfig) -> Mesh:
    return make_mesh(int(np.prod(cfg.mesh_shape)), cfg.axis_name)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_leading(mesh: Mesh, axis_name: str = AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))
