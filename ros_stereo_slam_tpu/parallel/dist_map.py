"""Keyframe/map-block sharding over the device mesh (SURVEY §2 P2).

The reference keeps its whole map in host RAM on one machine —
``keyFrameHistory``/``mapHistory`` are ``std::vector`` members of the
SLAM god-class (``/root/reference/include/visualSLAM.h:92-97``, reserved
for 4,500 frames at ``src/VisualSLAM.cpp:37``).  The TPU equivalent is a
:class:`~ros_stereo_slam_tpu.models.state.KeyframeStore` pytree whose
KEYFRAME axis is sharded over the 1-D device mesh: each device owns
``K/D`` cloud blocks (EP-like routing of map blocks to home shards), so
per-device map memory scales down with the mesh and the map's capacity
scales up with it.

What runs where:

- **insert** — a keyframe lands in ring slot ``count % K``; under jit the
  ``.at[slot].set`` scatter touches exactly one device's shard (GSPMD
  routes the replicated block to the slot's home device);
- **post-PGO rewrite** — the map-wide O(K·P) re-expression of every
  block after a loop closure (reference ``updateOdometry``,
  ``src/optimizationStuff.cpp:17-47``) runs block-local per device with
  REPLICATED (tiny) pose arrays: zero collective traffic inside the
  rewrite (:func:`rewrite_points_sharded`);
- **export** — PLY/viewer export gathers to host once at the end
  (:func:`gather_keyframes`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ros_stereo_slam_tpu.models import pose_graph
from ros_stereo_slam_tpu.models.state import KeyframeStore
from ros_stereo_slam_tpu.parallel.mesh import AXIS


def keyframe_shardings(mesh: Mesh, axis_name: str = AXIS) -> KeyframeStore:
    """Sharding pytree for a KeyframeStore: keyframe axis over the mesh,
    scalar count replicated."""
    sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return KeyframeStore(
        poses=sh, frame_idx=sh, points=sh, colors=sh,
        point_mask=sh, retrack=sh, valid=sh, count=rep,
    )


def shard_keyframes(
    mesh: Mesh, kf: KeyframeStore, axis_name: str = AXIS
) -> KeyframeStore:
    """Place a KeyframeStore with its keyframe axis sharded over the mesh.

    The ring capacity must divide evenly: pad capacity to a multiple of
    the mesh size at construction (KeyframeConfig.max_keyframes).
    """
    if kf.capacity % mesh.devices.size != 0:
        raise ValueError(
            f"keyframe capacity {kf.capacity} not divisible by mesh size "
            f"{mesh.devices.size}"
        )
    shardings = keyframe_shardings(mesh, axis_name)
    return jax.tree.map(jax.device_put, kf, shardings)


def rewrite_points_sharded(
    mesh: Mesh,
    points: jax.Array,  # (K, P, 3) block-sharded on K
    kf_frame_idx: jax.Array,  # (K,) sharded on K
    old_poses: jax.Array,  # (F, 4, 4) replicated
    new_poses: jax.Array,  # (F, 4, 4) replicated
    axis_name: str = AXIS,
) -> jax.Array:
    """Post-PGO map rewrite with blocks resident on their home shards.

    Each device re-expresses only its own K/D blocks; the pose arrays are
    replicated (F x 16 floats — KBs next to the MB-scale cloud blocks),
    so the rewrite needs NO collective at all.  Bitwise-identical to the
    single-device :func:`~ros_stereo_slam_tpu.models.pose_graph.
    rewrite_points`.
    """
    fn = jax.shard_map(
        pose_graph.rewrite_points,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return fn(points, kf_frame_idx, old_poses, new_poses)


def gather_keyframes(kf: KeyframeStore) -> KeyframeStore:
    """Gather a (possibly sharded) store to host numpy for export."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), kf)
