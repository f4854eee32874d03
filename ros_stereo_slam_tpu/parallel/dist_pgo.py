"""Multi-device pose-graph optimization (config 5).

Two layouts, both equivalent to the single-device solve:

- :func:`optimize_sharded` — EDGE-sharded: odometry edges are partitioned
  across the mesh while the pose array stays replicated; contributions
  are psum-combined inside :func:`pose_graph.optimize`.  O(F) memory per
  device — fine for small chains, wasteful at scale.
- :func:`optimize_chain_sharded` — CHAIN-partitioned (the SURVEY §2
  layout: "partitioned GN iterations with halo exchange on
  chain-boundary poses"): each device owns a CONTIGUOUS block of F/D
  poses and the odometry edges terminating in it.  Per GN/CG step the
  only communication is (a) a one-pose halo ``ppermute`` (each device
  fetches its left neighbour's last pose), (b) the reverse ``ppermute``
  returning the boundary edge's normal-equation contribution, and (c) a
  psum over the L<=64 loop-edge endpoint rows + CG inner products.
  Per-device state is O(F/D) — the distributed analog of the
  reference's single-process ``globalOptimize``
  (``/root/reference/include/poseGraph.h:128-138``) that actually
  SCALES per-device memory down with the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ros_stereo_slam_tpu.models import pose_graph as pg_mod
from ros_stereo_slam_tpu.ops import linalg
from ros_stereo_slam_tpu.parallel.mesh import AXIS
from ros_stereo_slam_tpu.utils import lie


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


def optimize_chain_sharded(
    mesh: Mesh,
    poses,  # (F, 4, 4); F divisible by mesh size
    n_poses,
    odo_Z,  # (F, 4, 4); odo_Z[e] measures edge (e-1 -> e)
    loop_i, loop_j, loop_Z, loop_valid,  # (L,) / (L, 4, 4)
    iters: int = 10,
    cg_iters: int = 64,
    damping: float = 1e-6,
):
    """Chain-partitioned PGO: device d owns poses [d*B, (d+1)*B).

    Each device holds only its (B, 4, 4) pose block and the (B,) odometry
    edges ending in it; the left-neighbour halo pose, the boundary
    normal-equation send-back and the tiny loop-endpoint psum are the
    entire communication per iteration.  Numerically identical to
    :func:`pose_graph.optimize` on one device.
    """
    F = poses.shape[0]
    D = mesh.devices.size
    assert F % D == 0, (F, D)
    B = F // D
    L = loop_i.shape[0]
    eye6 = jnp.eye(6, dtype=poses.dtype)

    def body(T_blk, n_poses, Z_blk, li, lj, lZ, lv):
        d = lax.axis_index(AXIS)
        base = d * B
        e_glob = base + jnp.arange(B)  # global vertex/edge ids of this block
        odo_valid = (e_glob >= 1) & (e_glob < n_poses)
        w_l = lv.astype(poses.dtype)
        own_i = (li >= base) & (li < base + B)  # this shard owns loop_i row
        own_j = (lj >= base) & (lj < base + B)
        li_loc = jnp.clip(li - base, 0, B - 1)
        lj_loc = jnp.clip(lj - base, 0, B - 1)
        # free (non-gauge, in-range) mask over local vertices
        free = (e_glob > 0) & (e_glob < n_poses)

        def halo_left(x_blk):
            """Left neighbour's LAST row, one ppermute hop (d-1 -> d)."""
            src = x_blk[-1]
            return lax.ppermute(
                src, AXIS, [(s, (s + 1) % D) for s in range(D)]
            )

        def send_left(x):
            """Return x to the left neighbour (d -> d-1)."""
            return lax.ppermute(
                x, AXIS, [(s, (s - 1) % D) for s in range(D)]
            )

        def gather_rows(x_blk, idx_glob, own, loc):
            """All shards obtain x at global rows idx_glob (L small):
            owners contribute their row, psum broadcasts."""
            rows = x_blk[loc] * own.astype(x_blk.dtype).reshape(
                (-1,) + (1,) * (x_blk.ndim - 1)
            )
            return lax.psum(rows, AXIS)

        def gn_step(_, T):
            prev_last = halo_left(T)  # (4, 4) = T_global[base-1]
            Ti_all = jnp.concatenate([prev_last[None], T[:-1]], axis=0)

            r_o, Ji_o, Jj_o = jax.vmap(pg_mod._edge_residual_jacobians)(
                Ti_all, T, Z_blk
            )
            w_o = odo_valid.astype(poses.dtype)

            # loop edges: endpoint poses via psum gather, computed
            # redundantly on every shard (L <= 64 rows)
            T_li = gather_rows(T, li, own_i, li_loc)
            T_lj = gather_rows(T, lj, own_j, lj_loc)
            r_l, Ji_l, Jj_l = jax.vmap(pg_mod._edge_residual_jacobians)(
                T_li, T_lj, lZ
            )

            # gauge + range masking per VERTEX the Jacobian touches
            def vmask(vid):
                return ((vid > 0) & (vid < n_poses)).astype(poses.dtype)

            Ji_o = Ji_o * (vmask(e_glob - 1) * w_o)[:, None, None]
            Jj_o = Jj_o * (vmask(e_glob) * w_o)[:, None, None]
            Ji_l = Ji_l * (vmask(li) * w_l)[:, None, None]
            Jj_l = Jj_l * (vmask(lj) * w_l)[:, None, None]
            r_o_w = r_o * w_o[:, None]
            r_l_w = r_l * w_l[:, None]

            def scatter_block(ci, cj, cli, clj):
                """Assemble per-vertex sums: cj lands on local row e;
                ci lands on local row e-1 — row -1 (the boundary edge's
                left vertex) is RETURNED to the left neighbour and added
                to its last row.  Loop rows masked by ownership."""
                out = jnp.zeros((B,) + ci.shape[1:], ci.dtype)
                out = out + cj  # cj[l] -> local row l
                out = out.at[:-1].add(ci[1:])  # ci[l] -> local row l-1
                from_right = send_left(ci[0])
                out = out.at[-1].add(from_right)
                oi = own_i.astype(ci.dtype).reshape(
                    (-1,) + (1,) * (ci.ndim - 1)
                )
                oj = own_j.astype(ci.dtype).reshape(
                    (-1,) + (1,) * (ci.ndim - 1)
                )
                out = out.at[li_loc].add(cli * oi)
                out = out.at[lj_loc].add(clj * oj)
                return out

            b = scatter_block(
                -jnp.einsum("eab,ea->eb", Ji_o, r_o_w),
                -jnp.einsum("eab,ea->eb", Jj_o, r_o_w),
                -jnp.einsum("eab,ea->eb", Ji_l, r_l_w),
                -jnp.einsum("eab,ea->eb", Jj_l, r_l_w),
            )
            Dg = scatter_block(
                jnp.einsum("eab,eac->ebc", Ji_o, Ji_o),
                jnp.einsum("eab,eac->ebc", Jj_o, Jj_o),
                jnp.einsum("eab,eac->ebc", Ji_l, Ji_l),
                jnp.einsum("eab,eac->ebc", Jj_l, Jj_l),
            )
            Dg = Dg + (damping + 1e-8) * eye6[None]
            D_inv = linalg.spd_inverse_small(Dg)

            def hx(x):
                x_prev = halo_left(x)  # (6,)
                xi_o = jnp.concatenate([x_prev[None], x[:-1]], axis=0)
                t_o = jnp.einsum("eab,eb->ea", Ji_o, xi_o) + jnp.einsum(
                    "eab,eb->ea", Jj_o, x
                )
                xi_l = gather_rows(x, li, own_i, li_loc)
                xj_l = gather_rows(x, lj, own_j, lj_loc)
                t_l = jnp.einsum("eab,eb->ea", Ji_l, xi_l) + jnp.einsum(
                    "eab,eb->ea", Jj_l, xj_l
                )
                out = scatter_block(
                    jnp.einsum("eab,ea->eb", Ji_o, t_o),
                    jnp.einsum("eab,ea->eb", Jj_o, t_o),
                    jnp.einsum("eab,ea->eb", Ji_l, t_l),
                    jnp.einsum("eab,ea->eb", Jj_l, t_l),
                )
                return out + damping * x

            def precond(v):
                return jnp.einsum("fab,fb->fa", D_inv, v)

            def dot(a, bb):
                return lax.psum(jnp.sum(a * bb), AXIS)

            x0 = jnp.zeros((B, 6), poses.dtype)
            r0 = b - hx(x0)
            z0 = precond(r0)

            def cg_body(_, st):
                x, r, z, p, rz = st
                Ap = hx(p)
                denom = dot(p, Ap)
                alpha = rz / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
                x = x + alpha * p
                r = r - alpha * Ap
                z = precond(r)
                rz_new = dot(r, z)
                beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
                p = z + beta * p
                return (x, r, z, p, rz_new)

            x, *_ = lax.fori_loop(
                0, cg_iters, cg_body, (x0, r0, z0, z0, dot(r0, z0))
            )
            x = x * free[:, None]
            upd = jax.vmap(lie.exp_se3)(x)
            return jnp.einsum("fij,fjk->fik", T, upd)

        return lax.fori_loop(0, iters, gn_step, T_blk)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(AXIS),  # pose blocks
            P(),  # n_poses
            P(AXIS),  # odometry measurements (edge e owned with vertex e)
            P(), P(), P(), P(),  # loop edges replicated
        ),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return fn(poses, n_poses, odo_Z, loop_i, loop_j, loop_Z, loop_valid)
