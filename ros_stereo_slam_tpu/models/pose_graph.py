"""SE(3) pose-graph optimization (reference C11 + C12).

TPU-native replacement for g2o as configured by the reference
(``/root/reference/include/poseGraph.h``): a vertex chain with odometry
edges Z_i = T_{i-1}^{-1} T_i (``augmentNode`` ``:87-111``), loop edges
with IDENTITY measurement — the reference's "absolute closure" semantics
(``addLoopClosure`` ``:113-126``, T=I at ``:118``; ``README.md:39``) —
Gauss-Newton, 10 iterations (``globalOptimize`` ``:128-138``), first
vertex fixed (``:74``), identity information matrices (never set in the
reference: declared ``:42``, commented out ``:103,:122``).

Instead of g2o's sparse Cholesky, the normal equations are solved with
block-Jacobi-preconditioned conjugate gradient whose matvec is an
edge-batched scatter/gather — every step is a fixed-shape vmap/segment
reduction, jit-compiled end to end.  Residual Jacobians use the
right-perturbation convention with a second-order inverse right Jacobian.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import PGOConfig
from ros_stereo_slam_tpu.ops import linalg
from ros_stereo_slam_tpu.utils import lie


def _ad_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """adjoint (little ad) of a twist (rho, phi): [[phi^, rho^], [0, phi^]]."""
    rho, phi = xi[:3], xi[3:]
    ph = lie.hat_so3(phi)
    rh = lie.hat_so3(rho)
    top = jnp.concatenate([ph, rh], axis=1)
    bot = jnp.concatenate([jnp.zeros((3, 3), xi.dtype), ph], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _jr_inv(r: jnp.ndarray) -> jnp.ndarray:
    """Second-order inverse right Jacobian of SE(3) at twist r."""
    ad = _ad_se3(r)
    I = jnp.eye(6, dtype=r.dtype)
    return I + 0.5 * ad + (1.0 / 12.0) * (ad @ ad)


def _edge_residual_jacobians(Ti, Tj, Z):
    """r = log(Z^-1 Ti^-1 Tj); right-perturbation Jacobians (Ji, Jj)."""
    Tij = lie.inv_se3(Ti) @ Tj
    r = lie.log_se3(lie.inv_se3(Z) @ Tij)
    Jri = _jr_inv(r)
    Jj = Jri
    Ji = -Jri @ lie.adjoint_se3(lie.inv_se3(Tij))
    return r, Ji, Jj


@partial(jax.jit, static_argnames=("iters", "cg_iters", "axis_name"))
def optimize(
    poses: jnp.ndarray,  # (F, 4, 4) current estimates (replicated)
    n_poses: jnp.ndarray,  # () i32 number of valid poses
    odo_Z: jnp.ndarray,  # (E, 4, 4); measurement for edge (idx-1 -> idx)
    loop_i: jnp.ndarray,  # (L,) i32 edge endpoints
    loop_j: jnp.ndarray,  # (L,) i32
    loop_Z: jnp.ndarray,  # (L, 4, 4) loop measurements (identity in ref)
    loop_valid: jnp.ndarray,  # (L,) bool
    iters: int = 10,
    cg_iters: int = 64,
    damping: float = 1e-6,
    odo_idx: jnp.ndarray | None = None,  # (E,) vertex ids; default arange(F)
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Gauss-Newton over the pose chain; returns optimized (F, 4, 4).

    With `axis_name` set (inside ``shard_map``): the ODOMETRY EDGES are
    partitioned across the mesh (odo_Z/odo_idx are local chunks, the
    pose array stays replicated), each device assembles its share of the
    normal-equation terms, and the contributions are combined with psum —
    the 'partitioned chain GN with psum-reduced normal equations' layout
    of SURVEY.md §2.  Loop edges must be valid on exactly one shard.
    """

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    F = poses.shape[0]
    idx = jnp.arange(F) if odo_idx is None else odo_idx
    # Odometry edge e connects (idx-1, idx), valid for 1 <= idx < n.
    odo_valid = (idx >= 1) & (idx < n_poses)

    def gn_step(_, T):
        # --- batched residuals + Jacobians ---
        def odo_edge(e_i, Z):
            Ti = T[jnp.maximum(e_i - 1, 0)]
            Tj = T[e_i]
            return _edge_residual_jacobians(Ti, Tj, Z)

        r_o, Ji_o, Jj_o = jax.vmap(odo_edge)(idx, odo_Z)  # (F, 6), (F, 6, 6)
        w_o = odo_valid.astype(poses.dtype)

        def loop_edge(i, j, Z):
            return _edge_residual_jacobians(T[i], T[j], Z)

        r_l, Ji_l, Jj_l = jax.vmap(loop_edge)(loop_i, loop_j, loop_Z)
        w_l = loop_valid.astype(poses.dtype)

        # Gauge fixing: vertex 0 is constant (reference poseGraph.h:74).
        # (Over POSES — distinct from `idx`, which enumerates edges and is
        # a local chunk under edge sharding.)
        free = (jnp.arange(F) > 0) & (jnp.arange(F) < n_poses)

        def mask_vertex(J, vid):
            ok = (vid > 0) & (vid < n_poses)
            return J * ok.astype(J.dtype)[..., None, None]

        Ji_o = mask_vertex(Ji_o, idx - 1) * w_o[:, None, None]
        Jj_o = mask_vertex(Jj_o, idx) * w_o[:, None, None]
        Ji_l = mask_vertex(Ji_l, loop_i) * w_l[:, None, None]
        Jj_l = mask_vertex(Jj_l, loop_j) * w_l[:, None, None]
        r_o_w = r_o * w_o[:, None]
        r_l_w = r_l * w_l[:, None]

        # --- right-hand side b = -sum J^T r (scattered per vertex) ---
        b = jnp.zeros((F, 6), poses.dtype)
        b = b.at[jnp.maximum(idx - 1, 0)].add(
            -jnp.einsum("eab,ea->eb", Ji_o, r_o_w)
        )
        b = b.at[idx].add(-jnp.einsum("eab,ea->eb", Jj_o, r_o_w))
        b = b.at[loop_i].add(-jnp.einsum("eab,ea->eb", Ji_l, r_l_w))
        b = b.at[loop_j].add(-jnp.einsum("eab,ea->eb", Jj_l, r_l_w))
        b = allsum(b)

        # --- block-diagonal of H for the Jacobi preconditioner ---
        D = jnp.zeros((F, 6, 6), poses.dtype)
        D = D.at[jnp.maximum(idx - 1, 0)].add(jnp.einsum("eab,eac->ebc", Ji_o, Ji_o))
        D = D.at[idx].add(jnp.einsum("eab,eac->ebc", Jj_o, Jj_o))
        D = D.at[loop_i].add(jnp.einsum("eab,eac->ebc", Ji_l, Ji_l))
        D = D.at[loop_j].add(jnp.einsum("eab,eac->ebc", Jj_l, Jj_l))
        D = allsum(D) + (damping + 1e-8) * jnp.eye(6, dtype=poses.dtype)[None]
        # (F, 6, 6) SPD blocks: unrolled Cholesky inverse instead of the
        # serial batched-LU custom call (block-Jacobi preconditioner).
        D_inv = linalg.spd_inverse_small(D)

        def hx(x):
            """H @ x via edge-wise gather/scatter (x: (F, 6))."""
            xi_o = x[jnp.maximum(idx - 1, 0)]
            xj_o = x[idx]
            t_o = jnp.einsum("eab,eb->ea", Ji_o, xi_o) + jnp.einsum(
                "eab,eb->ea", Jj_o, xj_o
            )
            xi_l = x[loop_i]
            xj_l = x[loop_j]
            t_l = jnp.einsum("eab,eb->ea", Ji_l, xi_l) + jnp.einsum(
                "eab,eb->ea", Jj_l, xj_l
            )
            out = jnp.zeros_like(x)
            out = out.at[jnp.maximum(idx - 1, 0)].add(
                jnp.einsum("eab,ea->eb", Ji_o, t_o)
            )
            out = out.at[idx].add(jnp.einsum("eab,ea->eb", Jj_o, t_o))
            out = out.at[loop_i].add(jnp.einsum("eab,ea->eb", Ji_l, t_l))
            out = out.at[loop_j].add(jnp.einsum("eab,ea->eb", Jj_l, t_l))
            return allsum(out) + damping * x

        # --- preconditioned CG ---
        def precond(v):
            return jnp.einsum("fab,fb->fa", D_inv, v)

        x0 = jnp.zeros((F, 6), poses.dtype)
        r0 = b - hx(x0)
        z0 = precond(r0)

        def cg_body(_, st):
            x, r, z, p, rz = st
            Ap = hx(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            p = z + beta * p
            return (x, r, z, p, rz_new)

        x, *_ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, r0, z0, z0, jnp.sum(r0 * z0))
        )
        x = x * free[:, None]
        # Right-update: T <- T exp(x^).
        upd = jax.vmap(lie.exp_se3)(x)
        return jnp.einsum("fij,fjk->fik", T, upd)

    return jax.lax.fori_loop(0, iters, gn_step, poses)


@jax.jit
def chain_measurements(poses: jnp.ndarray) -> jnp.ndarray:
    """Odometry measurements from a trajectory: Z[i] = T_{i-1}^-1 T_i."""
    prev = jnp.concatenate([poses[:1], poses[:-1]], axis=0)
    return jnp.einsum("fij,fjk->fik", jax.vmap(lie.inv_se3)(prev), poses)


@jax.jit
def rewrite_points(
    points: jnp.ndarray,  # (K, P, 3) keyframe cloud blocks (world frame)
    kf_frame_idx: jnp.ndarray,  # (K,) pose index of each keyframe
    old_poses: jnp.ndarray,  # (F, 4, 4)
    new_poses: jnp.ndarray,  # (F, 4, 4)
) -> jnp.ndarray:
    """Re-express keyframe clouds after PGO (reference ``updateOdometry``,
    ``src/optimizationStuff.cpp:17-47``): p' = T_new T_old^-1 p."""
    T_old = old_poses[kf_frame_idx]
    T_new = new_poses[kf_frame_idx]
    delta = jnp.einsum("kij,kjl->kil", T_new, jax.vmap(lie.inv_se3)(T_old))
    return (
        jnp.einsum("kij,kpj->kpi", delta[:, :3, :3], points)
        + delta[:, None, :3, 3]
    )


@dataclass
class PoseGraph:
    """Host-facing incremental wrapper (the reference's ``globalPoseGraph``
    API: initializeGraph / augmentNode / addLoopClosure / globalOptimize)."""

    config: PGOConfig
    count: int = 0
    odo_Z: jnp.ndarray = field(init=False)
    loop_i: jnp.ndarray = field(init=False)
    loop_j: jnp.ndarray = field(init=False)
    loop_Z: jnp.ndarray = field(init=False)
    loop_valid: jnp.ndarray = field(init=False)
    n_loops: int = 0
    last_path: str = "single"  # which optimize layout last ran

    def __post_init__(self):
        F = self.config.max_poses
        L = self.config.max_loop_edges
        eye = jnp.eye(4, dtype=jnp.float32)
        self.odo_Z = jnp.tile(eye, (F, 1, 1))
        self.loop_i = jnp.zeros((L,), jnp.int32)
        self.loop_j = jnp.zeros((L,), jnp.int32)
        self.loop_Z = jnp.tile(eye, (L, 1, 1))
        self.loop_valid = jnp.zeros((L,), bool)

    def initialize(self):
        self.count = 1  # vertex 0 at identity (reference initializeGraph)

    def add_odometry(self, Z: jnp.ndarray):
        """Append vertex `count` with edge (count-1 -> count).

        Raises on capacity exhaustion: in jit an out-of-bounds scatter is
        silently clamped/dropped, which would corrupt the last vertex on a
        run longer than ``max_poses`` (the reference reserves 4,500,
        ``src/VisualSLAM.cpp:37``, and would segfault-free grow instead).
        """
        if self.count >= self.config.max_poses:
            raise RuntimeError(
                f"pose-graph capacity exhausted ({self.config.max_poses} "
                "poses); raise PGOConfig.max_poses"
            )
        self.odo_Z = self.odo_Z.at[self.count].set(Z)
        self.count += 1

    def add_odometry_batch(self, Z: jnp.ndarray):
        """Append `Z.shape[0]` vertices in one device update — the chunked
        online driver pushes a whole micro-batch of odometry edges per
        dispatch instead of one ``.at[].set`` per frame."""
        n = Z.shape[0]
        if self.count + n > self.config.max_poses:
            raise RuntimeError(
                f"pose-graph capacity exhausted ({self.config.max_poses} "
                "poses); raise PGOConfig.max_poses"
            )
        self.odo_Z = jax.lax.dynamic_update_slice(
            self.odo_Z, jnp.asarray(Z, self.odo_Z.dtype),
            (self.count, 0, 0),
        )
        self.count += n

    def add_loop(self, i: int, j: int, Z: jnp.ndarray | None = None):
        """Loop edge; Z defaults to identity (reference semantics).

        Raises when the edge store is full instead of silently wrapping
        the ring and overwriting the oldest loop constraint.
        """
        if self.n_loops >= self.loop_i.shape[0]:
            raise RuntimeError(
                f"loop-edge capacity exhausted ({self.loop_i.shape[0]}); "
                "raise PGOConfig.max_loop_edges"
            )
        slot = self.n_loops
        self.loop_i = self.loop_i.at[slot].set(i)
        self.loop_j = self.loop_j.at[slot].set(j)
        if Z is not None:
            self.loop_Z = self.loop_Z.at[slot].set(Z)
        self.loop_valid = self.loop_valid.at[slot].set(True)
        self.n_loops += 1

    def optimize(self, poses: jnp.ndarray, mesh=None) -> jnp.ndarray:
        """Global optimization (reference ``globalOptimize``).

        With a >1-device `mesh` (and F divisible by the mesh size) the
        solve routes through the O(F/D) chain-partitioned layout
        (:func:`parallel.dist_pgo.optimize_chain_sharded` — contiguous
        pose blocks, one-pose ppermute halo, loop-endpoint psum), the
        distributed analog of g2o's single-process solver the live
        driver reaches via ``StereoSLAM(mesh=...)``.  `last_path` records
        which path ran (for tests/observability).
        """
        args = (
            poses, jnp.int32(self.count), self.odo_Z,
            self.loop_i, self.loop_j, self.loop_Z, self.loop_valid,
        )
        kw = dict(
            iters=self.config.iters, cg_iters=self.config.cg_iters,
            damping=self.config.damping,
        )
        if (
            mesh is not None
            and mesh.devices.size > 1
            and poses.shape[0] % mesh.devices.size == 0
        ):
            from ros_stereo_slam_tpu.parallel import dist_pgo

            self.last_path = "chain_sharded"
            return dist_pgo.optimize_chain_sharded(mesh, *args, **kw)
        self.last_path = "single"
        return optimize(*args, **kw)

    # -- persistence (reference saveStructure, poseGraph.h:140-179; load
    # restores what g2o's load() would — the reference saves but never
    # resumes, SURVEY.md §5) -----------------------------------------------

    @classmethod
    def load(cls, path: str, config: PGOConfig) -> tuple["PoseGraph", np.ndarray]:
        """Parse a `.g2o` text file saved by :meth:`save`.

        Returns (graph, poses) where poses is a (max_poses, 4, 4) array
        (vertices 0..count-1 filled, identity beyond — the layout
        :meth:`optimize` expects); consecutive-index edges become the
        odometry chain, all others loop edges.
        """
        from ros_stereo_slam_tpu.utils.lie import rot_from_quat

        verts: dict[int, np.ndarray] = {}
        edges: list[tuple[int, int, np.ndarray]] = []

        def to_T(vals):
            tx, ty, tz, qx, qy, qz, qw = vals
            q = jnp.asarray([qw, qx, qy, qz], jnp.float32)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.asarray(rot_from_quat(q))
            T[:3, 3] = (tx, ty, tz)
            return T

        with open(path) as f:
            for line in f:
                tok = line.split()
                if not tok:
                    continue
                if tok[0] == "VERTEX_SE3:QUAT":
                    verts[int(tok[1])] = to_T([float(x) for x in tok[2:9]])
                elif tok[0] == "EDGE_SE3:QUAT":
                    i, j = int(tok[1]), int(tok[2])
                    edges.append((i, j, to_T([float(x) for x in tok[3:10]])))

        g = cls(config)
        g.initialize()
        count = (max(verts) + 1) if verts else 1
        poses = np.tile(np.eye(4, dtype=np.float32), (config.max_poses, 1, 1))
        for i, T in verts.items():
            poses[i] = T
        odo = np.tile(np.eye(4, dtype=np.float32), (config.max_poses, 1, 1))
        for i, j, Z in edges:
            if j == i + 1:
                odo[j] = Z
            else:
                g.add_loop(i, j, jnp.asarray(Z))
        g.odo_Z = jnp.asarray(odo)
        g.count = count
        return g, poses

    def save(self, path: str, poses: np.ndarray) -> None:
        """g2o-compatible text dump (VERTEX_SE3:QUAT / EDGE_SE3:QUAT)."""
        import jax.numpy as jnp  # local to keep numpy-only callers light

        from ros_stereo_slam_tpu.utils.lie import quat_from_rot

        with open(path, "w") as f:
            for i in range(self.count):
                T = poses[i]
                q = np.asarray(quat_from_rot(jnp.asarray(T[:3, :3])))
                t = T[:3, 3]
                f.write(
                    f"VERTEX_SE3:QUAT {i} {t[0]} {t[1]} {t[2]} "
                    f"{q[1]} {q[2]} {q[3]} {q[0]}\n"
                )
            info = " ".join(["1 0 0 0 0 0", "1 0 0 0 0", "1 0 0 0", "1 0 0", "1 0", "1"])
            Zs = np.asarray(self.odo_Z)
            for i in range(1, self.count):
                Z = Zs[i]
                q = np.asarray(quat_from_rot(jnp.asarray(Z[:3, :3])))
                t = Z[:3, 3]
                f.write(
                    f"EDGE_SE3:QUAT {i - 1} {i} {t[0]} {t[1]} {t[2]} "
                    f"{q[1]} {q[2]} {q[3]} {q[0]} {info}\n"
                )
            li = np.asarray(self.loop_i)
            lj = np.asarray(self.loop_j)
            lz = np.asarray(self.loop_Z)
            lv = np.asarray(self.loop_valid)
            for s in range(min(self.n_loops, len(li))):
                if not lv[s]:
                    continue
                Z = lz[s]
                q = np.asarray(quat_from_rot(jnp.asarray(Z[:3, :3])))
                t = Z[:3, 3]
                f.write(
                    f"EDGE_SE3:QUAT {li[s]} {lj[s]} {t[0]} {t[1]} {t[2]} "
                    f"{q[1]} {q[2]} {q[3]} {q[0]} {info}\n"
                )
