#!/usr/bin/env python
"""Distributed BA / PGO scaling benchmark (BASELINE.md targets).

Measures:
- BA Gauss-Newton iterations/s, single-device vs landmark-sharded over an
  N-device mesh (``parallel/dist_ba.py``: local Schur elimination + psum
  of the reduced camera system — SURVEY.md §2 'Distributed BA');
- PGO iterations/s on a long pose chain, single vs edge-sharded mesh;
- WEAK-scaling efficiency: per-device problem size held constant while
  devices grow, so perfect scaling = flat wall time (efficiency
  t_1 / t_N).

Hardware note: with one real TPU chip, multi-device runs use a virtual
CPU host mesh (``--xla_force_host_platform_device_count``). Virtual
devices share the same host cores, so CPU "efficiency" bounds collective
overhead rather than demonstrating ICI speedup; the same code path runs
unchanged on a real multi-chip mesh (driver's ``dryrun_multichip``).

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--platform", type=str, default="cpu",
                    help="cpu uses a virtual mesh; tpu needs real chips")
    ap.add_argument("--landmarks-per-device", type=int, default=4096)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024,
                    help="pose-chain length for the PGO benchmark")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from ros_stereo_slam_tpu.models import bundle_adjust as ba
    from ros_stereo_slam_tpu.parallel import dist_ba, dist_pgo
    from ros_stereo_slam_tpu.utils import lie
    from ros_stereo_slam_tpu.utils.camera import Pinhole

    n_dev = min(args.devices, len(jax.devices()))
    cam = Pinhole(fx=jnp.float32(718.856), fy=jnp.float32(718.856),
                  cx=jnp.float32(607.19), cy=jnp.float32(185.22))

    def make_ba_problem(n_landmarks: int, seed: int = 0):
        """Consistent synthetic window: noisy poses + noisy observations
        of true landmarks (a realistic, convergent BA problem)."""
        rng = np.random.default_rng(seed)
        W = args.window
        X = np.stack([
            rng.uniform(-30, 30, n_landmarks),
            rng.uniform(-5, 5, n_landmarks),
            rng.uniform(8, 80, n_landmarks),
        ], 1).astype(np.float32)
        T = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
        T[:, 2, 3] = -0.8 * np.arange(W)  # cam-from-world: forward motion
        obs = np.zeros((W, n_landmarks, 2), np.float32)
        for w in range(W):
            p = X @ T[w, :3, :3].T + T[w, :3, 3]
            z = np.maximum(p[:, 2], 0.1)
            obs[w, :, 0] = p[:, 0] / z * 718.856 + 607.19
            obs[w, :, 1] = p[:, 1] / z * 718.856 + 185.22
        obs += rng.normal(0, 0.3, obs.shape).astype(np.float32)
        mask = (obs[..., 0] > 0) & (obs[..., 0] < 1241) & \
               (obs[..., 1] > 0) & (obs[..., 1] < 376)
        # perturb initial state
        T_init = T.copy()
        T_init[2:, :3, 3] += rng.normal(0, 0.05, (W - 2, 3)).astype(np.float32)
        X_init = X + rng.normal(0, 0.2, X.shape).astype(np.float32)
        fixed = np.zeros((W,), bool)
        fixed[:2] = True
        return (jnp.asarray(T_init), jnp.asarray(X_init), jnp.asarray(obs),
                jnp.asarray(mask), jnp.asarray(fixed))

    def force(out):
        # device->host copies cannot complete before the computation does;
        # block_until_ready alone is unreliable over the dev TPU tunnel.
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
        )

    def sync(out):
        # Synchronize on ONE small leaf: a device->host copy cannot
        # complete before the computation it depends on does, and every
        # returned leaf comes out of the same XLA program, so one transfer
        # is a full barrier.  Transferring EVERY leaf (force) pays a
        # per-array tunnel round-trip (~30 ms each on the dev TPU tunnel)
        # that would be billed to the solve.
        leaves = jax.tree_util.tree_leaves(out)
        np.asarray(min(leaves, key=lambda x: getattr(x, "size", 1 << 60)))

    def time_it(fn, *a, reps=3, **kw):
        force(fn(*a, **kw))  # compile + one full materialization
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best, force(out)

    results = []

    # ---- BA: the SAME total problem, single-device vs sharded ----
    # On a virtual CPU mesh the devices share host cores, so the ideal
    # sharded/single wall-time ratio is 1.0; the measured ratio therefore
    # isolates partition + collective overhead.  On a real multi-chip mesh
    # the same code path gains ~n_dev x on the landmark-linear stages.
    n_total = args.landmarks_per_device * max(n_dev, 1)
    prob = make_ba_problem(n_total)
    t1, res1 = time_it(
        lambda *p: ba.ba_solve(cam, *p, iters=args.iters), *prob
    )
    results.append({
        "metric": "ba_gn_iters_per_sec", "devices": 1,
        "landmarks": n_total, "window": args.window,
        "value": round(args.iters / t1, 2), "unit": "iters/s",
        "rms_before": float(res1.rms_before), "rms_after": float(res1.rms_after),
        "platform": jax.devices()[0].platform,
    })

    if n_dev > 1:
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
        tN, resN = time_it(
            lambda *p: dist_ba.ba_solve_sharded(mesh, cam, *p, iters=args.iters),
            *prob,
        )
        results.append({
            "metric": "ba_gn_iters_per_sec", "devices": n_dev,
            "landmarks": n_total, "window": args.window,
            "value": round(args.iters / tN, 2), "unit": "iters/s",
            "sharded_vs_single_ratio": round(t1 / tN, 3),
            "note": "virtual CPU mesh: ideal ratio 1.0 (shared cores); "
                    "measures collective overhead only",
            "rms_after": float(resN.rms_after),
            "platform": jax.devices()[0].platform,
        })

    # ---- PGO: chain relaxation, single vs sharded ----
    F = args.frames
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:, 2, 3] = 0.8 * np.arange(F)
    poses[:, 0, 3] = np.random.default_rng(2).normal(0, 0.1, F)
    odo_Z = jnp.tile(
        jnp.asarray(lie.make_se3(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.8]))),
        (F, 1, 1),
    )
    L = 8
    loop_i = jnp.zeros((L,), jnp.int32).at[0].set(F - 2)
    loop_j = jnp.zeros((L,), jnp.int32)
    loop_Z = jnp.tile(jnp.eye(4, dtype=jnp.float32), (L, 1, 1))
    loop_valid = jnp.zeros((L,), bool).at[0].set(True)

    if n_dev > 1:
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
        tp, _ = time_it(
            lambda: dist_pgo.optimize_sharded(
                mesh, jnp.asarray(poses), jnp.int32(F - 1), odo_Z,
                loop_i, loop_j, loop_Z, loop_valid,
                iters=args.iters, cg_iters=32,
            )
        )
        results.append({
            "metric": "pgo_gn_iters_per_sec", "devices": n_dev,
            "poses": F, "value": round(args.iters / tp, 2),
            "unit": "iters/s", "platform": jax.devices()[0].platform,
        })

    for row in results:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
