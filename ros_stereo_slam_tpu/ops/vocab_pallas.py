"""Pallas TPU kernel for the DEEP levels of the vocabulary descent.

The hierarchical BoW transform (reference C9/C10: DBoW2's k=9, L=6 tree,
``/root/reference/src/bagOfWordsDetector.cpp:21``) descends each ORB
descriptor through 6 levels of argmax-dot against k sibling centers.
Shallow levels score densely on the MXU (vocab._descend masked-argmax);
the two DEEP levels' tables (k=9: 15 MB and 136 MB of int8 sign rows)
live in HBM, and XLA lowers the per-descriptor (k, 256) sibling-block
gathers to serialized random-access loads — measured ~1.3 ms of the
2.26 ms detection step at 512 descriptors (tools/profile_lc_ablate.py).

This kernel replaces those gathers with explicit double-buffered DMAs.
Mosaic requires a DMA's dim-0 start to be PROVABLY 8-aligned, so each
descriptor copies the 16-row window starting at
``floor(node*k/8)*8`` — its k sibling rows sit at a scalar offset
0..7 inside it — and the tables carry a one-time 8..23-row tail pad
(:func:`pad_table`) so the last groups' windows stay in bounds.  The
pad MUST run outside any ``lax.scan`` (vocab.prepare_centers_for_scan):
a first version padded per scan step, copying 136 MB every frame and
costing more than the gathers it replaced.  An (NBUF-1)-deep look-ahead
keeps the next descriptors' windows in flight under the current
descriptor's compute — one (16, 256) multiply, a row-sum, and a
windowed first-max per descriptor (VPU work, no gathers); a level's N
DMAs pipeline freely since dependencies only exist ACROSS levels.

Numerics: centers and descriptors are {-1, +1} sign vectors, so every
dot is an integer |.| <= 256 — exact in f32 AND bf16.  The argmax is an
explicit FIRST-max (max, then min index attaining it): Mosaic's argmax
reduction breaks exact ties by LAST index while XLA's takes the first,
and sign-vector dots tie often (measured 50/512 divergences from tie
order alone) — with it the kernel is bit-identical to the gather path
(tests/test_vocab_pallas.py + the TPU parity check in PARITY.md).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ros_stereo_slam_tpu.ops.orb import N_BITS

_NBUF = 8  # DMA pipeline depth
_BLK = 16  # DMA window rows (8-aligned start + k live rows fit: k <= 9)
# Max points per kernel call: the (N, 256) f32 query block lives whole
# in VMEM, so N is capped at 8 MB against the 16 MB scoped-VMEM limit;
# deep_descend chunks larger calls (the vocab trainer's all-descriptor
# transform) exactly.
_N_CAP = 8192


def padded_rows(G: int, k: int) -> int:
    """Row count of a padded deep table (strictly > G, window-safe)."""
    n = (max(G - k, 0) // 8) * 8 + _BLK
    while n <= G:
        n += 8
    return n


def pad_table(t: jnp.ndarray, k: int) -> jnp.ndarray:
    """One-time zero tail-pad so every 8-aligned 16-row window starting
    at floor(node*k/8)*8 is in bounds.  Call OUTSIDE lax.scan."""
    return jnp.pad(t, ((0, padded_rows(t.shape[0], k) - t.shape[0]),
                       (0, 0)))


def _deep_descend_kernel(
    node_ref, q_ref, *rest, k: int, n_pts: int, n_levels: int,
):
    """rest = (tbl_ref_0 .. tbl_ref_{n_levels-1}, out_ref, scratch, sems).

    node_ref: (N,) i32 SMEM — entry node ids at the first deep level.
    q_ref: (N, 256) f32 VMEM — descriptor sign vectors.
    tbl_ref_l: (padded G_l, 256) i8 HBM — center sign rows (row g =
    node g; zero tail padding per :func:`pad_table`).
    out_ref: (N,) i32 SMEM — final node ids (also the working state).
    scratch: (NBUF, BLK, 256) i8 VMEM; sems: (NBUF,) DMA semaphores.
    """
    tbl_refs = rest[:n_levels]
    out_ref, scratch, sems = rest[n_levels:]
    row = lax.broadcasted_iota(jnp.int32, (_BLK, 1), 0)

    def copy_in(i, _):
        out_ref[i] = node_ref[i]
        return 0

    lax.fori_loop(0, n_pts, copy_in, 0)

    # Look-ahead of NBUF-1 (not NBUF): descriptor i+look lands in slot
    # (i-1) % NBUF — the slot consumed in the PREVIOUS iteration, never
    # the one being read right now (restarting the current slot in the
    # same iteration would race the engine's write against this
    # iteration's VMEM reads — an anti-dependency Mosaic doesn't order).
    look = _NBUF - 1
    for lvl in range(n_levels):  # static unroll: 1-2 deep levels
        tref = tbl_refs[lvl]

        def win_start(i):
            return pl.multiple_of((out_ref[i] * k // 8) * 8, 8)

        def get_dma(slot, i, tref=tref):
            return pltpu.make_async_copy(
                tref.at[pl.ds(win_start(i), _BLK), :],
                scratch.at[slot],
                sems.at[slot],
            )

        for w in range(min(look, n_pts)):  # warmup
            get_dma(w % _NBUF, w).start()

        def body(i, _, tref=tref):
            slot = lax.rem(i, _NBUF)
            get_dma(slot, i, tref).wait()
            off = out_ref[i] * k - win_start(i)  # 0..7 scalar
            qrow = q_ref[pl.ds(i, 1), :]  # (1, 256) f32
            prod = scratch[slot].astype(jnp.float32) * qrow  # (BLK, 256)
            sums = jnp.sum(prod, axis=1, keepdims=True)  # (BLK, 1)
            live = (row >= off) & (row < off + k)
            sums = jnp.where(live, sums, -jnp.inf)
            # FIRST-max argmax (see module docstring numerics note)
            m = jnp.max(sums)
            best = (jnp.min(jnp.where(sums == m, row, _BLK))
                    - off).astype(jnp.int32)

            @pl.when(i + look < n_pts)
            def _():
                get_dma(lax.rem(i + look, _NBUF), i + look).start()

            out_ref[i] = out_ref[i] * k + best
            return 0

        lax.fori_loop(0, n_pts, body, 0)


def _deep_descend_call(q, node, tabs, k: int, interpret: bool):
    n = q.shape[0]
    return pl.pallas_call(
        partial(_deep_descend_kernel, k=k, n_pts=n, n_levels=len(tabs)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY) for _ in tabs],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, _BLK, N_BITS), jnp.int8),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
        interpret=interpret,
    )(node, q, *tabs)


@lru_cache(maxsize=None)
def _cv_deep(k: int, interpret: bool):
    """custom_vmap wrapper: lanes FLATTEN into one kernel call.

    vmapping a pallas_call auto-prepends a grid dimension with blocked
    SMEM specs that Mosaic rejects for (B, N) scalar arrays — and would
    serialize lanes anyway.  Every descriptor carries its own node id
    and all lanes share the vocabulary, so a B-lane batch is just a
    (B*N)-descriptor problem: one kernel, one DMA pipeline across all
    lanes (the batched full-SLAM scan's detection step lands here).
    """

    @custom_vmap
    def f(q, node, *tabs):
        return _deep_descend_call(q, node, tabs, k, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, q, node, *tabs):
        if any(in_batched[2:]):
            raise NotImplementedError(
                "per-lane vocabularies are not supported (share one "
                "vocabulary across lanes)"
            )
        q2 = q if in_batched[0] else jnp.broadcast_to(
            q[None], (axis_size,) + q.shape)
        n2 = node if in_batched[1] else jnp.broadcast_to(
            node[None], (axis_size,) + node.shape)
        B, N = n2.shape
        out = f(q2.reshape(B * N, -1), n2.reshape(B * N), *tabs)
        return out.reshape(B, N), True

    return f


def deep_descend(
    q_sign: jnp.ndarray,  # (N, 256) f32/bf16 sign vectors
    node: jnp.ndarray,  # (N,) i32 entry node ids
    tables: tuple,  # per deep level: (G_l, 256) i8, G_l = k^(l+1)
    k: int,
    padded: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Descend `node` through the deep levels; returns final node ids.

    `padded=True` promises the tables already carry :func:`pad_table`'s
    tail rows (vocab.prepare_centers_for_scan does this once, outside
    the scan); otherwise they are padded here — fine standalone, but a
    per-step 136 MB copy if this call sits inside a ``lax.scan``.
    """
    assert k <= 9, "window math assumes k sibling rows fit behind an " \
        "8-aligned 16-row window (k <= 9)"
    tabs = tuple(tables) if padded else tuple(
        pad_table(jnp.asarray(t, jnp.int8), k) for t in tables
    )
    f = _cv_deep(k, interpret)
    q = q_sign.astype(jnp.float32)
    nd = node.astype(jnp.int32)
    n = q.shape[0]
    if n <= _N_CAP:
        return f(q, nd, *tabs)
    # Large-N callers (the vocabulary trainer transforms ALL training
    # descriptors in one call — tens of thousands of rows) exceed the
    # 16 MB scoped-VMEM limit through the (N, 256) f32 query block
    # (measured: N=31,360 wants 30.7 MB).  The kernel is elementwise
    # over points, so chunking is exact; per-frame scan callers (N<=512)
    # never take this path.
    return jnp.concatenate([
        f(q[s:s + _N_CAP], nd[s:s + _N_CAP], *tabs)
        for s in range(0, n, _N_CAP)
    ])
