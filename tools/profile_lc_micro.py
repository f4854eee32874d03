"""Micro-profile the on-device loop-detection stage (slam_scan._lc_scan_step).

The dev TPU tunnel adds ~40 ms per dispatch, so each stage is repeated
inside ONE lax.scan dispatch over the staged frames and the per-iteration
cost is the (large-R minus small-R) slope — dispatch latency cancels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ros_stereo_slam_tpu.config import LoopClosureConfig, preset_loop_closure
from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
from ros_stereo_slam_tpu.models import slam_scan, vocab as vocab_mod
from ros_stereo_slam_tpu.ops import anms, fast as fast_mod, interp, orb as orb_mod

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 16
DB_CAP = int(os.environ.get("DB_CAP", "512"))
cfg = preset_loop_closure().replace(
    loop=dataclasses.replace(LoopClosureConfig(), db_capacity=DB_CAP)
)
lcc = cfg.loop
world = SyntheticWorld(camera=cfg.camera, n_frames=N + 1, seed=11, half_w=18.0)
fr = [world.render(i) for i in range(N + 1)]
L = jax.device_put(jnp.asarray(np.stack([f[0] for f in fr]), jnp.float32))
jax.block_until_ready(L)

descs = []
for i in range(0, N + 1, 8):
    f = orb_mod.detect_and_compute(L[i], lcc.orb_features,
                                   n_levels=lcc.orb_levels)
    v = np.asarray(f.valid)
    descs.append(np.asarray(f.desc_sign)[v])
voc = vocab_mod.train_batched(np.concatenate(descs), k=lcc.vocab_k,
                              levels=lcc.vocab_levels)
centers = tuple(voc.centers)
idf = jnp.asarray(voc.idf)
lc0 = slam_scan.init_lc_state(cfg, voc.n_words)
# Reuse the module-level jit wrapper (a fresh jax.jit object would
# recompile the frame-0 step, ~35 s on TPU).
lc1, _ = slam_scan._lc_scan_step_jit(
    lc0, L[0], jnp.int32(0), centers, idf, cfg, voc.k
)
jax.block_until_ready(lc1.db_wvals)

feats0 = orb_mod.detect_and_compute(L[1], lcc.orb_features,
                                    n_levels=lcc.orb_levels)
jax.block_until_ready(feats0.desc_sign)


def slope(label, make_fn):
    """make_fn(reps) -> jitted zero-arg callable running reps iterations."""
    f_small, f_big = make_fn(4), make_fn(4 + R)
    f_small(); f_big()  # compile both
    ts = []
    for f in (f_small, f_big):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / R * 1e3
    print(f"{label:44s}: {per:8.3f} ms/iter")


def mk_full(reps):
    @jax.jit
    def run():
        def body(lc, i):
            lc, st = slam_scan._lc_scan_step(
                lc, L[i % N + 1], i + 1, centers, idf, cfg, voc.k
            )
            return lc, st.top_scores[0]
        _, out = lax.scan(body, lc1, jnp.arange(reps))
        return out
    return run


def mk_fullcond(reps):
    """The production stride-2 shape: _lc_scan_step under lax.cond on
    alternating iterations.  If (fullcond - full/2) is materially above
    the null branch's cost, the cond is copying the big db carry."""
    @jax.jit
    def run():
        def body(lc, i):
            lc, st = lax.cond(
                i % 2 == 0,
                lambda l: slam_scan._lc_scan_step(
                    l, L[i % N + 1], i + 1, centers, idf, cfg, voc.k
                ),
                lambda l: (l, slam_scan._null_stats(cfg)),
                lc,
            )
            return lc, st.top_scores[0]
        _, out = lax.scan(body, lc1, jnp.arange(reps))
        return out
    return run


def mk_orb(reps):
    # n_levels matters: the production step runs the multi-scale pyramid
    # (4 levels @1.25) — a single-level measurement here misattributed
    # ~1.2 ms of multi-scale cost to "insert + gates residue" in round 2.
    @jax.jit
    def run():
        def body(c, i):
            f = orb_mod.detect_and_compute(
                L[i % N + 1], lcc.orb_features,
                cfg.frontend.fast_thresh / 255.0, n_levels=lcc.orb_levels,
            )
            return c + f.desc_sign[0, 0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_orb1(reps):
    @jax.jit
    def run():
        def body(c, i):
            f = orb_mod.detect_and_compute(
                L[i % N + 1], lcc.orb_features,
                cfg.frontend.fast_thresh / 255.0, n_levels=1,
            )
            return c + f.desc_sign[0, 0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_fast(reps):
    @jax.jit
    def run():
        def body(c, i):
            score = fast_mod.fast_score(
                L[i % N + 1], cfg.frontend.fast_thresh / 255.0
            )
            p, s, m = fast_mod.top_corners(score, 4 * lcc.orb_features)
            return c + p[0, 0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_fastscore(reps):
    @jax.jit
    def run():
        def body(c, i):
            score = fast_mod.fast_score(
                L[i % N + 1], cfg.frontend.fast_thresh / 255.0
            )
            return c + score[50, 50], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_anms(reps):
    @jax.jit
    def run():
        def body(c, i):
            # i-dependent input: candidates from the i-th frame, so XLA
            # cannot hoist the stage out of the scan (ADVICE round 1: a
            # `+ c * 0` fake dependency is algebraically foldable).
            score = fast_mod.fast_score(
                L[i % N + 1], cfg.frontend.fast_thresh / 255.0
            )
            cp, cs, cm = fast_mod.top_corners(score, 4 * lcc.orb_features)
            p, v = anms.anms(cp, cs, cm, lcc.orb_features)
            return c + p[0, 0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_query(reps):
    n_words = idf.shape[0]
    # Pre-extract per-frame descriptors so the stage input varies with i
    # (i-dependent data defeats hoisting without foldable tricks).
    fs = [orb_mod.detect_and_compute(L[j + 1], lcc.orb_features,
                                     n_levels=lcc.orb_levels)
          for j in range(min(N, 4))]
    signs = jnp.stack([f.desc_sign for f in fs])
    valids = jnp.stack([f.valid for f in fs])

    @jax.jit
    def run():
        def body(c, i):
            words = vocab_mod._descend(
                list(centers), signs[i % signs.shape[0]], voc.k, len(centers)
            )
            uw, uv = vocab_mod.bow_sparse(
                words, valids[i % signs.shape[0]], idf, n_words
            )
            q_dense = vocab_mod.dense_of_sparse(uw, uv, n_words)
            s = vocab_mod.score_db_sparse(q_dense, lc1.db_words, lc1.db_wvals)
            ts, ti = lax.top_k(s, lcc.max_db_results)
            return c + ts[0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def _query_inputs():
    fs = [orb_mod.detect_and_compute(L[j + 1], lcc.orb_features,
                                     n_levels=lcc.orb_levels)
          for j in range(min(N, 4))]
    signs = jnp.stack([f.desc_sign for f in fs])
    valids = jnp.stack([f.valid for f in fs])
    words = jnp.stack([
        vocab_mod._descend(list(centers), s, voc.k, len(centers))
        for s in signs
    ])
    n_words = idf.shape[0]
    uws, uvs = [], []
    for j in range(words.shape[0]):
        uw, uv = vocab_mod.bow_sparse(words[j], valids[j], idf, n_words)
        uws.append(uw)
        uvs.append(uv)
    return signs, valids, words, jnp.stack(uws), jnp.stack(uvs)


def mk_descend(reps):
    signs, valids, _, _, _ = _query_inputs()

    @jax.jit
    def run():
        def body(c, i):
            w = vocab_mod._descend(
                list(centers), signs[i % signs.shape[0]], voc.k, len(centers)
            )
            return c + w[0], 0.0
        c, _ = lax.scan(body, jnp.int32(0), jnp.arange(reps))
        return c
    return run


def mk_bow(reps):
    _, valids, words, _, _ = _query_inputs()
    n_words = idf.shape[0]

    @jax.jit
    def run():
        def body(c, i):
            uw, uv = vocab_mod.bow_sparse(
                words[i % words.shape[0]], valids[i % words.shape[0]],
                idf, n_words
            )
            return c + uv[0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_score(reps):
    _, _, _, uws, uvs = _query_inputs()
    n_words = idf.shape[0]

    @jax.jit
    def run():
        def body(c, i):
            j = i % uws.shape[0]
            q_dense = vocab_mod.dense_of_sparse(uws[j], uvs[j], n_words)
            s = vocab_mod.score_db_sparse(q_dense, lc1.db_words, lc1.db_wvals)
            return c + s[0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_topk(reps):
    _, _, _, uws, uvs = _query_inputs()
    n_words = idf.shape[0]
    q_dense = vocab_mod.dense_of_sparse(uws[0], uvs[0], n_words)
    s0 = vocab_mod.score_db_sparse(q_dense, lc1.db_words, lc1.db_wvals)

    @jax.jit
    def run():
        def body(c, i):
            ts, ti = lax.top_k(s0 + c, lcc.max_db_results)
            return c + ts[0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_query_binned(reps):
    """The production two-stage query: binned MXU matvec shortlist +
    exact min-intersection rescore (replaces mk_query's dense path)."""
    _, _, _, uws, uvs = _query_inputs()

    @jax.jit
    def run():
        def body(c, i):
            j = i % uws.shape[0]
            q_bins = vocab_mod.bin_of_sparse(uws[j], uvs[j], lcc.n_bins)
            sdot = vocab_mod.score_db_binned(q_bins, lc1.db_bins)
            C = min(lcc.shortlist, lcc.db_capacity)
            sl_scores, sl_idx = lax.top_k(sdot, C)
            s_ex = vocab_mod.rescore_min(
                uws[j], uvs[j], lc1.db_words[sl_idx], lc1.db_wvals[sl_idx]
            )
            ts, ti = lax.top_k(s_ex, min(lcc.max_db_results, C))
            return c + ts[0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


def mk_insert(reps):
    """Ring insert alone: write one frame's payload into the db carry.
    Isolates the '.at[slot].set' cost over the ~100 MB database state
    (the r2 'db insert + gates residue' bucket)."""
    _, _, _, uws, uvs = _query_inputs()
    q_bins = vocab_mod.bin_of_sparse(uws[0], uvs[0], lcc.n_bins)
    bits, pts, pv = feats0.desc_bits, feats0.pts, feats0.valid

    @jax.jit
    def run():
        def body(lc, i):
            slot = i % lcc.db_capacity
            j = i % uws.shape[0]
            lc = lc._replace(
                db_words=lc.db_words.at[slot].set(uws[j]),
                db_wvals=lc.db_wvals.at[slot].set(uvs[j]),
                db_bins=lc.db_bins.at[slot].set(q_bins.astype(jnp.bfloat16)),
                db_bits=lc.db_bits.at[slot].set(bits),
                db_pts=lc.db_pts.at[slot].set(pts),
                db_pt_valid=lc.db_pt_valid.at[slot].set(pv),
                db_valid=lc.db_valid.at[slot].set(True),
                db_ids=lc.db_ids.at[slot].set(i),
            )
            return lc, uvs[j, 0]
        lc, out = lax.scan(body, lc1, jnp.arange(reps))
        return out
    return run


def mk_query_exact(reps):
    """Shortlist gather + exact rescore only (the db_words[sl_idx] gather
    plus the (C, nf, nf) equality reduction)."""
    _, _, _, uws, uvs = _query_inputs()
    q_bins = vocab_mod.bin_of_sparse(uws[0], uvs[0], lcc.n_bins)
    sdot = vocab_mod.score_db_binned(q_bins, lc1.db_bins)
    C = min(lcc.shortlist, lcc.db_capacity)
    _, sl_idx0 = lax.top_k(sdot, C)

    @jax.jit
    def run():
        def body(c, i):
            j = i % uws.shape[0]
            s_ex = vocab_mod.rescore_min(
                uws[j], uvs[j], lc1.db_words[(sl_idx0 + i) % lcc.db_capacity],
                lc1.db_wvals[(sl_idx0 + i) % lcc.db_capacity],
            )
            return c + s_ex[0], 0.0
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c
    return run


STAGES = {
    "full": lambda: slope("full _lc_scan_step", mk_full),
    "fullcond": lambda: slope("stride-2 lax.cond(_lc_scan_step)", mk_fullcond),
    "insert": lambda: slope("db ring insert (all fields)", mk_insert),
    "qexact": lambda: slope("shortlist gather + exact rescore", mk_query_exact),
    "qbinned": lambda: slope("binned query (matvec+rescore)", mk_query_binned),
    "descend": lambda: slope("  vocab descend (6 levels)", mk_descend),
    "bow": lambda: slope("  bow_sparse (argsort+scatter)", mk_bow),
    "score": lambda: slope("  dense scatter + db gather-min-sum", mk_score),
    "topk": lambda: slope("  top_k(db_cap, max_db_results)", mk_topk),
    "orb": lambda: slope("orb.detect_and_compute (multi-scale)", mk_orb),
    "orb1": lambda: slope("orb.detect_and_compute (1 level)", mk_orb1),
    "fastscore": lambda: slope("  FAST score only", mk_fastscore),
    "fast": lambda: slope("  FAST score + top_corners", mk_fast),
    "anms": lambda: slope("  ANMS (4*nf candidates)", mk_anms),
    "query": lambda: slope("descend + sparse bow + db score + top_k",
                           mk_query),
}
sel = os.environ.get("STAGES")
for name, fn in STAGES.items():
    if sel is None or name in sel.split(","):
        fn()
