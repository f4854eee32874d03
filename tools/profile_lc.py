"""Attribute the on-device loop-detection cost inside the SLAM scan.

Runs the LC scan step (ORB -> vocab descent -> db L1 query -> db add) in
isolation over a stacked sequence, as one lax.scan, and ablates stages to
difference out per-stage cost.  Same methodology as tools/profile_scan.py
(host per-stage timing is useless over the dev TPU tunnel).
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
from ros_stereo_slam_tpu.ops import orb as orb_mod

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 64

cfg = preset_loop_closure().replace(
    loop=dataclasses.replace(LoopClosureConfig(), db_capacity=512)
)
world = SyntheticWorld(camera=cfg.camera, n_frames=N_FRAMES, seed=11,
                       half_w=18.0)
frames = [world.render(i)[0] for i in range(N_FRAMES)]
L = jax.device_put(jnp.asarray(np.stack(frames), jnp.float32))
jax.block_until_ready(L)

print("[profile_lc] training small vocab...", file=sys.stderr)
descs = []
for i in range(0, N_FRAMES, 8):
    f = orb_mod.detect_and_compute(L[i], cfg.loop.orb_features,
                                   n_levels=cfg.loop.orb_levels)
    v = np.asarray(f.valid)
    descs.append(np.asarray(f.desc_sign)[v])
voc = vocab_mod.train_batched(np.concatenate(descs), k=cfg.loop.vocab_k,
                              levels=cfg.loop.vocab_levels)
centers = tuple(voc.centers)
idf = jnp.asarray(voc.idf)


@partial(jax.jit, static_argnames=("cfg", "vocab_k", "stage"))
def scan_lc(left_seq, lc, centers, idf, cfg, vocab_k, stage):
    def body(lcs, xs):
        left, fid = xs
        if stage == "full":
            lcs, stats = slam_scan._lc_scan_step(
                lcs, left, fid, centers, idf, cfg, vocab_k)
            return lcs, stats.ns
        lcc = cfg.loop
        n_words = idf.shape[0]
        if stage == "orb_only":
            feats = orb_mod.detect_and_compute(
                left, lcc.orb_features, cfg.frontend.fast_thresh / 255.0)
            return lcs, jnp.sum(feats.desc_sign[0, 0])
        if stage == "orb_descend":
            feats = orb_mod.detect_and_compute(
                left, lcc.orb_features, cfg.frontend.fast_thresh / 255.0)
            words = vocab_mod._descend(
                list(centers), feats.desc_sign, vocab_k, len(centers))
            uw, uv = vocab_mod.bow_sparse(words, feats.valid, idf, n_words)
            return lcs, jnp.sum(uv)
        if stage == "orb_descend_query":
            feats = orb_mod.detect_and_compute(
                left, lcc.orb_features, cfg.frontend.fast_thresh / 255.0)
            words = vocab_mod._descend(
                list(centers), feats.desc_sign, vocab_k, len(centers))
            uw, uv = vocab_mod.bow_sparse(words, feats.valid, idf, n_words)
            q_dense = vocab_mod.dense_of_sparse(uw, uv, n_words)
            s = vocab_mod.score_db_sparse(q_dense, lcs.db_words, lcs.db_wvals)
            top_scores, top_idx = lax.top_k(s, lcc.max_db_results)
            return lcs, jnp.sum(top_scores)
        raise ValueError(stage)

    fids = jnp.arange(left_seq.shape[0], dtype=jnp.int32)
    return lax.scan(body, lc, (left_seq, fids))


def time_stage(stage, reps=3):
    lc0 = slam_scan.init_lc_state(cfg, voc.n_words)
    out = scan_lc(L, lc0, centers, idf, cfg, voc.k, stage)
    np.asarray(jax.tree_util.tree_leaves(out[1])[0])
    dt = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = scan_lc(L, lc0, centers, idf, cfg, voc.k, stage)
        np.asarray(jax.tree_util.tree_leaves(out[1])[0])
        dt = min(dt, time.perf_counter() - t0)
    ms = dt / N_FRAMES * 1e3
    print(f"{stage:20s}: {ms:7.3f} ms/frame")
    return ms


base = time_stage("orb_only")
for s in ["orb_descend", "orb_descend_query", "full"]:
    ms = time_stage(s)
    print(f"{'':20s}  delta vs orb_only {ms - base:+7.3f} ms/frame")
