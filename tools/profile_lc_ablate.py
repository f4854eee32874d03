"""Ablate stages INSIDE the full detection step (in-scan slope method).

profile_lc_micro measures stages in isolation, where XLA fuses them
differently than in the full `_lc_scan_step` — its component numbers do
not sum to the full-step cost.  This tool instead re-runs the FULL step
with one stage stubbed at a time; the delta vs the unmodified step is
that stage's true in-context cost.

Usage: python tools/profile_lc_ablate.py
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

N = 16
R = 24
DB_CAP = 4096

cfg = preset_loop_closure().replace(
    loop=dataclasses.replace(LoopClosureConfig(), db_capacity=DB_CAP)
)
lcc = cfg.loop
world = SyntheticWorld(camera=cfg.camera, n_frames=N + 1, seed=11,
                       half_w=18.0)
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
# production (run_sequence_slam) prepares the deep tables OUTSIDE the
# scan; mirror that here or the Pallas descent pads 136 MB per step
centers = vocab_mod.prepare_centers_for_scan(tuple(voc.centers), voc.k)
idf = jnp.asarray(voc.idf)
n_words = voc.n_words


def step_ablated(lc, left_img, frame_id, ablate: str):
    """_lc_scan_step with one stage stubbed (mirrors slam_scan)."""
    nf = lcc.orb_features
    if ablate == "orb":
        feats = orb_mod.OrbFeatures(
            pts=jnp.zeros((nf, 2)) + 64.0,
            angle=jnp.zeros((nf,)),
            desc_bits=jnp.zeros((nf, orb_mod.N_BITS // 32), jnp.uint32),
            desc_sign=jnp.sign(jnp.sin(
                jnp.arange(nf * 256, dtype=jnp.float32).reshape(nf, 256)
                + frame_id)),
            valid=jnp.ones((nf,), bool),
            octave=jnp.zeros((nf,), jnp.int32),
        )
    else:
        feats = orb_mod.detect_and_compute(
            left_img, nf, cfg.frontend.fast_thresh / 255.0,
            n_levels=lcc.orb_levels,
        )
    if ablate == "descend":
        words = (jnp.arange(nf, dtype=jnp.int32) * 977
                 + frame_id.astype(jnp.int32)) % n_words
    else:
        words = vocab_mod._descend(
            list(centers), feats.desc_sign, voc.k, len(centers)
        )
    uw, uv = vocab_mod.bow_sparse(words, feats.valid, idf, n_words)
    q_bins = vocab_mod.bin_of_sparse(uw, uv, lcc.n_bins)
    ns = vocab_mod.score_pair_min(uw, uv, lc.last_words, lc.last_wvals)
    if ablate == "query":
        k_top = slam_scan._top_k_count(lcc)
        top_scores = jnp.zeros((k_top,)) + ns
        top_ids = jnp.zeros((k_top,), jnp.int32)
    else:
        sdot = vocab_mod.score_db_binned(q_bins, lc.db_bins)
        ok = lc.db_valid & (lc.db_ids <= frame_id - lcc.dislocal - 1)
        sdot = jnp.where(ok, sdot, -1e9)
        C = min(lcc.shortlist, lcc.db_capacity)
        sl_scores, sl_idx = lax.top_k(sdot, C)
        s_ex = vocab_mod.rescore_min(
            uw, uv, lc.db_words[sl_idx], lc.db_wvals[sl_idx]
        )
        s_ex = jnp.where(sl_scores > -1e8, s_ex, -1e9)
        top_scores, ti = lax.top_k(s_ex, slam_scan._top_k_count(lcc))
        top_ids = jnp.where(top_scores > -1e8, lc.db_ids[sl_idx[ti]], -1)

    slot = frame_id % lcc.db_capacity
    if ablate != "insert":
        lc = lc._replace(
            db_words=lc.db_words.at[slot].set(uw),
            db_wvals=lc.db_wvals.at[slot].set(uv),
            db_bins=lc.db_bins.at[slot].set(q_bins.astype(jnp.bfloat16)),
            db_bits=lc.db_bits.at[slot].set(feats.desc_bits),
            db_pts=lc.db_pts.at[slot].set(feats.pts),
            db_pt_valid=lc.db_pt_valid.at[slot].set(feats.valid),
            db_valid=lc.db_valid.at[slot].set(True),
            db_ids=lc.db_ids.at[slot].set(frame_id),
            last_words=uw, last_wvals=uv,
            have_last=jnp.ones((), bool),
        )
    return lc, (top_ids, top_scores, ns)


@partial(jax.jit, static_argnames=("reps", "ablate"))
def run_reps(lc, imgs, reps: int, ablate: str):
    def body(c, i):
        lc = c
        img = imgs[i % imgs.shape[0]]
        lc, stats = step_ablated(lc, img, i + 1, ablate)
        return lc, stats[1][0]

    lc, out = lax.scan(body, lc, jnp.arange(reps, dtype=jnp.int32))
    return out


lc0 = slam_scan.init_lc_state(cfg, n_words)


def slope(ablate):
    fs = partial(run_reps, lc0, L, reps=8, ablate=ablate)
    fb = partial(run_reps, lc0, L, reps=8 + R, ablate=ablate)
    np.asarray(fs()); np.asarray(fb())
    ts = []
    for f in (fs, fb):
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / R * 1e3


full = slope("none")
print(f"{'full step':28s}: {full:7.3f} ms/iter")
for ab in ("orb", "descend", "query", "insert"):
    d = slope(ab)
    print(f"{'without ' + ab:28s}: {d:7.3f} ms/iter   "
          f"(stage cost ~{full - d:6.3f} ms)")
