"""Scan-mode full SLAM (config 3): loop-closure detection inside the scan.

The reference's frame loop runs ORB + DBoW2 transform + database query on
the host EVERY frame (``/root/reference/src/optimizationStuff.cpp:49-65``)
and blocks on g2o whenever a closure fires
(``src/VisualSLAM.cpp:76-86``).  TPU-native rewrite:

- **Detection is device work inside the scan.**  ORB (C9), the vocabulary
  descent, the sparse min-intersection database scoring and the top-K
  candidate extraction are all fixed-shape, so they fold into the same
  ``lax.scan`` step as odometry — a whole SLAM sequence stays ONE XLA
  dispatch.  The BoW database lives in the scan carry SPARSE: per frame,
  at most ``orb_features`` merged (word id, weight) pairs plus packed
  descriptors — ~100 MB at the full reference scale (k=9, L=6 = 531,441
  words, capacity 4096; ``src/bagOfWordsDetector.cpp:21``,
  ``include/visualSLAM.h:137``) where a dense BoW matrix would be ~8.7 GB.
- **Detection cadence is configurable** (``loop.detect_every``): the
  reference detects every frame only because its host loop is already
  slow; detecting every Nth frame drops the ORB+BoW cost to 1/N while the
  100-frame accept separation and the stride-aware temporal window keep
  recall (a ``lax.cond`` skips the whole detection branch on off frames —
  TPU executes only the taken branch).
- **The data-dependent tail is a post-scan epilogue.**  Island grouping,
  the temporal-consistency window, the driver accept rule
  (query − match > 100, cooldown 100: ``optimizationStuff.cpp:59-63``)
  replay the streaming gates via :class:`loop_closure.CandidateGater`
  (identical semantics); geometric verification batches over the few
  surviving candidates; ONE pose-graph optimization solves the full chain
  with all loop edges, then every keyframe cloud/pose is rewritten to the
  optimized trajectory (the reference's ``updateOdometry``,
  ``optimizationStuff.cpp:17-47``) so the exported map is consistent with
  the trajectory it ships with.  Deferred PGO is equivalent to the
  reference's per-closure re-optimize for an offline/mapping run — each
  of its closures re-optimizes and rewrites the ENTIRE trajectory anyway,
  so only the last solve survives.  (What deferral does change: frames
  between a closure and the sequence end keep TRACKING in the uncorrected
  frame — the streaming driver (slam.py) replicates the reference's
  immediate correction instead; the measured ATE delta between the two
  postures is documented in RESULTS.md.)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ros_stereo_slam_tpu.config import PipelineConfig
from ros_stereo_slam_tpu.models import loop_closure as lc_mod
from ros_stereo_slam_tpu.models import pose_graph as pg_mod
from ros_stereo_slam_tpu.models import step as step_mod
from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.ops import lk, orb as orb_mod, pnp, pyramid, triangulate
from ros_stereo_slam_tpu.utils import lie


class LCScanState(NamedTuple):
    """Device-resident sparse BoW database threaded through the scan carry."""

    db_words: jnp.ndarray  # (cap, nf) i32 merged word ids (0-padded)
    db_wvals: jnp.ndarray  # (cap, nf) f32 L1-normalized TF-IDF weights
    db_bins: jnp.ndarray  # (cap, n_bins) bf16 binned BoW (shortlist matvec)
    db_bits: jnp.ndarray  # (cap, nf, 8) u32 packed descriptors
    db_pts: jnp.ndarray  # (cap, nf, 2) f32
    db_pt_valid: jnp.ndarray  # (cap, nf) bool
    db_valid: jnp.ndarray  # (cap,) bool
    db_ids: jnp.ndarray  # (cap,) i32
    last_words: jnp.ndarray  # (nf,) i32 — previous detected frame's BoW
    last_wvals: jnp.ndarray  # (nf,) f32   (nss reference)
    have_last: jnp.ndarray  # () bool


class LCScanStats(NamedTuple):
    """Per-frame candidate shortlist emitted by the scan (host gates run
    on these after the dispatch)."""

    top_ids: jnp.ndarray  # (K,) i32 db frame ids (-1 padding)
    top_scores: jnp.ndarray  # (K,) f32 raw min-intersection scores
    ns: jnp.ndarray  # () f32 normalizing score vs previous frame


def init_lc_state(cfg: PipelineConfig, n_words: int) -> LCScanState:
    cap = cfg.loop.db_capacity
    nf = cfg.loop.orb_features
    return LCScanState(
        db_words=jnp.zeros((cap, nf), jnp.int32),
        db_wvals=jnp.zeros((cap, nf), jnp.float32),
        db_bins=jnp.zeros((cap, cfg.loop.n_bins), jnp.bfloat16),
        db_bits=jnp.zeros((cap, nf, orb_mod.N_BITS // 32), jnp.uint32),
        db_pts=jnp.zeros((cap, nf, 2), jnp.float32),
        db_pt_valid=jnp.zeros((cap, nf), bool),
        db_valid=jnp.zeros((cap,), bool),
        db_ids=jnp.full((cap,), -1, jnp.int32),
        last_words=jnp.zeros((nf,), jnp.int32),
        last_wvals=jnp.zeros((nf,), jnp.float32),
        have_last=jnp.zeros((), bool),
    )


def _bucket(n: int) -> int:
    """Pad batched-epilogue dispatch counts to powers of two so the
    number of surviving candidates doesn't trigger a recompile per run
    (one compilation per bucket size, paid once per process)."""
    b = 1
    while b < n:
        b *= 2
    return b


def _padded_fids(cands: list, P: int) -> tuple[np.ndarray, np.ndarray]:
    """(query, match) fid arrays bucket-padded to P with candidate 0
    (padding verdicts are computed but never read)."""
    pad = P - len(cands)
    q = np.array([q for q, _ in cands] + [cands[0][0]] * pad, np.int32)
    m = np.array([m for _, m in cands] + [cands[0][1]] * pad, np.int32)
    return q, m


def _top_k_count(lcc) -> int:
    """Top-K emitted per frame: can't exceed the shortlist or the db."""
    return min(lcc.max_db_results, lcc.shortlist, lcc.db_capacity)


def _null_stats(cfg: PipelineConfig) -> LCScanStats:
    k = _top_k_count(cfg.loop)
    return LCScanStats(
        top_ids=jnp.full((k,), -1, jnp.int32),
        top_scores=jnp.full((k,), -1e9, jnp.float32),
        ns=jnp.float32(-1.0),
    )


def _lc_scan_step(
    lc: LCScanState,
    left_img: jnp.ndarray,
    frame_id: jnp.ndarray,
    centers: tuple,
    idf: jnp.ndarray,
    cfg: PipelineConfig,
    vocab_k: int,
) -> tuple[LCScanState, LCScanStats]:
    """One frame of on-device detection: ORB -> sparse BoW -> query -> add."""
    if left_img.dtype == jnp.uint8:
        left_img = left_img.astype(jnp.float32) * (1.0 / 255.0)
    lcc = cfg.loop
    n_words = idf.shape[0]
    feats = orb_mod.detect_and_compute(
        left_img, lcc.orb_features, cfg.frontend.fast_thresh / 255.0,
        n_levels=lcc.orb_levels,
    )
    words = vocab_mod._descend(
        list(centers), feats.desc_sign, vocab_k, len(centers)
    )
    uw, uv = vocab_mod.bow_sparse(words, feats.valid, idf, n_words)
    q_bins = vocab_mod.bin_of_sparse(uw, uv, lcc.n_bins)

    ns = vocab_mod.score_pair_min(uw, uv, lc.last_words, lc.last_wvals)
    # Shortlist by binned MXU matvec, masked to entries dated
    # <= frame_id - dislocal - 1, then EXACT min-intersection rescore of
    # the shortlist — the gates see exact scores (see vocab.py).
    sdot = vocab_mod.score_db_binned(q_bins, lc.db_bins)
    ok = lc.db_valid & (lc.db_ids <= frame_id - lcc.dislocal - 1)
    sdot = jnp.where(ok, sdot, -1e9)
    C = min(lcc.shortlist, lcc.db_capacity)
    sl_scores, sl_idx = lax.top_k(sdot, C)
    s_ex = vocab_mod.rescore_min(
        uw, uv, lc.db_words[sl_idx], lc.db_wvals[sl_idx]
    )
    s_ex = jnp.where(sl_scores > -1e8, s_ex, -1e9)
    top_scores, ti = lax.top_k(s_ex, _top_k_count(lcc))
    top_ids = jnp.where(top_scores > -1e8, lc.db_ids[sl_idx[ti]], -1)

    slot = frame_id % lcc.db_capacity
    lc = lc._replace(
        db_words=lc.db_words.at[slot].set(uw),
        db_wvals=lc.db_wvals.at[slot].set(uv),
        db_bins=lc.db_bins.at[slot].set(q_bins.astype(jnp.bfloat16)),
        db_bits=lc.db_bits.at[slot].set(feats.desc_bits),
        db_pts=lc.db_pts.at[slot].set(feats.pts),
        db_pt_valid=lc.db_pt_valid.at[slot].set(feats.valid),
        db_valid=lc.db_valid.at[slot].set(True),
        db_ids=lc.db_ids.at[slot].set(frame_id),
        last_words=uw,
        last_wvals=uv,
        have_last=jnp.ones((), bool),
    )
    stats = LCScanStats(
        top_ids=top_ids,
        top_scores=top_scores,
        ns=jnp.where(lc.have_last, ns, jnp.float32(-1.0)),
    )
    return lc, stats


# Module-level jit wrapper (a fresh jax.jit(...) object per call would
# retrace AND recompile the frame-0 step on every run — ~35 s each on TPU).
_lc_scan_step_jit = partial(
    jax.jit, static_argnames=("cfg", "vocab_k")
)(_lc_scan_step)


def _lc_scan_step_lane(
    lc_b: LCScanState,  # batched state, (B, ...) leaves
    lane: int,  # STATIC lane index
    left_img: jnp.ndarray,  # (H, W) this lane's frame
    frame_id: jnp.ndarray,
    centers: tuple,
    idf: jnp.ndarray,
    cfg: PipelineConfig,
    vocab_k: int,
) -> tuple[LCScanState, LCScanStats]:
    """Run one LANE's detection step against the batched state.

    Used by the interleaved batched cadence (run_sequence_slam_batched):
    the lane index is STATIC, so every read is a slice of the scan carry
    (fused, no copy) and the writeback touches only the inserted ring
    ROW plus the small last-frame fields — XLA keeps the ~100 MB/lane
    database updates in place, where a gather -> update -> scatter of
    the whole lane state would copy it every frame.
    """
    sub = jax.tree.map(lambda x: x[lane], lc_b)
    new, stats = _lc_scan_step(
        sub, left_img, frame_id, centers, idf, cfg, vocab_k
    )
    slot = frame_id % cfg.loop.db_capacity
    lc_b = lc_b._replace(
        db_words=lc_b.db_words.at[lane, slot].set(new.db_words[slot]),
        db_wvals=lc_b.db_wvals.at[lane, slot].set(new.db_wvals[slot]),
        db_bins=lc_b.db_bins.at[lane, slot].set(new.db_bins[slot]),
        db_bits=lc_b.db_bits.at[lane, slot].set(new.db_bits[slot]),
        db_pts=lc_b.db_pts.at[lane, slot].set(new.db_pts[slot]),
        db_pt_valid=lc_b.db_pt_valid.at[lane, slot].set(
            new.db_pt_valid[slot]),
        db_valid=lc_b.db_valid.at[lane, slot].set(True),
        db_ids=lc_b.db_ids.at[lane, slot].set(frame_id),
        last_words=lc_b.last_words.at[lane].set(new.last_words),
        last_wvals=lc_b.last_wvals.at[lane].set(new.last_wvals),
        have_last=lc_b.have_last.at[lane].set(True),
    )
    return lc_b, stats


def lane_phase(lane: int, every: int) -> int:
    """Detection phase of a lane under the interleaved batched cadence:
    lane b detects on frames with ``fid % every == lane_phase(b, every)``
    (single-lane and non-interleaved runs use phase 0)."""
    return lane % max(every, 1)


@partial(jax.jit, static_argnames=("cfg", "vocab_k"))
def run_sequence_slam(
    left_seq: jnp.ndarray,
    right_seq: jnp.ndarray,
    carry: step_mod.SlamCarry,
    lc: LCScanState,
    grid_pts: jnp.ndarray,
    grid_mask: jnp.ndarray,
    centers: tuple,
    idf: jnp.ndarray,
    cfg: PipelineConfig,
    vocab_k: int,
    rgb_seq: jnp.ndarray | None = None,
    fid_start=1,
):
    """Odometry + on-device loop detection for a whole sequence: ONE scan.

    `fid_start`: global frame id of row 0 (traced scalar, so the chunked
    online driver reuses one compilation for every chunk position;
    defaults to 1 — frame 0 is the bootstrap).
    """
    # Deep-table pad for the Pallas descent, hoisted OUT of the scan
    # body (inside it the pad would copy 136 MB per frame).
    centers = vocab_mod.prepare_centers_for_scan(centers, vocab_k)
    every = max(cfg.loop.detect_every, 1)

    def body(c, xs):
        sc, lcs = c
        left, right, fid, rgb = (
            (*xs, None) if rgb_seq is None else xs
        )
        sc, fstats = step_mod.slam_frame_step(
            sc, left, right, grid_pts, grid_mask, cfg, left_rgb=rgb
        )
        # Note ordering quirk vs the scan stats: frame ids here are the
        # 1-based positions of left_seq rows (frame 0 is the bootstrap).
        if every == 1:
            lcs, lstats = _lc_scan_step(lcs, left, fid, centers, idf, cfg,
                                        vocab_k)
        else:
            lcs, lstats = lax.cond(
                fid % every == 0,
                lambda l: _lc_scan_step(l, left, fid, centers, idf, cfg,
                                        vocab_k),
                lambda l: (l, _null_stats(cfg)),
                lcs,
            )
        return (sc, lcs), (fstats, lstats)

    fids = jnp.int32(fid_start) + jnp.arange(
        left_seq.shape[0], dtype=jnp.int32
    )
    xs = (
        (left_seq, right_seq, fids) if rgb_seq is None
        else (left_seq, right_seq, fids, rgb_seq)
    )
    return lax.scan(body, (carry, lc), xs)


@partial(jax.jit, static_argnames=("cfg", "vocab_k", "interleave"))
def run_sequence_slam_batched(
    left_seq: jnp.ndarray,  # (B, F, H, W)
    right_seq: jnp.ndarray,
    carry: step_mod.SlamCarry,  # batched (leading B on every leaf)
    lc: LCScanState,  # batched
    grid_pts: jnp.ndarray,
    grid_mask: jnp.ndarray,
    centers: tuple,
    idf: jnp.ndarray,
    cfg: PipelineConfig,
    vocab_k: int,
    rgb_seq: jnp.ndarray | None = None,
    fid_start=1,
    interleave: bool = False,
):
    """Batched full SLAM: B lanes of odometry + on-device detection in
    ONE scan (DP-over-sequences over :func:`run_sequence_slam`).

    The odometry step is the hoisted-cond batched step
    (:func:`step_batched.slam_frame_step_batched`); detection is the
    straight-line :func:`_lc_scan_step` vmapped over lanes (no
    data-dependent branches, so vmap adds no both-branch cost) behind
    one batch-level ``detect_every`` ``lax.cond``, with the Pallas ORB
    kernel routed to its grid=(B,) variant via custom_vmap.

    ``interleave=True`` phase-shifts each lane's detection across the
    stride — lane b detects on ``fid % every == b % every``
    (:func:`lane_phase`), at most ``ceil(B/every)`` lanes per frame via
    ``lax.switch`` over static lane groups (:func:`_lc_scan_step_lane`).
    MEASURED SLOWER and off by default: detection is LAUNCH-LATENCY
    bound, not bandwidth bound, so the vmapped all-lanes step costs
    barely more than one lane's — interleaving runs a one-lane
    detection every frame instead of an all-lane detection every
    ``every`` frames and de-amortizes exactly the overhead vmap was
    hiding (TPU v5e, 2 lanes, 384-frame corridor:
    234.7 fps aggregate lockstep vs 183.7 interleaved;
    tools/profile_batched_slam.py).  Kept as the measured refutation of
    the per-lane-database-traffic hypothesis for the batched full-SLAM
    regression — the actual cost lives in the batched odometry step's
    any-lane branch firings (see RESULTS.md).
    Stats leaves come back frame-major: (F, B, ...).
    """
    from ros_stereo_slam_tpu.models import step_batched

    centers = vocab_mod.prepare_centers_for_scan(centers, vocab_k)
    every = max(cfg.loop.detect_every, 1)
    B = left_seq.shape[0]

    def body(c, xs):
        sc, lcs = c
        left, right, fid, rgb = (
            (*xs, None) if rgb_seq is None else xs
        )
        sc, fstats = step_batched.slam_frame_step_batched(
            sc, left, right, grid_pts, grid_mask, cfg, left_rgb=rgb
        )

        def lane_frames():
            lf = left
            if lf.dtype == jnp.uint8:
                lf = lf.astype(jnp.float32) * (1.0 / 255.0)
            return lf

        def detect(l):
            return jax.vmap(
                lambda lc1, l1: _lc_scan_step(
                    lc1, l1, fid, centers, idf, cfg, vocab_k)
            )(l, lane_frames())

        null_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape),
            _null_stats(cfg),
        )
        if every == 1:
            lcs, lstats = detect(lcs)
        elif not (interleave and B > 1):
            lcs, lstats = lax.cond(
                fid % every == 0, detect, lambda l: (l, null_b), lcs,
            )
        else:
            lf = lane_frames()

            def make_branch(o):
                group = [b for b in range(B) if lane_phase(b, every) == o]

                def br(l):
                    st = null_b
                    for b in group:
                        l, row = _lc_scan_step_lane(
                            l, b, lf[b], fid, centers, idf, cfg, vocab_k
                        )
                        st = jax.tree.map(
                            lambda s, r: s.at[b].set(r), st, row
                        )
                    return l, st

                return br

            lcs, lstats = lax.switch(
                fid % every, [make_branch(o) for o in range(every)], lcs,
            )
        return (sc, lcs), (fstats, lstats)

    fids = jnp.int32(fid_start) + jnp.arange(
        left_seq.shape[1], dtype=jnp.int32
    )
    left_t = jnp.swapaxes(left_seq, 0, 1)  # (F, B, H, W)
    right_t = jnp.swapaxes(right_seq, 0, 1)
    if rgb_seq is None:
        xs = (left_t, right_t, fids)
    else:
        xs = (left_t, right_t, fids, jnp.swapaxes(rgb_seq, 0, 1))
    return lax.scan(body, (carry, lc), xs)


class EpilogueGater:
    """Replays the streaming gate chain over scan-emitted candidate rows.

    Shared by the offline epilogue (:func:`run_offline_slam`) and the
    chunked online driver (:mod:`~ros_stereo_slam_tpu.models.
    slam_chunked`): nss/alpha/island gates (via
    :class:`loop_closure.CandidateGater` — identical semantics to the
    streaming detector), per-candidate geometric verification, then the
    driver accept rule (query − match > min_separation, cooldown;
    ``/root/reference/src/optimizationStuff.cpp:59-63``).  Ordering
    matters: the geometric check runs BEFORE the cooldown is armed — a
    gate candidate that fails geometry must NOT suppress detection on
    the following frames.

    Stateful across calls (cooldown, temporal window), so one instance
    processes an arbitrary split of the sequence into blocks.  RANSAC
    keys for geometric verification are derived from each (query, match)
    pair (:func:`loop_closure.geom_key`), NOT from a running stream, so
    every posture accepts the same closure set.
    """

    def __init__(self, cfg: PipelineConfig, key=None, phase: int = 0):
        # `key` retained for signature compatibility; geometric keys are
        # pair-derived (loop_closure.geom_key) since round 4.
        # `phase`: detection frames are fid % detect_every == phase
        # (non-zero for interleaved batched lanes, see lane_phase).
        del key
        self.cfg = cfg
        self.lcc = cfg.loop
        self.every = max(cfg.loop.detect_every, 1)
        self.phase = phase % self.every
        self.gater = lc_mod.CandidateGater(cfg.loop, stride=self.every)
        self.cooldown = 0

    def process(self, lc: LCScanState, top_ids, top_scores, ns_arr,
                fid_start: int) -> list:
        """Gate one block of per-frame shortlists (host numpy arrays).

        `fid_start` is the global frame id of row 0.  Returns accepted
        closures as (fid, match_id, best_idx, inlier_mask, n_inliers).

        Three passes — the gate chain is sequential only through the
        cooldown, so device work is DEFERRED and batched:

        1. host gate chain (nss/alpha/island/temporal + the driver
           separation rule, ``optimizationStuff.cpp:59-63``) over every
           detection frame IN ORDER — geometry-independent, so it runs
           with no device round trips;
        2. ONE vmapped geometric-verification dispatch over all
           surviving candidates (:func:`loop_closure._geom_match_many`)
           — was one ~25 ms dispatch PER candidate over the dev tunnel;
        3. cooldown replay over the per-candidate verdicts.  Identical
           accept set to the sequential original: a candidate inside a
           cooldown window was never verified there, and here its
           (batched) verdict is simply ignored; a gate survivor that
           FAILS geometry arms no cooldown in either formulation.
        """
        lcc = self.lcc
        n = top_ids.shape[0]
        # Frames <= suppress_until sit inside the carried-in cooldown
        # window (in-block accepts extend it during pass 3).
        suppress_until = fid_start + self.cooldown - 1
        # Pass 1: host gates (gater state must see every detection frame
        # in order, including frames inside a cooldown window).
        cands = []
        for i in range(n):
            fid = fid_start + i
            if fid % self.every != self.phase or fid <= lcc.dislocal:
                continue
            gated = self.gater.gate(
                fid, top_ids[i], top_scores[i], float(ns_arr[i])
            )
            if gated is None:
                continue
            # Candidates inside the CARRIED-IN window are known-
            # suppressed now — don't spend geometry bucket slots on
            # verdicts pass 3 would discard.  (Windows armed by
            # in-block accepts are only known in pass 3.)
            if fid <= suppress_until:
                continue
            best_id, _, _ = gated
            # Separation is a pure function of the pair, so near-matches
            # can never be accepted — drop them before spending any
            # geometry on them (the streaming detector short-circuits
            # identically, LoopDetector.detect).
            if fid - best_id <= lcc.min_separation:
                continue
            cands.append((fid, best_id))

        accepted = []
        if cands:
            # Pass 2: one batched dispatch, padded to a small bucket so
            # candidate-count changes don't recompile.
            P = _bucket(len(cands))
            q_fids, m_fids = _padded_fids(cands, P)
            n_inl_b, bi_b, im_b = jax.device_get(lc_mod._geom_match_many(
                lc.db_bits, lc.db_pts, lc.db_pt_valid,
                jnp.asarray(q_fids), jnp.asarray(m_fids),
                jnp.float32(lcc.geom_thresh_px),
                jnp.float32(lcc.neigh_ratio),
                iters=lcc.geom_ransac_iters,
            ))
            # Pass 3: cooldown replay (host, no device work).
            for ci, (fid, best_id) in enumerate(cands):
                if fid <= suppress_until:
                    continue
                if int(n_inl_b[ci]) < lcc.geom_min_points:
                    continue
                suppress_until = fid + lcc.cooldown
                accepted.append((fid, best_id, bi_b[ci], im_b[ci],
                                 int(n_inl_b[ci])))
        # Cooldown remaining after this block's last frame (the chunked
        # driver carries it into the next block).
        self.cooldown = max(0, suppress_until - (fid_start + n - 1))
        return accepted


def measure_loop_edges(
    accepted: list, lc: LCScanState, frame_of, cfg: PipelineConfig,
    key=None,
) -> tuple[list, list]:
    """Accepted closures -> (i, j, Z) pose-graph edges + loop events.

    PnP-measured edges when configured (identity fallback to ``match-1``,
    the reference's shipped semantics, ``poseGraph.h:113-126``).
    `frame_of`: callable ``fid -> (left, right)``.  PnP keys are derived
    per (query, match) pair (:func:`loop_closure.edge_key`) so the
    measured edge is identical in every driver; `key` is retained for
    signature compatibility and unused.
    Returns (loop_events, loop_edges).
    """
    del key
    loop_events, loop_edges = [], []
    if not accepted:
        return loop_events, loop_edges
    if cfg.loop.edge_measurement == "pnp":
        sel = [(q, m) for q, m, _, _, _ in accepted]
        sel_geom = (
            np.asarray([a[4] for a in accepted]),
            np.stack([a[2] for a in accepted]),
            np.stack([a[3] for a in accepted]),
        )
        Zs = _measure_edges_pnp(
            (lc.db_pts, lc.db_pt_valid), sel, sel_geom,
            frame_of, cfg,
        )
    else:
        Zs = [None] * len(accepted)
    for (q, m, _, _, n_inl), Z in zip(accepted, Zs):
        loop_events.append((q, m, n_inl))
        if Z is None:
            # reference identity-closure semantics: edge to the vertex
            # BEFORE the match (poseGraph.h:113-126)
            loop_edges.append((q, max(m - 1, 0), np.eye(4)))
        else:
            loop_edges.append((q, m, Z))
    return loop_events, loop_edges


@dataclass
class ScanSlamResult:
    trajectory: np.ndarray  # (F, 4, 4) post-PGO world-from-cam
    trajectory_odo: np.ndarray  # (F, 4, 4) raw odometry chain
    loop_events: list  # [(query, match, n_inliers)]
    n_inliers: np.ndarray
    is_keyframe: np.ndarray
    tracking_ok: np.ndarray
    keyframes: object
    # accepted (i, j, Z) pose-graph loop edges — kept so CLI runs can
    # export a complete poseGraph.g2o (utils/outputs.ScanRun)
    loop_edges: list = None


@partial(jax.jit, static_argnames=("cfg",))
def _edges_pnp_batch(
    lq: jnp.ndarray,  # (P, H, W) f32 [0, 1] query-frame left images
    rq: jnp.ndarray,  # (P, H, W)
    db_pts: jnp.ndarray,  # (cap, nf, 2)
    db_pt_valid: jnp.ndarray,  # (cap, nf)
    best_idx: jnp.ndarray,  # (P, nf) i32 query->match correspondences
    inl_mask: jnp.ndarray,  # (P, nf) bool
    q_fids: jnp.ndarray,  # (P,) i32
    m_fids: jnp.ndarray,  # (P,) i32
    cfg: PipelineConfig,
):
    """All accepted closures' PnP edge measurements in ONE dispatch.

    Per closure (vmapped): build the query pair's pyramids, LK-track
    left->right, stereo-triangulate, then PnP the matched frame's 2D
    observations against the query's 3D points.  Keys are the
    pair-derived :func:`loop_closure.edge_key` (driver-invariant).
    """
    from ros_stereo_slam_tpu.models import frontend as fe_mod

    cam = step_mod._cam_of(cfg)
    cap = cfg.loop.db_capacity

    if lq.dtype == jnp.uint8:
        lq = lq.astype(jnp.float32) * (1.0 / 255.0)
    if rq.dtype == jnp.uint8:
        rq = rq.astype(jnp.float32) * (1.0 / 255.0)

    def one(l1, r1, bi, im, qf, mf):
        lp = tuple(pyramid.build_pyramid(l1, cfg.frontend.lk_levels))
        rp = tuple(pyramid.build_pyramid(r1, cfg.frontend.lk_levels))
        pts_q = db_pts[qf % cap]
        st = lk.track(lp, rp, pts_q, None, fe_mod._lk_params(cfg.frontend))
        tri = triangulate.triangulate_rectified(
            cam, jnp.float32(cfg.camera.baseline), pts_q, st.points,
            db_pt_valid[qf % cap] & st.valid,
            max_depth=cfg.keyframes.max_depth,
        )
        uv_m = db_pts[mf % cap][bi]
        mask = im & tri.valid
        k = lc_mod.edge_key(qf, mf)
        res = pnp.pnp_ransac(
            k, cam, tri.points, uv_m, mask,
            thresh_px=cfg.loop.geom_thresh_px, iters=128,
            refine_iters=cfg.pnp.refine_iters,
            T_init=jnp.eye(4, dtype=jnp.float32),
        )
        return res.n_inliers, lie.inv_se3(res.T_cw)

    return jax.vmap(one)(lq, rq, best_idx, inl_mask, q_fids, m_fids)


def _measure_edges_pnp(
    lc_arrays, cands, geom, frame_of, cfg: PipelineConfig
):
    """PnP-measured loop edges Z = T_q^-1 T_match for accepted candidates
    (the reference's unbuilt ``getLCMeasurement``, ``dump.cpp:331-348``).

    The query frame's ORB features are stereo-triangulated from its
    image pair; the geometric check's correspondences give their 2D
    observations in the matched frame; PnP solves the match camera pose
    in the query frame.  Falls back to identity (reference semantics,
    ``poseGraph.h:118``) when PnP starves.

    All closures measure in ONE batched dispatch
    (:func:`_edges_pnp_batch`, bucket-padded) — the per-closure loop
    this replaces rebuilt two pyramids, LK-tracked, triangulated and
    PnP-solved per pair as serial host-latency-bound device calls.

    `frame_of`: callable ``fid -> (left, right)`` host/device frames
    (uint8 or [0, 1] f32).
    """
    db_pts, db_pt_valid = lc_arrays
    _, best_idx, inl_mask = geom
    N = len(cands)
    if N == 0:
        return []
    lqs, rqs = [], []
    for (q, _) in cands:
        lq_raw, rq_raw = frame_of(q)
        lqs.append(lq_raw)
        rqs.append(rq_raw)
    P = _bucket(N)
    # Frames already on device (the scan drivers stage whole sequences
    # in HBM) stack there — np.stack would round-trip every query frame
    # host-and-back over the link.  uint8 frames stay uint8 until the
    # jitted batch casts them (4x less H2D for host-side callers).
    on_dev = all(isinstance(a, jax.Array) for a in (*lqs, *rqs))
    xp = jnp if on_dev else np

    def padded(rows):
        return xp.stack(list(rows) + [rows[0]] * (P - N))

    q_fids, m_fids = _padded_fids(cands, P)
    n_ok, Ts = jax.device_get(_edges_pnp_batch(
        padded(lqs), padded(rqs),
        db_pts, db_pt_valid,
        jnp.asarray(np.stack([best_idx[i] for i in range(N)]
                             + [best_idx[0]] * (P - N))),
        jnp.asarray(np.stack([inl_mask[i] for i in range(N)]
                             + [inl_mask[0]] * (P - N))),
        jnp.asarray(q_fids), jnp.asarray(m_fids), cfg,
    ))
    return [
        Ts[ci] if int(n_ok[ci]) >= cfg.loop.geom_min_points else None
        for ci in range(N)
    ]


def run_offline_slam(
    cfg: PipelineConfig,
    vocab: vocab_mod.Vocabulary,
    left_seq,
    right_seq,
    rgb_seq=None,
) -> ScanSlamResult:
    """Full SLAM over a sequence: one scan dispatch + host epilogue.

    `left_seq`/`right_seq` may be uint8 stacks — staged as-is (4x less
    HBM than f32) and cast per frame inside the scan.  `rgb_seq`
    ((F, H, W, 3) f32/uint8, optional) colors the keyframe map points
    (reference ``getColors``; same contract as pipeline.run_offline).
    """
    from ros_stereo_slam_tpu.models.pipeline import _grid_for

    grid_pts, grid_mask = _grid_for(cfg)
    stage_dtype = (jnp.uint8 if left_seq.dtype == np.uint8
                   else jnp.float32)
    ls = jnp.asarray(left_seq, stage_dtype)
    rs = jnp.asarray(right_seq, stage_dtype)
    rgb = None if rgb_seq is None else jnp.asarray(rgb_seq)
    # ONE dispatch (bootstrap + frame-0 db add + whole-sequence scan
    # fused) and ONE device_get for the epilogue's inputs — the separate
    # init_carry/_lc_scan_step dispatches plus four per-leaf np.asarray
    # transfers this replaces billed ~180 ms/run of pure round-trip
    # latency to the dev tunnel (~0.5 ms/frame at bench scale).
    (carry, lc), (fstats, lstats) = _run_offline_slam_fused(
        ls, rs, grid_pts, grid_mask, tuple(vocab.centers),
        jnp.asarray(vocab.idf), cfg, vocab.k, rgb,
    )
    fstats_h, (top_ids, top_scores, ns) = jax.device_get(
        (fstats, (lstats.top_ids, lstats.top_scores, lstats.ns))
    )

    return _epilogue_one(
        cfg, lc, top_ids, top_scores, ns, fstats_h, carry.keyframes,
        lambda fid: (left_seq[fid], right_seq[fid]),
    )


@partial(jax.jit, static_argnames=("cfg", "vocab_k"))
def _run_offline_slam_fused(
    left_all, right_all, grid_pts, grid_mask, centers, idf,
    cfg: PipelineConfig, vocab_k: int, rgb_all=None,
):
    """Bootstrap (init_carry + frame-0 database add) + the full
    odometry+detection scan as ONE XLA program (one dispatch)."""
    # pad deep vocab tables ONCE for bootstrap + scan alike
    centers = vocab_mod.prepare_centers_for_scan(centers, vocab_k)
    carry = step_mod.init_carry(
        left_all[0], right_all[0], grid_pts, grid_mask,
        jax.random.PRNGKey(cfg.seed), cfg,
        left_rgb=None if rgb_all is None else rgb_all[0],
    )
    lc0 = init_lc_state(cfg, idf.shape[0])
    # frame 0 enters the database too (the reference adds every frame;
    # 0 % detect_every == 0, so frame 0 is always a detection frame)
    lc0, _ = _lc_scan_step(
        lc0, left_all[0], jnp.int32(0), centers, idf, cfg, vocab_k
    )
    return run_sequence_slam(
        left_all[1:], right_all[1:], carry, lc0, grid_pts, grid_mask,
        centers, idf, cfg, vocab_k,
        rgb_seq=None if rgb_all is None else rgb_all[1:],
    )


def _epilogue_one(
    cfg: PipelineConfig, lc, top_ids, top_scores, ns, fstats, keyframes,
    frame_of, phase: int = 0,
) -> ScanSlamResult:
    """Host epilogue for ONE lane: gates -> geometric check -> accept ->
    PnP loop edges -> deferred PGO -> map rewrite.  Shared by
    :func:`run_offline_slam` and :func:`run_offline_slam_batched`
    (`phase`: the lane's interleaved detection phase)."""
    traj_odo = np.concatenate(
        [np.eye(4, dtype=np.float32)[None], np.asarray(fstats.T_wc)], axis=0
    )

    gate = EpilogueGater(cfg, phase=phase)
    accepted = gate.process(lc, top_ids, top_scores, ns, fid_start=1)
    loop_events, loop_edges = measure_loop_edges(accepted, lc, frame_of, cfg)

    trajectory = traj_odo
    if loop_edges:
        F = traj_odo.shape[0]
        poses = jnp.asarray(traj_odo, jnp.float32)
        odo_Z = pg_mod.chain_measurements(poses)
        li = jnp.asarray([i for i, _, _ in loop_edges], jnp.int32)
        lj = jnp.asarray([j for _, j, _ in loop_edges], jnp.int32)
        lZ = jnp.asarray(np.stack([Z for _, _, Z in loop_edges]), jnp.float32)
        lv = jnp.ones((len(loop_edges),), bool)
        opt = pg_mod.optimize(
            poses, jnp.int32(F), odo_Z, li, lj, lZ, lv,
            iters=cfg.pgo.iters, cg_iters=cfg.pgo.cg_iters,
            damping=cfg.pgo.damping,
        )
        trajectory = np.asarray(opt)
        # Post-PGO map consistency (reference ``updateOdometry``,
        # ``src/optimizationStuff.cpp:17-47``): every keyframe cloud is
        # re-expressed at its optimized pose and the keyframe poses follow
        # the corrected trajectory, so the exported map matches the
        # trajectory it ships with.  The scan inserts keyframes at raw
        # odometry poses; this one batched rewrite (p' = T_new T_old^-1 p)
        # is exactly what the reference's per-closure rewrite composes to
        # after its last closure.
        new_points = pg_mod.rewrite_points(
            keyframes.points, keyframes.frame_idx, poses, opt
        )
        keyframes = keyframes._replace(
            points=new_points,
            poses=opt[keyframes.frame_idx],
            retrack=keyframes.retrack | keyframes.valid,
        )

    return ScanSlamResult(
        trajectory=trajectory,
        trajectory_odo=traj_odo,
        loop_events=loop_events,
        n_inliers=np.asarray(fstats.n_inliers),
        is_keyframe=np.asarray(fstats.is_keyframe),
        tracking_ok=np.asarray(fstats.tracking_ok),
        keyframes=keyframes,
        loop_edges=loop_edges,
    )




def run_offline_slam_batched(
    cfg: PipelineConfig,
    vocab: vocab_mod.Vocabulary,
    left_seqs,  # (B, F, H, W) uint8 or f32
    right_seqs,
    rgb_seqs=None,
    interleave: bool = False,
) -> list[ScanSlamResult]:
    """Batched full SLAM over B sequences: ONE scan dispatch for every
    lane's odometry + detection, then the per-lane host epilogue.

    The fleet-mapping analog of :func:`run_offline_slam` — returns one
    :class:`ScanSlamResult` per lane.  The detection database is
    per-lane state (B × ~100 MB at reference scale), so lane count is
    HBM-bounded in this mode.  ``interleave`` phase-shifts each lane's
    detection across the ``detect_every`` stride — measured SLOWER than
    the default lockstep cadence (see
    :func:`run_sequence_slam_batched`), kept for the ablation.
    """
    from ros_stereo_slam_tpu.models.pipeline import _grid_for

    grid_pts, grid_mask = _grid_for(cfg)
    B = left_seqs.shape[0]
    stage_dtype = (jnp.uint8 if left_seqs.dtype == np.uint8
                   else jnp.float32)
    ls = jnp.asarray(left_seqs, stage_dtype)
    rs = jnp.asarray(right_seqs, stage_dtype)
    rgb = None if rgb_seqs is None else jnp.asarray(rgb_seqs)
    # one dispatch + one device_get, as in run_offline_slam
    (carry, lc), (fstats, lstats) = _run_offline_slam_batched_fused(
        ls, rs, grid_pts, grid_mask, tuple(vocab.centers),
        jnp.asarray(vocab.idf), cfg, vocab.k, rgb, interleave,
    )
    fstats_h, lstats_h = jax.device_get((fstats, lstats))

    every = max(cfg.loop.detect_every, 1)
    out = []
    for b in range(B):
        out.append(_epilogue_one(
            cfg,
            jax.tree.map(lambda x: x[b], lc),
            lstats_h.top_ids[:, b],
            lstats_h.top_scores[:, b],
            lstats_h.ns[:, b],
            jax.tree.map(lambda x: x[:, b], fstats_h),
            jax.tree.map(lambda x: x[b], carry.keyframes),
            lambda fid, b=b: (left_seqs[b, fid], right_seqs[b, fid]),
            phase=(lane_phase(b, every)
                   if (interleave and B > 1 and every > 1) else 0),
        ))
    return out


@partial(jax.jit, static_argnames=("cfg", "vocab_k", "interleave"))
def _run_offline_slam_batched_fused(
    left_all, right_all, grid_pts, grid_mask, centers, idf,
    cfg: PipelineConfig, vocab_k: int, rgb_all=None,
    interleave: bool = False,
):
    """Batched bootstrap + batched odometry/detection scan, ONE program."""
    centers = vocab_mod.prepare_centers_for_scan(centers, vocab_k)
    B = left_all.shape[0]
    l0 = left_all[:, 0]
    r0 = right_all[:, 0]
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), B)
    if rgb_all is None:
        carry = jax.vmap(
            lambda l, r, k: step_mod.init_carry(
                l, r, grid_pts, grid_mask, k, cfg)
        )(l0, r0, keys)
    else:
        carry = jax.vmap(
            lambda l, r, k, g: step_mod.init_carry(
                l, r, grid_pts, grid_mask, k, cfg, left_rgb=g)
        )(l0, r0, keys, rgb_all[:, 0])
    lc0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
        init_lc_state(cfg, idf.shape[0]),
    )
    lc0, _ = jax.vmap(
        lambda lc1, l1: _lc_scan_step(
            lc1, l1, jnp.int32(0), centers, idf, cfg, vocab_k)
    )(lc0, l0)
    return run_sequence_slam_batched(
        left_all[:, 1:], right_all[:, 1:], carry, lc0, grid_pts,
        grid_mask, centers, idf, cfg, vocab_k,
        rgb_seq=None if rgb_all is None else rgb_all[:, 1:],
        interleave=interleave,
    )
