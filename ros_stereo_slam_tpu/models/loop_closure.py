"""BoW loop-closure detector (reference C9) — scale-true sparse database.

Re-implements the vendored DLoopDetector pipeline
(``/root/reference/include/TemplatedLoopDetector.h:697-861`` ``detectLoop``)
the TPU way:

- database scoring: DBoW2's inverted index + pointer-chasing query
  (``:725`` ``db.query``) becomes a two-stage fixed-shape query over a
  SPARSE database — each frame stores at most ``orb_features`` merged
  (word id, TF-IDF weight) pairs plus an (n_bins,) binned histogram
  (word id mod n_bins).  Stage 1 ranks the whole database with ONE
  (capacity, n_bins) bf16 MXU matvec (:func:`vocab.score_db_binned`);
  stage 2 re-scores the top ``shortlist`` candidates EXACTLY
  (min-intersection over the sparse word lists,
  :func:`vocab.rescore_min`), so every gate below sees exact DBoW2
  scores.  At the reference scale (k=9, L=6 = 531,441 words,
  4,000-frame database, ``src/bagOfWordsDetector.cpp:21``,
  ``include/visualSLAM.h:137``) this is ~50 MB of BoW state where a
  dense (capacity, n_words) matrix would be ~8.7 GB — and unlike the
  dense-row scatter+gather it replaced (~15 ms/frame on TPU,
  vocabulary-size bound), the matvec rides the MXU at memory bandwidth;
- descriptors are stored PACKED ((capacity, nf, 8) uint32, 64 MB at
  reference scale) and unpacked to MXU sign vectors only for the single
  matched frame at geometric-check time;
- normalized-similarity gate (min_nss, ``:733-740``), removeLowScores
  (alpha, ``:748``);
- island grouping (``computeIslands`` ``:875-949``) and the temporal
  consistency window (``:966-1001``) as small host logic over the top-K
  candidates (data-dependent, tiny);
- geometric check: the direct-index descriptor matching + neighbour-ratio
  + F-matrix RANSAC (``isGeometricallyConsistent_DI`` ``:1006-1087``)
  becomes a brute-force Hamming matmul on the MXU (strictly more matches
  than the direct-index shortlist, which exists only to save CPU time —
  which is also why no equivalent of DBoW2's ``di_levels`` node index is
  kept) + the same ratio test + the batched 8-point RANSAC of
  :mod:`ros_stereo_slam_tpu.ops.ransac` (min 12 inliers at 2 px,
  ``Parameters`` defaults ``:100-180``).

The driver-level accept rule (query - match > 100 frames + 100-frame
cooldown, ``src/optimizationStuff.cpp:59-63``) lives in the caller.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import LoopClosureConfig
from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.ops import orb as orb_mod
from ros_stereo_slam_tpu.ops import ransac


def geom_key(query: int, match: int) -> jax.Array:
    """Deterministic RANSAC key for geometrically verifying a (query,
    match) candidate pair.

    Every driver (streaming, scan epilogue, chunked online) derives the
    key from the PAIR ITSELF rather than from a running ``split`` stream:
    with a stream, whether a borderline candidate verifies depends on how
    many candidates the driver happened to check before it, so two
    drivers processing identical candidate sequences could diverge on one
    RANSAC draw — and the 100-frame cooldown then phase-shifts every
    later accept (measured in round 3: the per-frame streaming driver
    accepted 7 of the 13 closures the scan/chunked drivers found).
    Pair-derived keys make verification a pure function of
    (query, match, database contents), so all postures accept the same
    closure set by construction (tests/test_posture_parity.py).
    """
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(77), query), match
    )


def edge_key(query: int, match: int) -> jax.Array:
    """Deterministic key for the PnP loop-edge measurement of a pair
    (same rationale as :func:`geom_key`; distinct stream)."""
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(4321), query), match
    )


@dataclass
class LoopCandidate:
    query: int
    match: int
    score: float
    n_inliers: int
    consistent: int  # temporal-consistency count at acceptance
    # Geometric-check correspondences (query feature -> match feature),
    # for the optional PnP-measured loop edge.
    match_idx: np.ndarray | None = None  # (N,) int
    match_inliers: np.ndarray | None = None  # (N,) bool


@partial(jax.jit, static_argnames=("top_k", "shortlist"))
def _query_scores(
    uw: jnp.ndarray,
    uv: jnp.ndarray,
    q_bins: jnp.ndarray,
    db_words: jnp.ndarray,
    db_wvals: jnp.ndarray,
    db_bins: jnp.ndarray,
    db_valid: jnp.ndarray,
    max_id: jnp.ndarray,
    db_ids: jnp.ndarray,
    top_k: int,
    shortlist: int,
):
    """Binned-matvec shortlist + exact min-intersection rescore; returns
    (top ids, top EXACT scores).  Same query the scan-mode step runs
    (slam_scan._lc_scan_step) — see vocab.py's binned-shortlist notes."""
    sdot = vocab_mod.score_db_binned(q_bins, db_bins)
    ok = db_valid & (db_ids <= max_id)
    sdot = jnp.where(ok, sdot, -1e9)
    C = min(shortlist, db_words.shape[0])
    sl_scores, sl_idx = jax.lax.top_k(sdot, C)
    s_ex = vocab_mod.rescore_min(uw, uv, db_words[sl_idx], db_wvals[sl_idx])
    s_ex = jnp.where(sl_scores > -1e8, s_ex, -1e9)
    vals, ti = jax.lax.top_k(s_ex, min(top_k, C))
    return db_ids[sl_idx[ti]], vals


@partial(jax.jit, static_argnames=("iters",))
def _geom_match(
    bits_q: jnp.ndarray, pts_q: jnp.ndarray, valid_q: jnp.ndarray,
    bits_m: jnp.ndarray, pts_m: jnp.ndarray, valid_m: jnp.ndarray,
    key: jax.Array, thresh_px: jnp.ndarray, ratio: jnp.ndarray,
    iters: int = 256,
):
    """Brute-force descriptor matching + ratio test + F-RANSAC.

    Inputs are PACKED (N, 8) uint32 descriptors (unpacked to MXU sign
    vectors here — only two frames' worth, never the whole database).
    Returns (n_inliers, best_match_idx (N,), inlier_mask (N,)) — the
    correspondences feed the optional PnP loop-edge measurement (the
    reference's future-work ``getLCMeasurement``, ``dump.cpp:331-348``).
    """
    sign_q = orb_mod.sign_of_packed(bits_q)
    sign_m = orb_mod.sign_of_packed(bits_m)
    ham = orb_mod.hamming_mxu(sign_q, sign_m)  # (N, M)
    ham = jnp.where(valid_m[None, :], ham, 1e9)
    # two smallest distances per query row
    neg2, idx2 = jax.lax.top_k(-ham, 2)
    best = idx2[:, 0]
    d1 = -neg2[:, 0]
    d2 = -neg2[:, 1]
    good = valid_q & (d1 < ratio * d2) & (d1 < 1e8)
    m_pts = pts_m[best]
    res = ransac.fmat_ransac(
        key, pts_q, m_pts, good, thresh_px=thresh_px, iters=iters
    )
    # Measurement set: the strict ratio gates the ACCEPT decision
    # (reference neigh-ratio 0.6, TemplatedLoopDetector.h:1295), but the
    # PnP loop-edge measurement wants every correspondence the verified
    # epipolar geometry supports — a looser ratio re-gated by the SAME
    # best F (res.errors covers all rows).  More points -> a tighter
    # metric edge for the pose graph.
    loose = valid_q & (d1 < 0.85 * d2) & (d1 < 1e8)
    meas = loose & (res.errors < thresh_px * thresh_px)
    return res.n_inliers, best, meas


@partial(jax.jit, static_argnames=("iters",))
def _geom_match_many(
    db_bits: jnp.ndarray, db_pts: jnp.ndarray, db_pt_valid: jnp.ndarray,
    q_fids: jnp.ndarray, m_fids: jnp.ndarray,
    thresh_px: jnp.ndarray, ratio: jnp.ndarray, iters: int = 256,
):
    """Batched :func:`_geom_match` over N (query, match) candidate pairs.

    The scan-mode epilogue used to issue one ``_geom_match`` dispatch per
    gate-surviving candidate (~25 ms host round trip each over the dev
    tunnel); every input is fixed-shape, so all candidates verify in ONE
    vmapped dispatch.  Keys are the same pair-derived :func:`geom_key`
    (fold_in accepts traced ints), and ring slots are computed inside, so
    the verdict for each pair is identical to the per-candidate path by
    construction (tests/test_loop_closure.py).
    """
    cap = db_bits.shape[0]

    def one(qf, mf):
        qs = qf % cap
        ms = mf % cap
        k = geom_key(qf, mf)
        return _geom_match(
            db_bits[qs], db_pts[qs], db_pt_valid[qs],
            db_bits[ms], db_pts[ms], db_pt_valid[ms],
            k, thresh_px, ratio, iters=iters,
        )

    return jax.vmap(one)(q_fids, m_fids)


def group_islands(ids: np.ndarray, scores: np.ndarray):
    """Group candidate entries into islands of near-consecutive ids.

    Mirrors computeIslands (TemplatedLoopDetector.h:875-949): entries
    sorted by id, split when the id gap exceeds 3; island score = sum;
    representative = argmax entry.  Returns a list of
    ``[sum_score, best_id, best_score, lo, hi]``.
    """
    order = np.argsort(ids)
    islands = []
    cur = None
    for i in order:
        if ids[i] < 0:
            continue
        if cur is not None and ids[i] - cur[4] <= 3:
            cur[0] += scores[i]
            cur[4] = ids[i]
            if scores[i] > cur[2]:
                cur[1], cur[2] = ids[i], scores[i]
        else:
            if cur is not None:
                islands.append(cur)
            cur = [scores[i], ids[i], scores[i], ids[i], ids[i]]
    if cur is not None:
        islands.append(cur)
    return islands


class CandidateGater:
    """The nss / alpha / island / temporal-window gate chain, shared by the
    streaming detector and the scan-mode epilogue (identical semantics:
    TemplatedLoopDetector.h:733-772).

    ``stride`` widens the island-gap and temporal-window tolerances when
    detection runs every Nth frame (config ``detect_every``) so one
    detected frame still chains consistency with the next detected frame.
    """

    def __init__(self, config: LoopClosureConfig, stride: int = 1):
        self.config = config
        self.stride = max(int(stride), 1)
        self._window: list[tuple[int, int, int]] = []  # (query, isl_lo, isl_hi)

    def gate(self, frame_id: int, ids: np.ndarray, scores: np.ndarray,
             ns: float):
        """Per-frame gates over the top-K db results.

        Returns (best_id, best_score, consistent) for a candidate that
        passed nss + alpha + islands + temporal consistency, else None.
        MUST be called for every detected frame in order (it threads the
        temporal window state).
        """
        cfg = self.config
        gap = 3 * self.stride
        if not (ns >= cfg.min_nss and scores.size and scores[0] > 0):
            self._window.append((frame_id, -10 * gap, -10 * gap))
            self._window = self._window[-8:]
            return None
        nss = scores / max(ns, 1e-6)
        keep = (nss >= cfg.alpha) & (scores > -1e8)
        islands = group_islands(ids[keep], nss[keep])
        if not islands:
            self._window.append((frame_id, -10 * gap, -10 * gap))
            self._window = self._window[-8:]
            return None
        best = max(islands, key=lambda g: g[0])
        _, best_id, best_score, lo, hi = best
        consistent = 0
        for (q, plo, phi) in reversed(self._window):
            if frame_id - q > gap:
                break
            if lo <= phi + gap and hi >= plo - gap:
                consistent += 1
                lo = min(lo, plo)
                hi = max(hi, phi)
            else:
                break
        self._window.append((frame_id, best[3], best[4]))
        self._window = self._window[-8:]
        if consistent >= cfg.k_consistency:
            return int(best_id), float(best_score), consistent
        return None


@dataclass
class LoopDetector:
    """Streaming detector over a fixed-capacity sparse device database."""

    vocab: vocab_mod.Vocabulary
    config: LoopClosureConfig
    # device-side database (sparse BoW + packed descriptors)
    db_words: jnp.ndarray = field(init=False)
    db_wvals: jnp.ndarray = field(init=False)
    db_bits: jnp.ndarray = field(init=False)
    db_pts: jnp.ndarray = field(init=False)
    db_pt_valid: jnp.ndarray = field(init=False)
    db_valid: jnp.ndarray = field(init=False)
    db_ids: jnp.ndarray = field(init=False)

    def __post_init__(self):
        cap = self.config.db_capacity
        nf = self.config.orb_features
        self.db_words = jnp.zeros((cap, nf), jnp.int32)
        self.db_wvals = jnp.zeros((cap, nf), jnp.float32)
        self.db_bins = jnp.zeros((cap, self.config.n_bins), jnp.bfloat16)
        self.db_bits = jnp.zeros((cap, nf, orb_mod.N_BITS // 32), jnp.uint32)
        self.db_pts = jnp.zeros((cap, nf, 2), jnp.float32)
        self.db_pt_valid = jnp.zeros((cap, nf), bool)
        self.db_valid = jnp.zeros((cap,), bool)
        self.db_ids = jnp.full((cap,), -1, jnp.int32)
        self._idf = jnp.asarray(self.vocab.idf)
        self._last = None  # (uwords, uvals) of the previous frame
        # stride widens island/temporal tolerances when the caller only
        # detects every Nth frame (LoopClosureConfig.detect_every), same
        # as the scan-mode epilogue (slam_scan.py).
        self._gater = CandidateGater(
            self.config, stride=max(self.config.detect_every, 1)
        )

    # -- internals ---------------------------------------------------------

    def _bow_of(self, feats: orb_mod.OrbFeatures):
        words = vocab_mod.transform_words(self.vocab, feats.desc_sign)
        return vocab_mod.bow_sparse(
            words, feats.valid, self._idf, self.vocab.n_words
        )

    # -- public API --------------------------------------------------------

    def add(self, frame_id: int, feats: orb_mod.OrbFeatures, bow=None):
        if bow is None:
            bow = self._bow_of(feats)
        uw, uv = bow
        slot = frame_id % self.config.db_capacity
        self.db_words = self.db_words.at[slot].set(uw)
        self.db_wvals = self.db_wvals.at[slot].set(uv)
        self.db_bins = self.db_bins.at[slot].set(
            vocab_mod.bin_of_sparse(uw, uv, self.config.n_bins
                                    ).astype(jnp.bfloat16))
        self.db_bits = self.db_bits.at[slot].set(feats.desc_bits)
        self.db_pts = self.db_pts.at[slot].set(feats.pts)
        self.db_pt_valid = self.db_pt_valid.at[slot].set(feats.valid)
        self.db_valid = self.db_valid.at[slot].set(True)
        self.db_ids = self.db_ids.at[slot].set(frame_id)
        self._last = (uw, uv)

    def detect(self, frame_id: int, feats: orb_mod.OrbFeatures) -> LoopCandidate | None:
        """Run detection for the frame, then add it to the database."""
        cfg = self.config
        uw, uv = self._bow_of(feats)
        result = None
        if self._last is not None and frame_id > cfg.dislocal:
            lw, lv = self._last
            ns = float(vocab_mod.score_pair_min(uw, uv, lw, lv))
            q_bins = vocab_mod.bin_of_sparse(uw, uv, cfg.n_bins)
            ids_d, scores_d = _query_scores(
                uw, uv, q_bins, self.db_words, self.db_wvals, self.db_bins,
                self.db_valid, jnp.int32(frame_id - cfg.dislocal - 1),
                self.db_ids, cfg.max_db_results, cfg.shortlist,
            )
            ids = np.asarray(ids_d)
            scores = np.asarray(scores_d)
            # nss / alpha (removeLowScores, ABSOLUTE cutoff on the
            # nss-normalized score, TemplatedLoopDetector.h:744-748;
            # alpha=0.9 in use) / islands / temporal window.
            gated = self._gater.gate(frame_id, ids, scores, ns)
            # Driver separation rule short-circuit (mirrors
            # EpilogueGater.process): a candidate failing it can never
            # be accepted, so don't spend a geometric-check dispatch.
            if (gated is not None
                    and gated[0] >= frame_id - cfg.min_separation):
                gated = None
            if gated is not None:
                best_id, best_score, consistent = gated
                slot = best_id % cfg.db_capacity
                k = geom_key(frame_id, best_id)
                n_inl_d, best_d, inl_d = _geom_match(
                    feats.desc_bits, feats.pts, feats.valid,
                    self.db_bits[slot], self.db_pts[slot],
                    self.db_pt_valid[slot],
                    k, jnp.float32(cfg.geom_thresh_px),
                    jnp.float32(cfg.neigh_ratio),
                    iters=cfg.geom_ransac_iters,
                )
                n_inl = int(n_inl_d)
                if n_inl >= cfg.geom_min_points:
                    result = LoopCandidate(
                        query=frame_id, match=best_id,
                        score=best_score, n_inliers=n_inl,
                        consistent=consistent,
                        match_idx=np.asarray(best_d),
                        match_inliers=np.asarray(inl_d),
                    )
        self.add(frame_id, feats, (uw, uv))
        return result
