"""Hierarchical binary-descriptor vocabulary (reference C10) + sparse BoW.

TPU-native replacement for DBoW2's ``TemplatedVocabulary`` (k-ary tree,
k=9, L=6 in the reference, ``/root/reference/src/bagOfWordsDetector.cpp:21``)
and the offline builder tool (``testVocCreation`` ``:47-99``).  The
reference's prebuilt ``orb_voc*.yml.gz`` files are absent from its repo
(``.MISSING_LARGE_BLOBS``), so training is first-class here.

Design:
- The tree is a dense per-level array of sign-vector centers stored as
  **int8** (``levels[l]: (k^(l+1), 256) in {-1,+1}``); node n's children
  occupy rows [n*k, (n+1)*k).  At the reference scale (k=9, L=6 =
  531,441 words) the tables total ~153 MB — f32 storage would be 4x that.
- Transform = L rounds of batched argmax-dot descent; each round is one
  gathered (N, k, 256) contraction (MXU-shaped, no pointer chasing).
- Training comes in two forms:
  * :func:`train` — host-recursive binary k-means, the small-vocabulary
    oracle used by unit tests;
  * :func:`train_batched` — level-synchronous device training: every
    node of a level trains simultaneously via gathered assignment +
    segment-sum majority-vote updates.  This is the ONLY form that
    reaches the reference's 531k-word scale (the host recursion would
    visit 66k internal nodes in Python).
- Word weights: TF-IDF (the reference's weighting, bagOfWordsDetector
  ``:21`` TF_IDF).

Sparse BoW (the scale-true database representation)
---------------------------------------------------
DBoW2 scores a query against its database through an inverted file
(``TemplatedLoopDetector.h:725`` ``db.query``) — pointer-chasing, but it
never materializes (n_frames, n_words).  A dense BoW matrix at the
reference scale (4,000 frames x 531,441 words) would be ~8.7 GB; the
TPU-native equivalent here keeps each frame as a fixed-width list of at
most ``n_features`` (word id, TF-IDF weight) pairs — duplicates merged,
L1-normalized, zero-padded — and exploits the identity

    s(q, d) = 1 - 0.5 * ||q - d||_1  =  sum_w min(q_w, d_w)

for L1-normalized non-negative vectors: the query is scattered into ONE
dense (n_words,) row (~2 MB), and scoring the whole database is a gather
of that row at every stored word id + a masked min-sum — fixed-shape,
scan-compatible, O(capacity * n_features) instead of
O(capacity * n_words).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.ops.orb import N_BITS


@dataclass
class Vocabulary:
    k: int  # branching factor
    levels: int  # tree depth (leaves = k**levels words)
    centers: list  # per level l: (k**(l+1), 256) int8 sign vectors
    idf: np.ndarray  # (k**levels,) float32 word weights

    @property
    def n_words(self) -> int:
        return self.k**self.levels

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        arrs = {
            f"level_{i}": np.asarray(c, np.int8) for i, c in enumerate(self.centers)
        }
        np.savez_compressed(
            path, k=self.k, levels=self.levels, idf=self.idf, **arrs
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        levels = int(z["levels"])
        centers = [jnp.asarray(z[f"level_{i}"], jnp.int8) for i in range(levels)]
        return Vocabulary(
            k=int(z["k"]), levels=levels, centers=centers,
            idf=np.asarray(z["idf"]),
        )


def _kmeans_signs(X: np.ndarray, k: int, iters: int = 8, seed: int = 0) -> np.ndarray:
    """Binary k-means on (N, 256) {-1,+1} vectors -> (k, 256) sign centers."""
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    if n == 0:
        return rng.choice([-1.0, 1.0], size=(k, N_BITS)).astype(np.float32)
    init = X[rng.choice(n, size=min(k, n), replace=False)]
    C = np.concatenate(
        [init, rng.choice([-1.0, 1.0], size=(k - init.shape[0], N_BITS))]
    ).astype(np.float32)
    Xj = jnp.asarray(X)
    for _ in range(iters):
        # Hamming == argmax dot for sign vectors.
        assign = np.asarray(jnp.argmax(Xj @ jnp.asarray(C).T, axis=1))
        for c in range(k):
            sel = X[assign == c]
            if sel.shape[0]:
                # bit-wise majority vote == sign of mean
                m = sel.mean(axis=0)
                C[c] = np.where(m >= 0, 1.0, -1.0)
            else:
                C[c] = X[rng.integers(n)]
    return C


def _idf_of(voc: "Vocabulary", X: np.ndarray, doc_ids: np.ndarray | None) -> None:
    """TF-IDF word weights from the training corpus (in place)."""
    if doc_ids is None or X.shape[0] == 0:
        return
    words = np.asarray(transform_words(voc, jnp.asarray(X, jnp.float32)))
    docs = np.asarray(doc_ids)
    n_docs = len(np.unique(docs))
    # document frequency: count each (doc, word) pair once
    pair = docs.astype(np.int64) * voc.n_words + words.astype(np.int64)
    uniq = np.unique(pair)
    df = np.bincount((uniq % voc.n_words).astype(np.int64), minlength=voc.n_words)
    idf = np.log(n_docs / np.maximum(df, 1)).astype(np.float32)
    idf[df == 0] = 0.0
    voc.idf = idf


def train(
    descriptors: np.ndarray, k: int = 9, levels: int = 4, seed: int = 0,
    doc_ids: np.ndarray | None = None,
) -> Vocabulary:
    """Host-recursive trainer from (N, 256) sign descriptors.

    The small-vocabulary oracle (tests, tiny worlds).  For reference-scale
    vocabularies use :func:`train_batched` — this recursion visits every
    internal node in Python.

    `doc_ids` (N,) optional frame ids for IDF computation (defaults to
    uniform weights).
    """
    X = np.asarray(descriptors, dtype=np.float32)
    # per-level center tables
    centers = [np.zeros((k ** (l + 1), N_BITS), np.float32) for l in range(levels)]

    def recurse(data: np.ndarray, level: int, node: int, seed_: int):
        C = _kmeans_signs(data, k, seed=seed_)
        centers[level][node * k : (node + 1) * k] = C
        if level + 1 == levels:
            return
        if data.shape[0]:
            assign = np.asarray(
                jnp.argmax(jnp.asarray(data) @ jnp.asarray(C).T, axis=1)
            )
        else:
            assign = np.zeros((0,), np.int64)
        for c in range(k):
            recurse(data[assign == c], level + 1, node * k + c, seed_ * k + c + 1)

    recurse(X, 0, 0, seed + 1)
    voc = Vocabulary(k=k, levels=levels,
                     centers=[jnp.asarray(c, jnp.int8) for c in centers],
                     idf=np.ones((k**levels,), np.float32))
    _idf_of(voc, X, doc_ids)
    return voc


# -- level-synchronous batched trainer (reference scale) --------------------


@partial(jax.jit, static_argnames=("k", "chunk"))
def _assign_level(X: jnp.ndarray, node: jnp.ndarray, C: jnp.ndarray,
                  k: int, chunk: int = 8192) -> jnp.ndarray:
    """E-step: each descriptor picks the best of its node's k children.

    Chunked so the gathered (chunk, k, 256) candidate block stays small
    regardless of corpus size.  Returns child group ids (N,).
    """
    n = X.shape[0]
    n_pad = -(-n // chunk) * chunk
    Xp = jnp.pad(X, ((0, n_pad - n), (0, 0)))
    npad = jnp.pad(node, (0, n_pad - n))

    def body(args):
        xc, nc = args
        idx = nc[:, None] * k + jnp.arange(k)[None, :]
        cand = C[idx].astype(jnp.float32)  # (chunk, k, 256)
        d = jnp.einsum("nd,nkd->nk", xc, cand,
                       preferred_element_type=jnp.float32)
        return nc * k + jnp.argmax(d, axis=1).astype(jnp.int32)

    g = jax.lax.map(
        body, (Xp.reshape(-1, chunk, N_BITS), npad.reshape(-1, chunk))
    ).reshape(-1)
    return g[:n]


@partial(jax.jit, static_argnames=("G",))
def _update_level(X: jnp.ndarray, g: jnp.ndarray, C: jnp.ndarray, G: int):
    """M-step: per-group bit-wise majority vote (sign of the sum); empty
    groups keep their current center."""
    S = jnp.zeros((G, N_BITS), jnp.float32).at[g].add(X, mode="drop")
    cnt = jnp.zeros((G, 1), jnp.float32).at[g, 0].add(1.0, mode="drop")
    newC = jnp.where(S >= 0, 1, -1).astype(jnp.int8)
    return jnp.where(cnt > 0, newC, C)


def _init_level(key, X: jnp.ndarray, node: jnp.ndarray, k: int, G: int):
    """Initial centers: k distinct random members per node (k-means-style
    subset init — a random PARTITION init would majority-vote every child
    of a node to the same sign vector and collapse the level)."""
    n = X.shape[0]
    r = jax.random.uniform(key, (n,))
    order = jnp.lexsort((r, node))
    sn = node[order]
    seg_start = jnp.concatenate([jnp.ones((1,), bool), sn[1:] != sn[:-1]])
    idxs = jnp.arange(n, dtype=jnp.int32)
    start_idx = jax.lax.cummax(jnp.where(seg_start, idxs, 0))
    rank = idxs - start_idx
    target = jnp.where(rank < k, sn * k + rank, G)  # OOB -> dropped
    key2 = jax.random.fold_in(key, 1)
    Cinit = jnp.where(
        jax.random.bernoulli(key2, 0.5, (G, N_BITS)), 1, -1
    ).astype(jnp.int8)
    return Cinit.at[target].set(X[order].astype(jnp.int8), mode="drop")


def train_batched(
    descriptors: np.ndarray, k: int = 9, levels: int = 6, iters: int = 6,
    seed: int = 0, doc_ids: np.ndarray | None = None,
) -> Vocabulary:
    """Level-synchronous device trainer — the reference-scale path.

    All k^l nodes of a level train their k children SIMULTANEOUSLY:
    assignment is a gathered (N, k, 256) contraction, the center update a
    segment-sum majority vote over (G, 256).  Host work is O(levels), not
    O(nodes) — a k=9, L=6 tree (66,430 internal nodes, 531,441 words)
    trains in seconds where the recursive oracle would take hours.
    """
    X = jnp.asarray(np.asarray(descriptors), jnp.float32)
    n = X.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    key = jax.random.PRNGKey(seed)
    centers = []
    for level in range(levels):
        G = k ** (level + 1)
        key, k1 = jax.random.split(key)
        C = _init_level(k1, X, node, k, G)
        for _ in range(iters):
            g = _assign_level(X, node, C, k)
            C = _update_level(X, g, C, G)
        node = _assign_level(X, node, C, k)
        centers.append(C)
    voc = Vocabulary(k=k, levels=levels, centers=centers,
                     idf=np.ones((k**levels,), np.float32))
    _idf_of(voc, np.asarray(X), doc_ids)
    return voc


# -- transform ---------------------------------------------------------------


# Levels whose full table fits under this row count are scored with one
# dense MXU matmul against the WHOLE level and resolved with a MASKED
# argmax (each descriptor's row masked to its node's contiguous k-child
# column block) — zero data-dependent gathers.  An earlier dense variant
# lost to the gathers (0.95 vs 0.81 ms) because it still ran a
# take_along_axis gather to extract the child block; masking + argmax
# over the full row removes that.  Measured on TPU v5e
# (tools/profile_lc_micro.py, 512 descriptors, k=9 L=6): descent
# 0.776 ms all-gathers -> 0.37 ms with levels 0-3 masked-argmax (the
# remaining cost is the two deep levels' (k, 256) sibling-block gathers
# against the 15/136 MB HBM tables, which a dense matmul cannot touch —
# level 4 dense measured 1.24 ms from its 121 MB dots intermediate).
_DESCEND_MASKED_ARGMAX_MAX_NODES = 8192


def _descend(centers: list, desc_sign: jnp.ndarray, k: int, upto: int) -> jnp.ndarray:
    """Shared argmax-descent: returns node ids at level `upto`.

    Small levels (table <= _DESCEND_MASKED_ARGMAX_MAX_NODES rows): dense
    (N, G) bf16 matmul + masked argmax over the full level (gather-free;
    the argmax directly yields the GLOBAL child index).  Deep levels:
    gather ONE contiguous (k, 256) child block per descriptor (a sibling
    group is k*256 adjacent bytes).  Both paths run bf16 on the MXU:
    sign vectors are {-1,+1}, every partial sum is an integer |.| <= 256
    exactly representable in bf16/f32, and ties resolve to the first
    (lowest-index) entry in both forms, so the paths are bit-identical.
    """
    n = desc_sign.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    q = desc_sign.astype(jnp.bfloat16)
    for l in range(upto):
        G = centers[l].shape[0]
        if G <= _DESCEND_MASKED_ARGMAX_MAX_NODES:
            dots_all = jnp.einsum(
                "nd,gd->ng", q, centers[l].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # (N, G)
            owner = jnp.arange(G, dtype=jnp.int32) // k  # parent of col g
            masked = jnp.where(
                owner[None, :] == node[:, None], dots_all, -jnp.inf
            )
            node = jnp.argmax(masked, axis=1).astype(jnp.int32)
        elif _descend_use_pallas():
            # All remaining levels are deep: one Pallas kernel with a
            # double-buffered HBM DMA pipeline replaces XLA's serialized
            # random-access gathers (bit-identical; ops/vocab_pallas.py).
            # Tables carrying prepare_centers_for_scan's tail pad (rows
            # above k^(l+1)) are passed through as-is; raw tables are
            # padded inside deep_descend (fine standalone — but prepare
            # BEFORE any lax.scan, or the pad copies 136 MB per step).
            from ros_stereo_slam_tpu.ops import vocab_pallas

            deep = tuple(
                jnp.asarray(centers[m], jnp.int8) for m in range(l, upto)
            )
            already = all(
                centers[m].shape[0] > k ** (m + 1) for m in range(l, upto)
            )
            return vocab_pallas.deep_descend(
                desc_sign, node, deep, k, padded=already
            )
        else:
            tbl = centers[l].reshape(-1, k, N_BITS)  # (k^l, k, 256) int8
            cand = tbl[node].astype(jnp.bfloat16)  # (N, k, 256)
            dots = jnp.einsum("nd,nkd->nk", q, cand,
                              preferred_element_type=jnp.float32)
            best = jnp.argmax(dots, axis=1).astype(jnp.int32)
            node = node * k + best
    return node


def _descend_use_pallas() -> bool:
    """Deep levels route to the Pallas DMA kernel on TPU backends only
    (the gather path remains the CPU/test oracle)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def prepare_centers_for_scan(centers: tuple, k: int) -> tuple:
    """Tail-pad deep-level tables for the Pallas descent's 8-aligned DMA
    windows.  MUST run outside any ``lax.scan`` that calls
    :func:`transform_words`/:func:`_descend` — the pad copies the
    136 MB deep table, once per dispatch here vs once per FRAME if left
    inside the scan body (measured: the in-step pad cost more than the
    gathers it replaced).  Idempotent; a no-op off-TPU.
    """
    if not _descend_use_pallas():
        return tuple(centers)
    from ros_stereo_slam_tpu.ops import vocab_pallas

    out = []
    for l, c in enumerate(centers):
        expected = k ** (l + 1)
        if (c.shape[0] == expected
                and expected > _DESCEND_MASKED_ARGMAX_MAX_NODES):
            out.append(vocab_pallas.pad_table(jnp.asarray(c, jnp.int8), k))
        else:
            out.append(c)
    return tuple(out)


def transform_words(voc: Vocabulary, desc_sign: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) sign descriptors -> (N,) word ids (leaf indices)."""
    return _descend(voc.centers, desc_sign, voc.k, voc.levels)


# -- dense BoW (oracle form, small vocabularies) ------------------------------


@partial(jax.jit, static_argnames=("n_words",))
def bow_row(
    words: jnp.ndarray, valid: jnp.ndarray, idf: jnp.ndarray, n_words: int
) -> jnp.ndarray:
    """Sparse word list -> L1-normalized TF-IDF dense BoW row (n_words,).

    The test oracle for the sparse form below; O(n_words) storage, do not
    use at reference scale.
    """
    w = jnp.where(valid, idf[words], 0.0)
    row = jnp.zeros((n_words,), jnp.float32).at[words].add(w)
    norm = jnp.sum(jnp.abs(row))
    return row / jnp.maximum(norm, 1e-12)


def score_l1(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score: s = 1 - 0.5 * |q - d|_1, batched over db rows."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(query[None, :] - db), axis=1)


# -- sparse BoW (the scale-true form) ------------------------------------


@partial(jax.jit, static_argnames=("n_words",))
def bow_sparse(
    words: jnp.ndarray, valid: jnp.ndarray, idf: jnp.ndarray, n_words: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N,) word ids + validity -> fixed-width sparse BoW.

    Returns ``(uwords, uvals)`` each (N,): unique word ids with merged,
    L1-normalized TF-IDF weights; padding entries are (word 0, weight 0)
    — weight 0 contributes nothing to a min-intersection score.
    """
    n = words.shape[0]
    w = jnp.where(valid, idf[words], 0.0)
    big = jnp.iinfo(jnp.int32).max
    order = jnp.argsort(jnp.where(valid, words, big))
    sw = words[order]
    sv = valid[order]
    svw = jnp.where(sv, w[order], 0.0)
    first = sv & jnp.concatenate(
        [jnp.ones((1,), bool), sw[1:] != sw[:-1]]
    )
    # duplicate-merge via an (n,)-wide segment sum over sorted runs — a
    # transient dense (n_words,) row would cost a 531k-row TPU scatter
    # at the reference scale.  Invalid rows sort to the tail with zero
    # weight; an all-invalid frame keeps seg at -1 and produces zeros.
    seg = jnp.maximum(jnp.cumsum(first.astype(jnp.int32)) - 1, 0)
    sums = jnp.zeros((n,), jnp.float32).at[seg].add(svw)
    uw = jnp.where(first, sw, 0)
    uv = jnp.where(first, sums[seg], 0.0)
    norm = jnp.sum(uv)
    return uw, uv / jnp.maximum(norm, 1e-12)


def dense_of_sparse(uw: jnp.ndarray, uv: jnp.ndarray, n_words: int) -> jnp.ndarray:
    """Scatter a sparse BoW into its dense (n_words,) row (~2 MB at the
    reference scale — ONE row, never a (capacity, n_words) matrix)."""
    return jnp.zeros((n_words,), jnp.float32).at[uw].add(uv)


def score_db_sparse(
    q_dense: jnp.ndarray, db_words: jnp.ndarray, db_wvals: jnp.ndarray
) -> jnp.ndarray:
    """Min-intersection L1 score of a dense query row against the sparse
    database: gather + masked min-sum, (capacity,) out.

    Exact under merged-unique database rows: for L1-normalized q, d >= 0,
    1 - 0.5*||q - d||_1 == sum_w min(q_w, d_w); padded entries carry
    weight 0 and vanish under the min.
    """
    g = q_dense[db_words]  # (cap, nf)
    return jnp.sum(jnp.minimum(g, db_wvals), axis=1)


def score_pair_sparse(q_dense: jnp.ndarray, w: jnp.ndarray, v: jnp.ndarray):
    """Min-intersection score of a dense query row vs ONE sparse row."""
    return jnp.sum(jnp.minimum(q_dense[w], v))


# -- binned shortlist + exact rescore (the TPU-fast query) -----------------
#
# Profiling the scan-mode detector at reference scale (tools/
# profile_lc_micro.py, TPU v5e) put ~15.0 ms of the 17.9 ms detection
# step in the dense-row construction + database gather: a scatter of 512
# weights into a (531441,) row and an elementwise gather back lower to
# near-serial TPU code whose cost is independent of database size.  The
# MXU-native replacement never materializes the vocabulary axis:
#
#   1. each frame's sparse BoW is folded into a fixed (n_bins,) histogram
#      (word id mod n_bins) — a scatter into 4096 lanes, not 531k;
#   2. the database keeps a (capacity, n_bins) bf16 matrix of those
#      histograms: scoring is ONE matvec on the MXU (~33 MB read);
#   3. the binned dot is only a shortlist ranking — the top `shortlist`
#      candidates are re-scored EXACTLY (min-intersection over the sparse
#      word lists, an equality-mask reduction) and the final top-K comes
#      from the exact scores, so the nss/alpha/island gates see the same
#      numbers the dense-oracle path produces.
#
# Bin collisions (531k -> 4096) only perturb the shortlist ordering; with
# ~300 unique words/frame a bin holds ~0.07 words, and the exact rescore
# repairs any inflation before the gates.


def bin_of_sparse(uw: jnp.ndarray, uv: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Sparse BoW -> (n_bins,) binned histogram (word id mod n_bins).

    Padding rows are (word 0, weight 0) — they land in bin 0 with zero
    mass."""
    return jnp.zeros((n_bins,), jnp.float32).at[uw % n_bins].add(uv)


def score_db_binned(q_bins: jnp.ndarray, db_bins: jnp.ndarray) -> jnp.ndarray:
    """Shortlist scores: one (capacity, n_bins) @ (n_bins,) bf16 matvec."""
    return (db_bins.astype(jnp.bfloat16) @ q_bins.astype(jnp.bfloat16)
            ).astype(jnp.float32)


def score_pair_min(uw, uv, w, v) -> jnp.ndarray:
    """Exact min-intersection of two sparse rows (no dense row needed).

    Both rows carry merged-unique word ids with zero-weight padding, so
    the (nf, nf) equality mask pairs each shared word exactly once and
    padding contributes min(0, .) = 0.
    """
    eq = w[:, None] == uw[None, :]
    m = jnp.minimum(v[:, None], uv[None, :])
    return jnp.sum(jnp.where(eq, m, 0.0))


def rescore_min(uw, uv, cw, cv) -> jnp.ndarray:
    """Exact min-intersection of the query vs C candidate sparse rows.

    (C, nf, nf) equality-mask reduction — VPU work that XLA fuses without
    materializing the cube (C=128, nf=512 -> 33M lanes/frame).
    """
    eq = cw[:, :, None] == uw[None, None, :]
    m = jnp.minimum(cv[:, :, None], uv[None, None, :])
    return jnp.sum(jnp.where(eq, m, 0.0), axis=(1, 2))
