"""Hierarchical binary-descriptor vocabulary (reference C10).

TPU-native replacement for DBoW2's ``TemplatedVocabulary`` (k-ary tree,
k=9, L=6 in the reference, ``/root/reference/src/bagOfWordsDetector.cpp:21``)
and the offline builder tool (``testVocCreation`` ``:47-99``).  The
reference's prebuilt ``orb_voc*.yml.gz`` files are absent from its repo
(``.MISSING_LARGE_BLOBS``), so training is first-class here.

Design:
- The tree is a dense per-level array of sign-vector centers
  (``levels[l]: (k^(l+1), 256) float {-1,+1}-ish``); node n's children
  occupy rows [n*k, (n+1)*k).
- Transform = L rounds of batched argmin Hamming descent; each round is
  one gathered (N, k, 256) contraction (MXU-shaped, no pointer chasing).
- Training = recursive binary k-means on {-1,+1} vectors: means are
  sign-quantized centroids (the binary-median, as DBoW2 uses bit-wise
  majority vote).
- Word weights: TF-IDF (the reference's weighting, bagOfWordsDetector
  ``:21`` TF_IDF).
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
    centers: list  # per level l: (k**(l+1), 256) float32 sign vectors
    idf: np.ndarray  # (k**levels,) float32 word weights

    @property
    def n_words(self) -> int:
        return self.k**self.levels

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        arrs = {f"level_{i}": np.asarray(c) for i, c in enumerate(self.centers)}
        np.savez_compressed(
            path, k=self.k, levels=self.levels, idf=self.idf, **arrs
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        levels = int(z["levels"])
        centers = [jnp.asarray(z[f"level_{i}"]) for i in range(levels)]
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


def train(
    descriptors: np.ndarray, k: int = 9, levels: int = 4, seed: int = 0,
    doc_ids: np.ndarray | None = None,
) -> Vocabulary:
    """Build the tree from (N, 256) sign descriptors.

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
                     centers=[jnp.asarray(c) for c in centers],
                     idf=np.ones((k**levels,), np.float32))
    # IDF from the training corpus.
    if doc_ids is not None and X.shape[0]:
        words = np.asarray(transform_words(voc, jnp.asarray(X)))
        n_docs = len(np.unique(doc_ids))
        df = np.zeros((k**levels,), np.int64)
        for d in np.unique(doc_ids):
            df[np.unique(words[doc_ids == d])] += 1
        idf = np.log(n_docs / np.maximum(df, 1)).astype(np.float32)
        idf[df == 0] = 0.0
        voc.idf = idf
    return voc


def _descend(centers: list, desc_sign: jnp.ndarray, k: int, upto: int) -> jnp.ndarray:
    """Shared argmax-descent: returns node ids at level `upto`."""
    n = desc_sign.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for l in range(upto):
        tbl = centers[l]  # (k^(l+1), 256)
        child0 = node * k
        idx = child0[:, None] + jnp.arange(k)[None, :]  # (N, k)
        cand = tbl[idx]  # (N, k, 256)
        dots = jnp.einsum("nd,nkd->nk", desc_sign, cand)
        best = jnp.argmax(dots, axis=1).astype(jnp.int32)
        node = child0 + best
    return node


def transform_words(voc: Vocabulary, desc_sign: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) sign descriptors -> (N,) word ids (leaf indices)."""
    return _descend(voc.centers, desc_sign, voc.k, voc.levels)


def transform_nodes(voc: Vocabulary, desc_sign: jnp.ndarray, level: int) -> jnp.ndarray:
    """Node ids at an intermediate level (the DBoW2 'direct index' level,
    reference di_levels=2, ``include/visualSLAM.h:126``)."""
    return _descend(voc.centers, desc_sign, voc.k, level)


@partial(jax.jit, static_argnames=("n_words",))
def bow_row(
    words: jnp.ndarray, valid: jnp.ndarray, idf: jnp.ndarray, n_words: int
) -> jnp.ndarray:
    """Sparse word list -> L1-normalized TF-IDF dense BoW row (n_words,)."""
    w = jnp.where(valid, idf[words], 0.0)
    row = jnp.zeros((n_words,), jnp.float32).at[words].add(w)
    norm = jnp.sum(jnp.abs(row))
    return row / jnp.maximum(norm, 1e-12)


def score_l1(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score: s = 1 - 0.5 * |q - d|_1, batched over db rows."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(query[None, :] - db), axis=1)
