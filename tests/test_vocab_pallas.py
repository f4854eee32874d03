"""Deep-descent Pallas kernel == gather-path oracle (bit-identical).

Centers and descriptors are {-1,+1} sign vectors, so every dot is an
exact small integer in f32 and bf16 alike; the kernel's running
first-max argmax must therefore reproduce the gather path's jnp.argmax
exactly, including ties (ops/vocab_pallas.py numerics note).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.ops import vocab_pallas
from ros_stereo_slam_tpu.ops.orb import N_BITS


def _signs(rng, shape):
    return rng.choice(np.array([-1.0, 1.0], np.float32), size=shape)


def _oracle(centers, q, node, k):
    """The gather path for the same deep levels."""
    for tbl in centers:
        t = tbl.reshape(-1, k, N_BITS)
        cand = jnp.asarray(t)[node].astype(jnp.bfloat16)
        dots = jnp.einsum("nd,nkd->nk", q.astype(jnp.bfloat16), cand,
                          preferred_element_type=jnp.float32)
        node = node * k + jnp.argmax(dots, axis=1).astype(jnp.int32)
    return node


def test_deep_descend_matches_gather_oracle():
    rng = np.random.default_rng(3)
    k, n = 5, 64
    # two deep levels rooted at 25 entry nodes: tables (125, 256) and
    # (625, 256)
    t0 = _signs(rng, (k**3, N_BITS)).astype(np.int8)
    t1 = _signs(rng, (k**4, N_BITS)).astype(np.int8)
    q = jnp.asarray(_signs(rng, (n, N_BITS)))
    node = jnp.asarray(rng.integers(0, k**2, size=n), jnp.int32)
    out = vocab_pallas.deep_descend(
        q, node, (jnp.asarray(t0), jnp.asarray(t1)), k, interpret=True
    )
    ref = _oracle([t0, t1], q, node, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_deep_descend_tie_breaking_first_max():
    """Duplicate sibling rows force exact ties -> lowest index wins."""
    rng = np.random.default_rng(7)
    k, n = 4, 32
    t = _signs(rng, (k**2, N_BITS))
    t = t.reshape(-1, k, N_BITS)
    t[:, 2] = t[:, 1]  # sibling 2 duplicates sibling 1 in every group
    t = t.reshape(-1, N_BITS).astype(np.int8)
    q = jnp.asarray(_signs(rng, (n, N_BITS)))
    node = jnp.asarray(rng.integers(0, k, size=n), jnp.int32)
    out = vocab_pallas.deep_descend(q, node, (jnp.asarray(t),), k,
                                    interpret=True)
    ref = _oracle([t], q, node, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_full_transform_unchanged_small_vocab():
    """transform_words still bit-matches the tiny-vocab oracle path
    (small levels go through masked-argmax, not the kernel)."""
    rng = np.random.default_rng(11)
    X = _signs(rng, (400, N_BITS))
    voc = vocab_mod.train(X, k=3, levels=3)
    w = vocab_mod.transform_words(voc, jnp.asarray(X))
    assert w.shape == (400,)
    assert int(jnp.max(w)) < voc.n_words


def test_deep_descend_chunks_large_n(monkeypatch):
    """Calls above the VMEM point cap split exactly (the vocab trainer
    transforms tens of thousands of descriptors in one call; measured
    scoped-VMEM OOM at N=31,360 before chunking)."""
    rng = np.random.default_rng(11)
    k, n = 5, 64
    t0 = _signs(rng, (k**3, N_BITS)).astype(np.int8)
    q = jnp.asarray(_signs(rng, (n, N_BITS)))
    node = jnp.asarray(rng.integers(0, k**2, size=n), jnp.int32)
    whole = vocab_pallas.deep_descend(
        q, node, (jnp.asarray(t0),), k, interpret=True
    )
    monkeypatch.setattr(vocab_pallas, "_N_CAP", 24)  # force 3 chunks
    chunked = vocab_pallas.deep_descend(
        q, node, (jnp.asarray(t0),), k, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))
