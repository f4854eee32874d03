"""ORB descriptor + vocabulary + BoW scoring tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.data.synthetic import _smooth_noise_2d
from ros_stereo_slam_tpu.models import vocab as vocab_mod
from ros_stereo_slam_tpu.ops import orb


@pytest.fixture(scope="module")
def textured_image():
    rng = np.random.default_rng(7)
    return _smooth_noise_2d((240, 320), rng, octaves=6, base_period=32)


def test_orb_deterministic(textured_image):
    f1 = orb.detect_and_compute(jnp.asarray(textured_image), 128)
    f2 = orb.detect_and_compute(jnp.asarray(textured_image), 128)
    np.testing.assert_array_equal(np.asarray(f1.desc_bits), np.asarray(f2.desc_bits))
    assert int(f1.valid.sum()) > 32


def test_hamming_packed_vs_mxu(textured_image):
    f = orb.detect_and_compute(jnp.asarray(textured_image), 128)
    hp = np.asarray(orb.hamming_packed(f.desc_bits, f.desc_bits))
    hm = np.asarray(orb.hamming_mxu(f.desc_sign, f.desc_sign))
    valid = np.asarray(f.valid)
    m = valid[:, None] & valid[None, :]
    np.testing.assert_allclose(hp[m], hm[m], atol=0.5)
    assert (np.diag(hp)[valid] == 0).all()


def test_orb_matches_shifted_image(textured_image):
    img = textured_image
    shifted = np.roll(img, (0, 7), axis=(0, 1)).astype(np.float32)
    f1 = orb.detect_and_compute(jnp.asarray(img), 128)
    f2 = orb.detect_and_compute(jnp.asarray(shifted), 128)
    ham = np.array(orb.hamming_mxu(f1.desc_sign, f2.desc_sign))
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    ham[~v1] = 999
    ham[:, ~v2] = 999
    best = ham.argmin(axis=1)
    p1 = np.asarray(f1.pts)
    p2 = np.asarray(f2.pts)
    # For well-matched descriptors the displacement must be ~(+7, 0).
    good = ham[np.arange(len(best)), best] < 40
    good &= v1
    assert good.sum() > 20
    dx = p2[best[good], 0] - p1[good, 0]
    dy = p2[best[good], 1] - p1[good, 1]
    assert np.median(np.abs(dx - 7)) < 1.5
    assert np.median(np.abs(dy)) < 1.5


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.random((16, orb.N_BITS)) > 0.5
    packed = orb.pack_bits(jnp.asarray(bits))
    back = np.asarray(orb.unpack_bits(packed))
    np.testing.assert_array_equal(back, bits)


@pytest.fixture(scope="module")
def trained_vocab():
    rng = np.random.default_rng(1)
    # 3 descriptor "clusters" + noise, multiple documents.
    protos = np.where(rng.random((12, orb.N_BITS)) > 0.5, 1.0, -1.0)
    descs, docs = [], []
    for d in range(20):
        for _ in range(40):
            p = protos[rng.integers(12)].copy()
            flip = rng.random(orb.N_BITS) < 0.05
            p[flip] *= -1
            descs.append(p)
            docs.append(d)
    descs = np.asarray(descs, np.float32)
    voc = vocab_mod.train(descs, k=4, levels=3, doc_ids=np.asarray(docs))
    return voc, descs, protos


def test_vocab_same_descriptor_same_word(trained_vocab):
    voc, descs, protos = trained_vocab
    w1 = np.asarray(vocab_mod.transform_words(voc, jnp.asarray(descs[:64])))
    w2 = np.asarray(vocab_mod.transform_words(voc, jnp.asarray(descs[:64])))
    np.testing.assert_array_equal(w1, w2)
    assert (w1 >= 0).all() and (w1 < voc.n_words).all()


def test_vocab_similar_descriptors_share_words(trained_vocab):
    voc, descs, protos = trained_vocab
    rng = np.random.default_rng(2)
    base = protos[0]
    sims = []
    for _ in range(32):
        p = base.copy()
        flip = rng.random(orb.N_BITS) < 0.03
        p[flip] *= -1
        sims.append(p)
    words = np.asarray(
        vocab_mod.transform_words(voc, jnp.asarray(np.asarray(sims, np.float32)))
    )
    # Near-duplicates of one prototype overwhelmingly map to one word.
    _, counts = np.unique(words, return_counts=True)
    assert counts.max() >= 24


def test_bow_score_properties(trained_vocab):
    voc, descs, _ = trained_vocab
    idf = jnp.asarray(voc.idf)
    w1 = vocab_mod.transform_words(voc, jnp.asarray(descs[:40]))
    w2 = vocab_mod.transform_words(voc, jnp.asarray(descs[40:80]))
    valid = jnp.ones((40,), bool)
    v1 = vocab_mod.bow_row(w1, valid, idf, voc.n_words)
    v2 = vocab_mod.bow_row(w2, valid, idf, voc.n_words)
    s_self = float(vocab_mod.score_l1(v1, v1[None])[0])
    s_cross = float(vocab_mod.score_l1(v1, v2[None])[0])
    assert abs(s_self - 1.0) < 1e-5
    assert -1e-6 <= s_cross <= s_self


def test_sparse_bow_matches_dense_oracle(trained_vocab):
    """bow_sparse + min-intersection scoring must equal the dense L1 form
    (s = 1 - 0.5*||q-d||_1 == sum_w min(q_w, d_w) for L1-normalized rows),
    including merged duplicate words and invalid padding."""
    voc, descs, _ = trained_vocab
    idf = jnp.asarray(voc.idf)
    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        w = vocab_mod.transform_words(
            voc, jnp.asarray(descs[i * 40 : i * 40 + 40])
        )
        valid = jnp.asarray(rng.random(40) > 0.2)
        rows.append((w, valid))
    # dense oracle
    dense = [vocab_mod.bow_row(w, v, idf, voc.n_words) for w, v in rows]
    oracle = np.asarray(vocab_mod.score_l1(dense[0], jnp.stack(dense)))
    # sparse form
    sparse = [vocab_mod.bow_sparse(w, v, idf, voc.n_words) for w, v in rows]
    q_dense = vocab_mod.dense_of_sparse(*sparse[0], voc.n_words)
    db_words = jnp.stack([s[0] for s in sparse])
    db_wvals = jnp.stack([s[1] for s in sparse])
    got = np.asarray(vocab_mod.score_db_sparse(q_dense, db_words, db_wvals))
    np.testing.assert_allclose(got, oracle, atol=1e-5)
    # pair score agrees too
    s_pair = float(vocab_mod.score_pair_sparse(q_dense, *sparse[3]))
    np.testing.assert_allclose(s_pair, oracle[3], atol=1e-5)


def test_sparse_bow_all_invalid_scores_zero(trained_vocab):
    voc, descs, _ = trained_vocab
    idf = jnp.asarray(voc.idf)
    w = vocab_mod.transform_words(voc, jnp.asarray(descs[:40]))
    uw, uv = vocab_mod.bow_sparse(w, jnp.zeros((40,), bool), idf, voc.n_words)
    assert float(jnp.sum(uv)) == 0.0
    q = vocab_mod.dense_of_sparse(
        *vocab_mod.bow_sparse(w, jnp.ones((40,), bool), idf, voc.n_words),
        voc.n_words,
    )
    assert float(vocab_mod.score_pair_sparse(q, uw, uv)) == 0.0


def test_train_batched_clusters_like_recursive(trained_vocab):
    """The level-synchronous device trainer must produce a vocabulary with
    the same qualitative behavior as the recursive oracle: near-duplicate
    descriptors map to one word, distinct prototypes separate."""
    _, descs, protos = trained_vocab
    docs = np.repeat(np.arange(20), 40)
    voc = vocab_mod.train_batched(descs, k=4, levels=3, doc_ids=docs, seed=3)
    rng = np.random.default_rng(2)
    sims = []
    for _ in range(32):
        p = protos[0].copy()
        flip = rng.random(orb.N_BITS) < 0.03
        p[flip] *= -1
        sims.append(p)
    words = np.asarray(
        vocab_mod.transform_words(voc, jnp.asarray(np.asarray(sims, np.float32)))
    )
    _, counts = np.unique(words, return_counts=True)
    assert counts.max() >= 24
    # distinct prototypes land on many distinct words
    pwords = np.asarray(
        vocab_mod.transform_words(voc, jnp.asarray(protos.astype(np.float32)))
    )
    assert len(np.unique(pwords)) >= 6
    # idf is populated (TF-IDF path ran)
    assert (voc.idf > 0).any()


def test_sparse_scoring_at_reference_vocab_scale():
    """Scoring math at the TRUE reference vocabulary size (k=9, L=6 =
    531,441 words): a sparse database never materializes (cap, n_words);
    scores must equal a host dict-intersection oracle."""
    n_words = 9**6
    nf = 64
    cap = 16
    rng = np.random.default_rng(11)
    db_words = rng.integers(0, n_words, (cap, nf)).astype(np.int32)
    # force overlaps with the query on some rows
    q_words = rng.integers(0, n_words, (nf,)).astype(np.int32)
    db_words[3, :20] = q_words[:20]
    db_words[7, 10:40] = q_words[10:40]
    db_vals = rng.random((cap, nf)).astype(np.float32)
    db_vals /= db_vals.sum(axis=1, keepdims=True)
    q_vals = rng.random((nf,)).astype(np.float32)
    q_vals /= q_vals.sum()
    # host oracle: dict min-intersection (rows here are unique by
    # construction w.h.p. at 531k words; assert to be safe)
    assert len(np.unique(q_words)) == nf
    oracle = np.zeros((cap,), np.float32)
    qd = {int(w): float(v) for w, v in zip(q_words, q_vals)}
    for c in range(cap):
        assert len(np.unique(db_words[c])) == nf
        oracle[c] = sum(
            min(qd[int(w)], float(v))
            for w, v in zip(db_words[c], db_vals[c])
            if int(w) in qd
        )
    q_dense = vocab_mod.dense_of_sparse(
        jnp.asarray(q_words), jnp.asarray(q_vals), n_words
    )
    got = np.asarray(
        vocab_mod.score_db_sparse(
            q_dense, jnp.asarray(db_words), jnp.asarray(db_vals)
        )
    )
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def test_pair_min_matches_dense_oracle(trained_vocab):
    """score_pair_min (pure sparse, no dense row) == dense L1 pair score,
    including merged duplicates and zero-weight padding on BOTH sides."""
    voc, descs, _ = trained_vocab
    idf = jnp.asarray(voc.idf)
    rng = np.random.default_rng(9)
    rows = []
    for i in range(4):
        w = vocab_mod.transform_words(
            voc, jnp.asarray(descs[i * 40 : i * 40 + 40])
        )
        valid = jnp.asarray(rng.random(40) > 0.3)
        rows.append(vocab_mod.bow_sparse(w, valid, idf, voc.n_words))
    for i in range(4):
        for j in range(4):
            q_dense = vocab_mod.dense_of_sparse(*rows[i], voc.n_words)
            want = float(vocab_mod.score_pair_sparse(q_dense, *rows[j]))
            got = float(vocab_mod.score_pair_min(*rows[i], *rows[j]))
            np.testing.assert_allclose(got, want, atol=1e-5)


def test_binned_shortlist_rescore_matches_dense_oracle(trained_vocab):
    """Binned-matvec shortlist + rescore_min == exact dense db scoring
    whenever the shortlist covers the database (the regime every gate
    depends on: exact scores for everything that survives the shortlist)."""
    voc, descs, _ = trained_vocab
    idf = jnp.asarray(voc.idf)
    rng = np.random.default_rng(13)
    rows = []
    for i in range(8):
        w = vocab_mod.transform_words(
            voc, jnp.asarray(descs[(i * 37) % 400 : (i * 37) % 400 + 40])
        )
        valid = jnp.asarray(rng.random(40) > 0.25)
        rows.append(vocab_mod.bow_sparse(w, valid, idf, voc.n_words))
    q = rows[0]
    db_words = jnp.stack([r[0] for r in rows])
    db_wvals = jnp.stack([r[1] for r in rows])
    q_dense = vocab_mod.dense_of_sparse(*q, voc.n_words)
    oracle = np.asarray(vocab_mod.score_db_sparse(q_dense, db_words, db_wvals))
    # shortlist covering the whole db -> rescore must reproduce every score
    n_bins = 32
    q_bins = vocab_mod.bin_of_sparse(*q, n_bins)
    db_bins = jnp.stack(
        [vocab_mod.bin_of_sparse(*r, n_bins) for r in rows]
    ).astype(jnp.bfloat16)
    sdot = np.asarray(vocab_mod.score_db_binned(q_bins, db_bins))
    order = np.argsort(-sdot)
    got = np.asarray(
        vocab_mod.rescore_min(*q, db_words[order], db_wvals[order])
    )
    np.testing.assert_allclose(got, oracle[order], atol=1e-5)
    # the binned ranking must put the self-match (exact score 1.0) first —
    # the property the shortlist relies on: strong matches share many
    # words, so their binned histograms correlate strongly.
    assert order[0] == 0


def test_rescore_min_at_reference_vocab_scale():
    """rescore_min at 531,441 words: exact vs host dict oracle, no dense
    row anywhere (the production query path after the binned shortlist)."""
    n_words = 9**6
    nf = 64
    cap = 12
    rng = np.random.default_rng(17)
    db_words = rng.integers(1, n_words, (cap, nf)).astype(np.int32)
    q_words = rng.integers(1, n_words, (nf,)).astype(np.int32)
    db_words[2, :24] = q_words[:24]
    db_words[9, 30:50] = q_words[30:50]
    db_vals = rng.random((cap, nf)).astype(np.float32)
    db_vals /= db_vals.sum(axis=1, keepdims=True)
    q_vals = rng.random((nf,)).astype(np.float32)
    q_vals /= q_vals.sum()
    qd = {int(w): float(v) for w, v in zip(q_words, q_vals)}
    oracle = np.asarray([
        sum(
            min(qd[int(w)], float(v))
            for w, v in zip(db_words[c], db_vals[c])
            if int(w) in qd
        )
        for c in range(cap)
    ], np.float32)
    got = np.asarray(vocab_mod.rescore_min(
        jnp.asarray(q_words), jnp.asarray(q_vals),
        jnp.asarray(db_words), jnp.asarray(db_vals),
    ))
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def test_vocab_save_load(trained_vocab, tmp_path):
    voc, descs, _ = trained_vocab
    path = str(tmp_path / "voc.npz")
    voc.save(path)
    voc2 = vocab_mod.Vocabulary.load(path)
    w1 = np.asarray(vocab_mod.transform_words(voc, jnp.asarray(descs[:32])))
    w2 = np.asarray(vocab_mod.transform_words(voc2, jnp.asarray(descs[:32])))
    np.testing.assert_array_equal(w1, w2)
