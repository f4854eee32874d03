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


def test_vocab_save_load(trained_vocab, tmp_path):
    voc, descs, _ = trained_vocab
    path = str(tmp_path / "voc.npz")
    voc.save(path)
    voc2 = vocab_mod.Vocabulary.load(path)
    w1 = np.asarray(vocab_mod.transform_words(voc, jnp.asarray(descs[:32])))
    w2 = np.asarray(vocab_mod.transform_words(voc2, jnp.asarray(descs[:32])))
    np.testing.assert_array_equal(w1, w2)
