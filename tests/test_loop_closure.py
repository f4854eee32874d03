"""Loop-closure detector tests: revisit detection with geometric gating."""

import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.config import LoopClosureConfig
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.models import loop_closure, vocab as vocab_mod
from ros_stereo_slam_tpu.ops import orb


@pytest.fixture(scope="module")
def loop_setup():
    world = small_world(n_frames=10, seed=9)
    frames = [world.render(i)[0] for i in range(10)]
    feats = [orb.detect_and_compute(jnp.asarray(f), 128) for f in frames]
    descs = np.concatenate([np.asarray(f.desc_sign)[np.asarray(f.valid)] for f in feats])
    docs = np.concatenate(
        [np.full(int(f.valid.sum()), i) for i, f in enumerate(feats)]
    )
    voc = vocab_mod.train(descs, k=4, levels=3, doc_ids=docs)
    return world, frames, feats, voc


def _cfg():
    return LoopClosureConfig(
        orb_features=128, dislocal=2, min_separation=5, cooldown=3,
        k_consistency=1, geom_min_points=12, db_capacity=64,
        alpha=0.3, min_nss=0.001,
    )


def test_detects_revisit(loop_setup):
    world, frames, feats, voc = loop_setup
    cfg = _cfg()
    det = loop_closure.LoopDetector(vocab=voc, config=cfg)
    # First pass: frames 0..9 (no loops expected — trajectory is forward).
    for i in range(10):
        cand = det.detect(i, feats[i])
    # Revisit: replay frames 2, 3, 4 as ids 10..12.
    hits = []
    for k, orig in enumerate((2, 3, 4)):
        cand = det.detect(10 + k, feats[orig])
        if cand is not None:
            hits.append((cand.query, cand.match, cand.n_inliers))
    assert hits, "revisit must be detected"
    # Matches must point near the originally visited frames (2-4), and the
    # geometric check must produce many inliers (identical images).
    for q, m, n_inl in hits:
        assert abs(m - (q - 8)) <= 3, (q, m)
        assert n_inl >= 12


def test_no_false_positive_on_forward_motion(loop_setup):
    world, frames, feats, voc = loop_setup
    cfg = _cfg()
    det = loop_closure.LoopDetector(vocab=voc, config=cfg)
    fps = []
    for i in range(10):
        cand = det.detect(i, feats[i])
        if cand is not None:
            fps.append((cand.query, cand.match))
    # Forward corridor flight should not geometrically confirm any loops
    # far apart; nearby matches are blocked by dislocal.
    for q, m in fps:
        assert q - m <= 4, f"spurious distant loop {q}->{m}"
