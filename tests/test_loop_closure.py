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


def test_geom_match_many_matches_singleton(loop_setup):
    """The batched epilogue verification must return the per-candidate
    path's exact verdicts (same pair-derived keys, same slots)."""
    world, frames, feats, voc = loop_setup
    cfg = _cfg()
    det = loop_closure.LoopDetector(vocab=voc, config=cfg)
    for i in range(10):
        det.detect(i, feats[i])
    pairs = [(10, 2), (11, 3), (12, 4), (9, 1)]
    singles = []
    for q, m in pairs:
        k = loop_closure.geom_key(q, m)
        qs, ms = q % cfg.db_capacity, m % cfg.db_capacity
        # query slots 10..12 alias 10..12 (capacity 64); stage the query
        # frame's features into the db rings first so both paths read
        # identical inputs
        det.add(q, feats[q - 8] if q >= 10 else feats[q])
        n, bi, im = loop_closure._geom_match(
            det.db_bits[qs], det.db_pts[qs], det.db_pt_valid[qs],
            det.db_bits[ms], det.db_pts[ms], det.db_pt_valid[ms],
            k, jnp.float32(cfg.geom_thresh_px),
            jnp.float32(cfg.neigh_ratio), iters=cfg.geom_ransac_iters,
        )
        singles.append((int(n), np.asarray(bi), np.asarray(im)))
    nb, bib, imb = loop_closure._geom_match_many(
        det.db_bits, det.db_pts, det.db_pt_valid,
        jnp.asarray([q for q, _ in pairs], jnp.int32),
        jnp.asarray([m for _, m in pairs], jnp.int32),
        jnp.float32(cfg.geom_thresh_px), jnp.float32(cfg.neigh_ratio),
        iters=cfg.geom_ransac_iters,
    )
    for ci, (n, bi, im) in enumerate(singles):
        assert int(nb[ci]) == n, (ci, int(nb[ci]), n)
        np.testing.assert_array_equal(np.asarray(bib[ci]), bi)
        np.testing.assert_array_equal(np.asarray(imb[ci]), im)


def test_epilogue_cooldown_replay(monkeypatch):
    """Cooldown replay over batched verdicts == the sequential original:
    an accept suppresses later candidates for `cooldown` frames, a
    geometry FAIL arms nothing, and leftover cooldown carries into the
    next block (the chunked driver's contract)."""
    import dataclasses

    from ros_stereo_slam_tpu.config import PipelineConfig
    from ros_stereo_slam_tpu.models import slam_scan

    lcc = dataclasses.replace(
        LoopClosureConfig(), dislocal=0, min_separation=2, cooldown=4,
        detect_every=1, geom_min_points=12, db_capacity=64,
    )
    cfg = PipelineConfig(loop=lcc)
    gate = slam_scan.EpilogueGater(cfg)
    # Gate chain stubbed: every frame yields a candidate (fid, fid - 10).
    monkeypatch.setattr(
        gate.gater, "gate", lambda fid, ids, scores, ns: (fid - 10, 1.0, 1)
    )
    # Geometry stubbed: frame 12 fails (11 < geom_min_points), rest pass.
    nf = lcc.orb_features
    fail_fids = {12}

    def fake_many(db_bits, db_pts, db_ptv, q_fids, m_fids, t, r, iters):
        q = np.asarray(q_fids)
        n = np.where(np.isin(q, list(fail_fids)), 11, 50).astype(np.int32)
        P = q.shape[0]
        return (jnp.asarray(n), jnp.zeros((P, nf), jnp.int32),
                jnp.zeros((P, nf), bool))

    monkeypatch.setattr(loop_closure, "_geom_match_many", fake_many)
    lc = slam_scan.init_lc_state(cfg, 16)
    K = slam_scan._top_k_count(lcc)
    ids = np.zeros((8, K), np.int32)
    scores = np.ones((8, K), np.float32)
    ns = np.ones((8,), np.float32)
    acc = gate.process(lc, ids, scores, ns, fid_start=11)
    # frame 11 accepts (arms cooldown through frame 15); 12 fails geometry
    # anyway; 13-15 suppressed; 16 accepts (cooldown through 20); 17-18
    # suppressed.
    assert [a[0] for a in acc] == [11, 16]
    # block ends at frame 18; cooldown 16+4=20 leaves 2 frames remaining
    assert gate.cooldown == 2
    # next block: frames 19-26; 19-20 still suppressed, 21 accepts
    acc2 = gate.process(lc, ids, scores, ns, fid_start=19)
    assert [a[0] for a in acc2] == [21, 26]


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
