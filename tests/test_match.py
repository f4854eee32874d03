"""Descriptor matching (ops/match.py) + ORB-stereo bootstrap path.

Reference parity: the non-dense stereo variant
(``/root/reference/src/triangulation.cpp:104-134``) extracts per-view
features and brute-force matches them instead of dense-grid LK.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import preset_odometry
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.ops import match
from ros_stereo_slam_tpu.ops.orb import N_BITS


def _signs(bits):
    return jnp.where(jnp.asarray(bits), 1.0, -1.0).astype(jnp.float32)


def test_mutual_match_exact_and_ratio():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (32, N_BITS)).astype(bool)
    # B = permuted copies of A plus distractors
    perm = rng.permutation(32)
    b = np.concatenate([a[perm], rng.integers(0, 2, (16, N_BITS)).astype(bool)])
    res = match.mutual_hamming_match(
        _signs(a), jnp.ones(32, bool), _signs(b), jnp.ones(48, bool),
        max_dist=10.0, ratio=0.8,
    )
    assert bool(res.valid.all())
    np.testing.assert_array_equal(np.asarray(res.idx), np.argsort(perm))
    np.testing.assert_allclose(np.asarray(res.dist), 0.0)


def test_mutual_match_rejects_ambiguous():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2, (8, N_BITS)).astype(bool)
    b = np.concatenate([a, a])  # every query has two perfect matches
    res = match.mutual_hamming_match(
        _signs(a), jnp.ones(8, bool), _signs(b), jnp.ones(16, bool),
        max_dist=10.0, ratio=0.8,
    )
    assert not bool(res.valid.any())  # ratio test kills duplicates


def test_mutual_match_respects_masks():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 2, (8, N_BITS)).astype(bool)
    res = match.mutual_hamming_match(
        _signs(a), jnp.zeros(8, bool), _signs(a), jnp.ones(8, bool),
    )
    assert not bool(res.valid.any())


def test_orb_stereo_pipeline_tracks():
    import dataclasses

    from ros_stereo_slam_tpu.models.pipeline import run_offline

    world = small_world(n_frames=6, seed=3)
    L, R = [], []
    for i in range(6):
        l, r, _ = world.render(i)
        L.append(l)
        R.append(r)
    cfg = preset_odometry()
    # The ORB stereo path tracks ORB corners (not smooth-texture grid
    # points); their higher-curvature patches need the full seeded GN
    # budget, and the feature count doubles as the stereo match pool —
    # the dense-grid defaults (seeded 6 iters, 768 points) are tuned for
    # the grid profile and measurably under-serve this one.
    cfg = dataclasses.replace(
        cfg,
        camera=world.camera,
        frontend=dataclasses.replace(
            cfg.frontend, stereo_matcher="orb",
            lk_seeded_iters=10, max_points=1152,
        ),
    )
    res = run_offline(cfg, np.stack(L), np.stack(R))
    assert bool(res.tracking_ok.all()), res.n_inliers
    # translation error per frame < 15 cm on 0.8 m steps
    est = res.trajectory
    for i in range(1, 6):
        err = np.linalg.norm(est[i][:3, 3] - world.poses[i][:3, 3])
        assert err < 0.15 * i, (i, err)
