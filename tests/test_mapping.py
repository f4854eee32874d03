"""SOR filter, ANMS/FAST, and PLY export tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.data.synthetic import _smooth_noise_2d
from ros_stereo_slam_tpu.ops import anms, fast, sor
from ros_stereo_slam_tpu.utils import ply


def test_sor_removes_outliers():
    rng = np.random.default_rng(0)
    inliers = rng.normal(0, 1.0, (200, 3)).astype(np.float32) + np.array([0, 0, 20], np.float32)
    outliers = np.array([[50, 50, 90], [-40, 30, 200], [0, 0, 499]], np.float32)
    pts = np.concatenate([inliers, outliers]).astype(np.float32)
    mask = np.ones(len(pts), dtype=bool)
    keep = np.asarray(sor.sor_filter(jnp.asarray(pts), jnp.asarray(mask), mean_k=8, std_mul=1.0))
    assert not keep[-3:].any(), "gross outliers must be removed"
    assert keep[:200].mean() > 0.8, "most inliers must survive"


def test_sor_depth_cutoff():
    pts = np.array([[0, 0, 10], [0, 0, 600], [0, 0, -5]], np.float32)
    keep = np.asarray(sor.sor_filter(jnp.asarray(pts), jnp.ones(3, dtype=bool), mean_k=1, std_mul=10.0, max_depth=500.0))
    assert keep[0] and not keep[1] and not keep[2]


def test_fast_detects_corners():
    # A bright square on dark background has corners at its 4 vertices.
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:40] = 1.0
    score = np.asarray(fast.fast_score(jnp.asarray(img), 0.1))
    assert score.max() > 0
    ys, xs = np.nonzero(score)
    # all detections near the square corners
    corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
    for y, x in zip(ys, xs):
        assert np.min(np.abs(corners - [y, x]).sum(axis=1)) <= 4, (y, x)


def test_fast_arc_doubling_matches_naive():
    """The binary-doubling FAST-9 arc test must equal the naive
    all-starts AND-chain on random ring masks."""
    rng = np.random.default_rng(7)
    m = rng.random((16, 33, 47)) > 0.35  # dense-ish so 9-runs occur

    def naive(mask16):
        hit = np.zeros(mask16.shape[1:], bool)
        for s in range(16):
            run = mask16[s]
            for k in range(1, 9):
                run = run & mask16[(s + k) % 16]
            hit |= run
        return hit

    def doubling(mask16):
        rot = lambda x, j: np.roll(x, -j, axis=0)
        r2 = mask16 & rot(mask16, 1)
        r4 = r2 & rot(r2, 2)
        r8 = r4 & rot(r4, 4)
        return (r8 & rot(mask16, 8)).any(axis=0)

    np.testing.assert_array_equal(doubling(m), naive(m))
    assert naive(m).any(), "fixture produced no 9-runs — weak test"


def test_anms_spreads_points():
    rng = np.random.default_rng(1)
    # Cluster of strong points + spread of weaker ones: ANMS must not pick
    # only the cluster.
    cluster = rng.uniform(10, 15, (64, 2)).astype(np.float32)
    spread = rng.uniform(0, 100, (64, 2)).astype(np.float32)
    pts = np.concatenate([cluster, spread])
    scores = np.concatenate(
        [rng.uniform(9.0, 12.0, 64), rng.uniform(4.0, 6.0, 64)]
    ).astype(np.float32)
    mask = np.ones(128, dtype=bool)
    sel, valid = anms.anms(jnp.asarray(pts), jnp.asarray(scores), jnp.asarray(mask), 32)
    sel = np.asarray(sel)[np.asarray(valid)]
    # Spatial spread: selected points should cover a much larger area than
    # the cluster alone.
    assert sel[:, 0].max() - sel[:, 0].min() > 50


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 10, (500, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "map.ply")
    n = ply.save_ply(path, pts, cols)
    assert n == 500
    pts2, cols2 = ply.load_ply(path)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    assert cols2 is not None
    np.testing.assert_allclose(cols2 / 255.0, cols, atol=1 / 255.0 + 1e-6)
