"""Pallas LK kernel equivalence vs the jnp reference implementation.

Runs the kernel in interpreter mode on CPU (SURVEY.md §4 strategy: every
Pallas kernel has a jnp oracle).
"""

import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.data.synthetic import _smooth_noise_2d
from ros_stereo_slam_tpu.ops import lk, lk_pallas


def _setup(seed=0, n=64, shape=(192, 256)):
    rng = np.random.default_rng(seed)
    img = _smooth_noise_2d(shape, rng, octaves=5, base_period=24)
    # shift by a smooth warp: just use a pure translation via roll for speed
    cur = np.roll(img, (-2, 3), axis=(0, 1)).astype(np.float32)
    pts = np.stack(
        [rng.uniform(30, shape[1] - 30, n), rng.uniform(30, shape[0] - 30, n)],
        axis=1,
    ).astype(np.float32)
    return img, cur, pts


def test_pallas_level_matches_jnp_reference():
    img, cur, pts = _setup()
    params = lk.LKParams(window=21, iters=8)
    g0 = jnp.asarray(pts)
    ref_g, ref_resid, ref_ok = lk._track_level(
        jnp.asarray(img), jnp.asarray(cur), jnp.asarray(pts), g0, params
    )
    pal_g, pal_resid, pal_ok = lk_pallas.track_level(
        jnp.asarray(img), jnp.asarray(cur), jnp.asarray(pts), g0, params,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ok), np.asarray(pal_ok))
    np.testing.assert_allclose(
        np.asarray(pal_g), np.asarray(ref_g), atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(pal_resid), np.asarray(ref_resid), atol=1e-2,
    )


def test_pallas_level_tracks_translation():
    img, cur, pts = _setup(seed=1)
    params = lk.LKParams(window=21, iters=10)
    g0 = jnp.asarray(pts)
    pal_g, _, pal_ok = lk_pallas.track_level(
        jnp.asarray(img), jnp.asarray(cur), jnp.asarray(pts), g0, params,
        interpret=True,
    )
    flow = np.asarray(pal_g) - pts
    ok = np.asarray(pal_ok)
    err = np.abs(flow[ok] - np.array([3.0, -2.0]))
    assert np.median(err) < 0.05
