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
    # f32 selects: exact-oracle comparison (bf16 is the production default,
    # covered by the tolerance test below).
    params = lk.LKParams(window=21, iters=8, select_dtype="f32")
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


def test_pallas_bf16_select_close_to_f32():
    """The bf16 one-hot select (production default) only rounds the image
    samples (~2^-8 relative, the uint8 quantization scale); tracked flow
    must agree with the f32 kernel to well under a tenth of a pixel."""
    img, cur, pts = _setup(seed=2)
    g0 = jnp.asarray(pts)
    outs = {}
    for sd in ("f32", "bf16"):
        params = lk.LKParams(window=21, iters=8, select_dtype=sd)
        g, resid, ok = lk_pallas.track_level(
            jnp.asarray(img), jnp.asarray(cur), jnp.asarray(pts), g0, params,
            interpret=True,
        )
        outs[sd] = (np.asarray(g), np.asarray(ok))
    both = outs["f32"][1] & outs["bf16"][1]
    assert both.sum() > len(pts) * 0.8
    diff = np.abs(outs["f32"][0][both] - outs["bf16"][0][both])
    assert np.median(diff) < 0.02
    assert np.percentile(diff, 95) < 0.1


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
