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


def test_pallas_batched_lanes_match_single():
    """track_level_batch (grid=(B,), the DP-over-sequences vmap rule) must
    reproduce the single-lane kernel exactly per lane — the lane index
    only selects state, it never enters the math."""
    lanes = []
    for seed in (0, 3, 5):
        img, cur, pts = _setup(seed=seed)
        lanes.append((jnp.asarray(img), jnp.asarray(cur), jnp.asarray(pts)))
    B = len(lanes)
    imgs = jnp.stack([l[0] for l in lanes])
    curs = jnp.stack([l[1] for l in lanes])
    ptss = jnp.stack([l[2] for l in lanes])
    params = lk.LKParams(window=21, iters=8, select_dtype="f32")
    bg, bresid, bok = lk_pallas.track_level_batch(
        imgs, curs, ptss, ptss, params, interpret=True,
    )
    assert bg.shape == (B,) + lanes[0][2].shape
    for b in range(B):
        g, resid, ok = lk_pallas.track_level(
            lanes[b][0], lanes[b][1], lanes[b][2], lanes[b][2], params,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(bok[b]), np.asarray(ok))
        np.testing.assert_allclose(
            np.asarray(bg[b]), np.asarray(g), atol=1e-6,
            err_msg=f"lane {b}",
        )
        np.testing.assert_allclose(
            np.asarray(bresid[b]), np.asarray(resid), atol=1e-6,
        )


def test_pallas_custom_vmap_routes_to_batched():
    """jax.vmap over track_level_auto must produce the batched kernel's
    outputs (the custom_vmap rule), matching track_level_batch."""
    import jax

    img0, cur0, pts0 = _setup(seed=1)
    img1, cur1, pts1 = _setup(seed=4)
    imgs = jnp.stack([jnp.asarray(img0), jnp.asarray(img1)])
    curs = jnp.stack([jnp.asarray(cur0), jnp.asarray(cur1)])
    ptss = jnp.stack([jnp.asarray(pts0), jnp.asarray(pts1)])
    params = lk.LKParams(window=15, iters=6, select_dtype="f32")

    def one(i, c, p):
        return lk_pallas.track_level_auto(i, c, p, p, params,
                                          interpret=True)

    vg, vresid, vok = jax.vmap(one)(imgs, curs, ptss)
    bg, bresid, bok = lk_pallas.track_level_batch(
        imgs, curs, ptss, ptss, params, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(vok), np.asarray(bok))
    np.testing.assert_allclose(np.asarray(vg), np.asarray(bg), atol=1e-6)

    # and the UN-vmapped auto entry still matches the single-lane kernel
    g, resid, ok = lk_pallas.track_level_auto(
        imgs[0], curs[0], ptss[0], ptss[0], params, interpret=True)
    sg, sresid, sok = lk_pallas.track_level(
        imgs[0], curs[0], ptss[0], ptss[0], params, interpret=True)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(sok))
    np.testing.assert_allclose(np.asarray(g), np.asarray(sg), atol=1e-6)
