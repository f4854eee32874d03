"""Batched multi-sequence SLAM: vmapped scan over independent lanes.

The DP-over-sequences posture (bench.py ``--preset batched``): B
sequences run as ONE vmapped ``run_sequence`` scan.  Correctness bar:
each vmapped lane must reproduce the same trajectory the un-vmapped
scan produces for that lane alone — vmap turns the per-frame
``lax.cond`` branches (keyframe insert, retrack rescue) into selects
that execute both sides, so this test pins that neither branch leaks
into the not-taken lane's state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.config import (
    CameraConfig,
    FrontendConfig,
    KeyframeConfig,
    preset_odometry,
)
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.models import step as step_mod
from ros_stereo_slam_tpu.ops import grid


@pytest.fixture(scope="module")
def batched_setup():
    B, F = 2, 6
    worlds = [small_world(n_frames=F + 1, seed=7 + i) for i in range(B)]
    camc = worlds[0].camera
    cfg = preset_odometry().replace(
        camera=camc,
        frontend=FrontendConfig(grid_step=12, max_points=1024),
        keyframes=KeyframeConfig(max_keyframes=8, min_pnp_inliers=150,
                                 map_block_points=1024),
    )
    pts, mask = grid.grid_points(
        camc.height, camc.width, cfg.frontend.grid_step,
        cfg.frontend.max_points,
    )
    pts, mask = jnp.asarray(pts), jnp.asarray(mask)

    def stage(w):
        L = np.stack([w.render(i)[0] for i in range(F + 1)])
        R = np.stack([w.render(i)[1] for i in range(F + 1)])
        return jnp.asarray(L), jnp.asarray(R)

    Ls, Rs = zip(*[stage(w) for w in worlds])
    L, R = jnp.stack(Ls), jnp.stack(Rs)  # (B, F+1, H, W)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    return worlds, cfg, pts, mask, L, R, keys, B, F


def test_batched_lanes_match_single(batched_setup):
    """run_sequence_batched (hoisted-cond batched step) reproduces each
    lane's single-lane trajectory — the branch hoist + where-merge must
    be semantically invisible per lane."""
    from ros_stereo_slam_tpu.models import step_batched

    worlds, cfg, pts, mask, L, R, keys, B, F = batched_setup

    carry0 = jax.vmap(
        lambda l0, r0, k: step_mod.init_carry(l0, r0, pts, mask, k, cfg)
    )(L[:, 0], R[:, 0], keys)
    carryN, stats_fb = step_batched.run_sequence_batched(
        L[:, 1:], R[:, 1:], carry0, pts, mask, cfg
    )
    # stats come back frame-major (F, B, ...) — lane-major for checks
    stats = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), stats_fb)

    assert np.asarray(stats.tracking_ok).all()
    for b in range(B):
        c0 = step_mod.init_carry(L[b, 0], R[b, 0], pts, mask, keys[b], cfg)
        cN, st = step_mod.run_sequence(L[b, 1:], R[b, 1:], c0, pts, mask, cfg)
        np.testing.assert_allclose(
            np.asarray(stats.T_wc[b]), np.asarray(st.T_wc),
            atol=1e-4,
            err_msg=f"lane {b} trajectory diverges from single-lane run",
        )
        assert (
            np.asarray(stats.is_keyframe[b]) == np.asarray(st.is_keyframe)
        ).all()
        # each lane's final pose also lands near GT
        gt = worlds[b].poses[F]
        terr = np.linalg.norm(
            np.asarray(carryN.T_wc[b])[:3, 3] - gt[:3, 3])
        assert terr < 0.05, f"lane {b} final translation error {terr:.3f} m"


def test_batched_kf_align_window(batched_setup):
    """batch_align_window=2 defers inlier-triggered keyframes to even
    frames (lanes fire the shared hoisted branch together) while
    keeping tracking healthy and trajectories near the exact-semantics
    run; tracking failures would still fire immediately."""
    import dataclasses

    from ros_stereo_slam_tpu.models import step_batched

    worlds, cfg, pts, mask, L, R, keys, B, F = batched_setup
    acfg = cfg.replace(
        keyframes=dataclasses.replace(cfg.keyframes, batch_align_window=2)
    )
    carry0 = jax.vmap(
        lambda l0, r0, k: step_mod.init_carry(l0, r0, pts, mask, k, acfg)
    )(L[:, 0], R[:, 0], keys)
    carryN, stats_fb = step_batched.run_sequence_batched(
        L[:, 1:], R[:, 1:], carry0, pts, mask, acfg
    )
    stats = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), stats_fb)
    assert np.asarray(stats.tracking_ok).all()
    # inlier-triggered keyframes only on even frame_idx (frame 1 is the
    # first step -> frame_idx 1, odd -> deferred)
    is_kf = np.asarray(stats.is_keyframe)  # (B, F)
    frame_idx = 1 + np.arange(F)
    assert not is_kf[:, frame_idx % 2 == 1].any(), (
        "aligned run fired an inlier-triggered keyframe off-window "
        "without a tracking failure")
    for b in range(B):
        gt = worlds[b].poses[F]
        terr = np.linalg.norm(np.asarray(carryN.T_wc[b])[:3, 3] - gt[:3, 3])
        assert terr < 0.08, (
            f"lane {b} final translation error {terr:.3f} m under "
            "aligned keyframes")


def test_orb_batched_kernel_matches_single():
    """orb_descriptors_batch (grid=(B,)) lane-matches the single kernel,
    and jax.vmap over orb_descriptors_auto routes to it."""
    from ros_stereo_slam_tpu.data.synthetic import _smooth_noise_2d
    from ros_stereo_slam_tpu.ops import orb_pallas

    rng = np.random.default_rng(6)
    B, n = 3, 16
    imgs, ptss = [], []
    for _ in range(B):
        imgs.append(_smooth_noise_2d((192, 256), rng, octaves=4,
                                     base_period=16))
        ptss.append(np.stack(
            [rng.integers(30, 256 - 30, n), rng.integers(30, 192 - 30, n)],
            axis=1).astype(np.float32))
    imgs_j = jnp.asarray(np.stack(imgs))
    ptss_j = jnp.asarray(np.stack(ptss))

    bsign, bm = orb_pallas.orb_descriptors_batch(
        imgs_j, ptss_j, interpret=True)
    for b in range(B):
        sign, m = orb_pallas.orb_descriptors(
            imgs_j[b], ptss_j[b], interpret=True)
        np.testing.assert_allclose(
            np.asarray(bsign[b]), np.asarray(sign), atol=1e-5,
            err_msg=f"lane {b}")
        np.testing.assert_allclose(
            np.asarray(bm[b]), np.asarray(m), atol=1e-4)

    vsign, vm = jax.vmap(
        lambda i, p: orb_pallas.orb_descriptors_auto(i, p, interpret=True)
    )(imgs_j, ptss_j)
    np.testing.assert_allclose(np.asarray(vsign), np.asarray(bsign),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(bm), atol=1e-6)
