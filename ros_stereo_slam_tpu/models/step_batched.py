"""Batched (DP-over-sequences) SLAM step: B lanes, batch-hoisted branches.

``jax.vmap(slam_frame_step)`` is correct but slow: vmap lowers each
``lax.cond`` to a select that executes BOTH branches for every lane, so
the rescue re-track (the 4-level coarse-to-fine path const-velocity
seeding exists to avoid — measured +3.4 ms/frame) and the keyframe
re-bootstrap run unconditionally (measured 463 -> 180 fps on a single
vmapped lane).

This module re-phases the step so the data-dependent branches sit at the
BATCH level, outside vmap:

1. the seeded track + PnP runs vmapped for all lanes (the happy path);
2. ``lax.cond(jnp.any(need_rescue), ...)`` runs the vmapped rescue only
   when at least one lane needs it, then a per-lane ``where`` merges —
   rescue is rare (cold start, motion discontinuity), so the batch
   predicate almost never fires;
3. likewise for the keyframe branch (fires when ANY lane triggers — more
   often, but the merged cost is shared by all lanes that frame).

Per-lane semantics are IDENTICAL to :func:`step.slam_frame_step` (same
key splits, same predicates, same merge values) — pinned by
tests/test_batched.py's lane-vs-single parity test.  The shared
tracking ladder lives in :func:`step._track_and_pnp`.

This is the fleet-mapping posture: B sequences (robots, or shards of one
long sequence) on one chip via ``run_sequence_batched``, multiplied
across chips by the DP axis (`bench.py --preset batched`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ros_stereo_slam_tpu.config import PipelineConfig
from ros_stereo_slam_tpu.models import frontend
from ros_stereo_slam_tpu.models.step import (
    FrameStats,
    SlamCarry,
    _ba_refine,
    _ba_reset,
    _bootstrap_track,
    _cam_of,
    _happy_levels,
    _insert_keyframe,
    _track_and_pnp,
)
from ros_stereo_slam_tpu.ops import interp, pyramid
from ros_stereo_slam_tpu.utils import lie
from ros_stereo_slam_tpu.utils.camera import project


def _where_lanes(pred, a, b):
    """Per-lane select over matching pytrees: pred (B,), leaves (B, ...)."""
    return jax.tree.map(
        lambda x, y: jnp.where(
            pred.reshape(pred.shape + (1,) * (x.ndim - 1)), x, y
        ),
        a, b,
    )


def slam_frame_step_batched(
    carry: SlamCarry,  # every leaf has a leading (B,) lane axis
    left_img: jnp.ndarray,  # (B, H, W) f32 or uint8
    right_img: jnp.ndarray,  # (B, H, W)
    grid_pts: jnp.ndarray,  # (N, 2) shared across lanes
    grid_mask: jnp.ndarray,  # (N,)
    cfg: PipelineConfig,
    left_rgb: jnp.ndarray | None = None,  # (B, H, W, 3) optional
) -> tuple[SlamCarry, FrameStats]:
    """One SLAM frame for B independent lanes; see module docstring."""
    fe, pc, kfc = cfg.frontend, cfg.pnp, cfg.keyframes
    if not (fe.lk_seed == "const_velocity" and carry.dT is not None):
        raise ValueError(
            "slam_frame_step_batched requires the const-velocity-seeded "
            "config (the batch hoist targets the seeded/rescue split); "
            "use jax.vmap(slam_frame_step) for other seeding modes"
        )
    if left_img.dtype == jnp.uint8:
        left_img = left_img.astype(jnp.float32) * (1.0 / 255.0)
    if right_img.dtype == jnp.uint8:
        right_img = right_img.astype(jnp.float32) * (1.0 / 255.0)
    cam = _cam_of(cfg)

    ks = jax.vmap(lambda k: jax.random.split(k, 5))(carry.key)  # (B, 5, 2)
    key, k_f, k_pnp, _k_retry, k_kf = (ks[:, i] for i in range(5))

    # --- phase 1 (vmapped): seeded temporal track + PnP -----------------
    def seeded_one(carry1, left1, k_f1):
        cur_pyr = tuple(pyramid.build_pyramid(left1, _happy_levels(fe)))
        T_prior = lie.inv_se3(carry1.T_wc)
        T_pred_cw = lie.inv_se3(carry1.T_wc @ carry1.dT)
        uv_pred, z_ok = project(
            cam, lie.transform_points(T_pred_cw, carry1.track.pts3d)
        )
        h0, w0 = cur_pyr[0].shape
        seed_ok = (
            z_ok
            & jnp.all(jnp.isfinite(uv_pred), axis=-1)
            & interp.in_bounds(uv_pred, h0, w0, fe.lk_window // 2 + 1)
        )
        init_flow = jnp.where(
            seed_ok[:, None], uv_pred - carry1.track.pts2d, 0.0
        )
        n_lvl = min(fe.lk_seeded_levels, fe.lk_levels)
        pts_s, m_s, p_s = _track_and_pnp(
            carry1, carry1.ref_pyr[:n_lvl], cur_pyr[:n_lvl], init_flow,
            frontend._lk_params(fe)._replace(
                iters=fe.lk_seeded_iters,
                walk_iters=fe.lk_seeded_walk_iters,
            ),
            jax.random.split(k_f1, 2), cfg, cam, T_prior,
        )
        need = (p_s.n_inliers < fe.lk_rescue_min_inliers) | ~carry1.dT_valid
        return cur_pyr, pts_s, m_s, p_s, need

    cur_pyr, pts_s, m_s, p_s, need_rescue = jax.vmap(
        seeded_one)(carry, left_img, k_f)

    # --- phase 2 (batch-level cond): rescue only if ANY lane needs it ---
    def rescue_all():
        def rescue_one(carry1, left1, k_pnp1):
            ref_full = tuple(
                pyramid.build_pyramid(carry1.ref_pyr[0], fe.lk_levels)
            )
            cur_full = tuple(pyramid.build_pyramid(left1, fe.lk_levels))
            return _track_and_pnp(
                carry1, ref_full, cur_full, None, frontend._lk_params(fe),
                jax.random.split(k_pnp1, 2), cfg, cam,
                lie.inv_se3(carry1.T_wc),
            )

        r = jax.vmap(rescue_one)(carry, left_img, k_pnp)
        return _where_lanes(need_rescue, r, (pts_s, m_s, p_s))

    tracked_pts, m, p = lax.cond(
        jnp.any(need_rescue), rescue_all, lambda: (pts_s, m_s, p_s)
    )

    # --- phase 3 (vmapped): pose update, BA, continue-branch state ------
    n_tracked = jnp.sum(m, axis=-1)
    tracking_ok = p.n_inliers >= pc.min_inliers
    T_wc = jnp.where(
        tracking_ok[:, None, None],
        jax.vmap(lie.inv_se3)(p.T_cw), carry.T_wc,
    )

    ba_state = carry.ba
    track_cur = carry.track
    ba_rms = jnp.zeros(tracking_ok.shape, jnp.float32)
    if cfg.ba_enabled:
        ba_state, T_wc, track_cur, ba_rms = jax.vmap(
            lambda b, t, T, tp, inl: _ba_refine(b, t, T, tp, inl, cfg)
        )(ba_state, track_cur, T_wc, tracked_pts, p.inliers & m)

    is_kf = (p.n_inliers < kfc.min_pnp_inliers) | (~tracking_ok)
    W = max(kfc.batch_align_window, 1)
    if W > 1:
        # Shared-cadence alignment (see KeyframeConfig.batch_align_window):
        # inlier-triggered keyframes wait for the window frame; tracking
        # failures fire immediately.  frame_idx is lockstep across lanes,
        # so on window frames every due lane fires in the SAME kf_all
        # execution.
        window = (carry.frame_idx % W) == 0
        is_kf = (~tracking_ok) | (is_kf & window)

    cont = (
        jax.vmap(lambda t, tp, mm: t._replace(pts2d=tp, mask=mm))(
            track_cur, tracked_pts, p.inliers & m),
        ba_state,
        carry.stereo_flow,
    )

    # --- phase 4 (batch-level cond): keyframe re-bootstrap + insert -----
    stereo_seeded = (
        fe.sampler == "grid"
        and fe.stereo_matcher == "lk"
        and carry.stereo_flow is not None
    )

    def kf_all():
        def kf_one(carry1, cur_pyr1, right1, T_wc1, k_kf1, rgb1):
            if stereo_seeded:
                n_lvl = min(fe.lk_stereo_seeded_levels, fe.lk_levels)
                right_pyr = tuple(pyramid.build_pyramid(right1, n_lvl))
                track, r_uv, r_mask = _bootstrap_track(
                    cur_pyr1[:n_lvl], right_pyr, grid_pts, grid_mask,
                    T_wc1, k_kf1, cfg, stereo_flow=carry1.stereo_flow,
                    left_rgb=rgb1,
                )
                flow = jnp.where(
                    track.mask[:, None], r_uv - grid_pts,
                    carry1.stereo_flow,
                )
            else:
                right_pyr = tuple(
                    pyramid.build_pyramid(right1, fe.lk_levels))
                track, r_uv, r_mask = _bootstrap_track(
                    cur_pyr1, right_pyr, grid_pts, grid_mask, T_wc1,
                    k_kf1, cfg, left_rgb=rgb1,
                )
                flow = carry1.stereo_flow
            if cfg.ba_enabled:
                new_ba = _ba_reset(track, r_uv, r_mask, T_wc1,
                                   track.pts2d, cfg)
            else:
                new_ba = None
            return track, new_ba, flow

        kf_out = jax.vmap(
            lambda c, cp, r, T, k, rgb: kf_one(c, cp, r, T, k, rgb),
            in_axes=(0, 0, 0, 0, 0, 0 if left_rgb is not None else None),
        )(carry, cur_pyr, right_img, T_wc, k_kf, left_rgb)
        merged = _where_lanes(is_kf, kf_out, cont)
        ins = jax.vmap(_insert_keyframe)(
            carry.keyframes, merged[0], T_wc, carry.frame_idx)
        store = _where_lanes(is_kf, ins, carry.keyframes)
        return merged, store

    (new_track, new_ba, new_flow), new_kf_store = lax.cond(
        jnp.any(is_kf), kf_all, lambda: (cont, carry.keyframes)
    )

    dT_new = jnp.where(
        tracking_ok[:, None, None],
        jax.vmap(lie.inv_se3)(carry.T_wc) @ T_wc, carry.dT,
    )
    dT_valid_new = carry.dT_valid | tracking_ok

    new_carry = SlamCarry(
        track=new_track,
        T_wc=T_wc,
        keyframes=new_kf_store,
        ref_pyr=cur_pyr,
        key=key,
        frame_idx=carry.frame_idx + 1,
        ba=new_ba,
        dT=dT_new,
        dT_valid=dT_valid_new,
        stereo_flow=new_flow,
    )
    stats = FrameStats(
        T_wc=T_wc,
        n_tracked=n_tracked,
        n_inliers=p.n_inliers,
        is_keyframe=is_kf,
        tracking_ok=tracking_ok,
        used_retry=p.used_retry,
        ba_rms=ba_rms,
    )
    return new_carry, stats


@partial(jax.jit, static_argnames=("cfg",))
def run_sequence_batched(
    left_seq: jnp.ndarray,  # (B, F, H, W) frames 1..F per lane
    right_seq: jnp.ndarray,  # (B, F, H, W)
    carry: SlamCarry,  # batched (leading B on every leaf)
    grid_pts: jnp.ndarray,
    grid_mask: jnp.ndarray,
    cfg: PipelineConfig,
    rgb_seq: jnp.ndarray | None = None,  # (B, F, H, W, 3) optional
) -> tuple[SlamCarry, FrameStats]:
    """B whole sequences as ONE XLA program (lax.scan over frames,
    lanes batched inside each step).  Stats leaves come back as
    (F, B, ...) — frame-major, matching the scan axis."""
    left_t = jnp.swapaxes(left_seq, 0, 1)  # (F, B, H, W)
    right_t = jnp.swapaxes(right_seq, 0, 1)

    if rgb_seq is None:
        def body(c, imgs):
            left, right = imgs
            return slam_frame_step_batched(
                c, left, right, grid_pts, grid_mask, cfg)

        return lax.scan(body, carry, (left_t, right_t))

    rgb_t = jnp.swapaxes(rgb_seq, 0, 1)

    def body_rgb(c, imgs):
        left, right, rgb = imgs
        return slam_frame_step_batched(
            c, left, right, grid_pts, grid_mask, cfg, left_rgb=rgb)

    return lax.scan(body_rgb, carry, (left_t, right_t, rgb_t))
