"""Fully-fused on-device SLAM step + whole-sequence scan.

The reference's frame loop (``/root/reference/src/VisualSLAM.cpp:54-200``)
interleaves host logic with every vision call.  On TPU that structure is
latency-bound (each host<->device round trip costs more than the math), so
the ENTIRE frame — tracking, PnP with its retry ladder
(``src/rosFuncs.cpp:85-93``), the keyframe trigger (``:120``), keyframe
re-triangulation (``src/keyFrameManagement.cpp:9-31``) and the keyframe
store update — is one jitted function with ``lax.cond`` for the
data-dependent branches.  :func:`run_sequence` goes further and folds the
frame loop itself into ``lax.scan``: an entire SLAM sequence becomes a
single XLA program (one dispatch, zero per-frame host traffic).

Host-side orchestration (pipeline.py) remains for streaming use; this
module is the throughput path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ros_stereo_slam_tpu.config import PipelineConfig
from ros_stereo_slam_tpu.models import frontend
from ros_stereo_slam_tpu.models.state import KeyframeStore, TrackState
from ros_stereo_slam_tpu.ops import (
    anms,
    fast,
    interp,
    lk,
    match,
    orb,
    pnp,
    pyramid,
    ransac,
    sor,
    triangulate,
)
from ros_stereo_slam_tpu.utils import lie
from ros_stereo_slam_tpu.utils.camera import Pinhole, project


class FrameStats(NamedTuple):
    T_wc: jnp.ndarray  # (4, 4)
    n_tracked: jnp.ndarray  # () i32
    n_inliers: jnp.ndarray  # () i32
    is_keyframe: jnp.ndarray  # () bool
    tracking_ok: jnp.ndarray  # () bool
    used_retry: jnp.ndarray  # () bool
    ba_rms: jnp.ndarray  # () f32 — post-BA reprojection RMS (0 if disabled)


class BAState(NamedTuple):
    """Sliding observation window for local bundle adjustment (C13).

    Ring of the last W frames' tracked 2D observations of the CURRENT
    landmark set, plus the stereo right-view observations captured at the
    landmark set's keyframe — the scale anchor (monocular BA has a free
    global-scale gauge; the right view pins it through the landmarks).
    """

    obs_uv: jnp.ndarray  # (W, N, 2)
    obs_mask: jnp.ndarray  # (W, N) bool
    T_cw: jnp.ndarray  # (W, 4, 4) cam-from-world of ring frames
    right_uv: jnp.ndarray  # (N, 2) right-cam obs at the keyframe
    right_mask: jnp.ndarray  # (N,) bool
    T_cw_right: jnp.ndarray  # (4, 4) right-cam pose (fixed)
    n_frames: jnp.ndarray  # () i32 — frames pushed since last keyframe

    @staticmethod
    def empty(window: int, n: int) -> "BAState":
        eye = jnp.eye(4, dtype=jnp.float32)
        return BAState(
            obs_uv=jnp.zeros((window, n, 2), jnp.float32),
            obs_mask=jnp.zeros((window, n), bool),
            T_cw=jnp.tile(eye, (window, 1, 1)),
            right_uv=jnp.zeros((n, 2), jnp.float32),
            right_mask=jnp.zeros((n,), bool),
            T_cw_right=eye,
            n_frames=jnp.int32(0),
        )


class SlamCarry(NamedTuple):
    track: TrackState
    T_wc: jnp.ndarray  # (4, 4) current pose (world-from-cam)
    keyframes: KeyframeStore
    ref_pyr: tuple  # pyramid of the previous left image
    key: jax.Array
    frame_idx: jnp.ndarray  # () i32
    ba: BAState | None = None  # present iff cfg.ba_enabled
    # Previous inter-frame motion T_{t-1}^w^-1 @ T_t^w — the constant-
    # velocity prior that seeds the temporal LK track (lk_seed config).
    dT: jnp.ndarray | None = None  # (4, 4)
    # False until one real inter-frame motion has been measured: the
    # bootstrap dT is identity, which seeds ZERO flow — the shallow seeded
    # track underconverges on it (measured 0.065 m vs 0.004 m first-step
    # error), so a cold prior routes through the full-pyramid rescue.
    dT_valid: jnp.ndarray | None = None  # () bool
    # Last measured L->R flow per (static) grid slot — the disparity prior
    # that seeds the keyframe branch's stereo re-match.
    stereo_flow: jnp.ndarray | None = None  # (N, 2)


def _happy_levels(fe) -> int:
    """Pyramid depth the seeded steady-state path actually touches.

    The seeded temporal track uses `lk_seeded_levels`; the seeded stereo
    rematch uses `lk_stereo_seeded_levels`.  Configurations whose keyframe
    branch runs unseeded (ANMS sampler / ORB stereo — no static-grid
    disparity prior) still need the full pyramid every frame.
    """
    if fe.sampler == "grid" and fe.stereo_matcher == "lk":
        return min(
            max(fe.lk_seeded_levels, fe.lk_stereo_seeded_levels), fe.lk_levels
        )
    return fe.lk_levels


def _cam_of(cfg: PipelineConfig) -> Pinhole:
    c = cfg.camera
    return Pinhole(
        fx=jnp.float32(c.fx), fy=jnp.float32(c.fy),
        cx=jnp.float32(c.cx), cy=jnp.float32(c.cy),
    )


def _sample_keypoints(left_pyr, grid_pts, grid_mask, cfg: PipelineConfig):
    """Keypoint source: dense grid (reference C2, default) or FAST+ANMS
    (reference C3 — ``src/ANMS.cpp:18-67``), selected statically."""
    fe = cfg.frontend
    if fe.sampler == "anms":
        score = fast.fast_score(left_pyr[0], fe.fast_thresh / 255.0)
        cand_pts, cand_scores, cand_mask = fast.top_corners(score, 4 * fe.max_points)
        return anms.anms(
            cand_pts, cand_scores, cand_mask, fe.max_points, fe.anms_robust_coeff
        )
    return grid_pts, grid_mask


def _bootstrap_track(
    left_pyr, right_pyr, grid_pts, grid_mask, T_wc, key, cfg: PipelineConfig,
    stereo_flow=None, left_rgb=None,
) -> tuple[TrackState, jnp.ndarray, jnp.ndarray]:
    """Stereo LK -> F-gate -> triangulate -> SOR -> world lift (C6+C14).

    Returns (track, right_uv, right_mask) — the right-view matches feed
    the BA window's scale anchor.  `stereo_flow` (N, 2), if given, seeds
    the L->R match from each grid slot's last measured disparity and the
    search runs on pyramids already sliced to the seeded depth.
    `left_rgb` (H, W, 3), if given, is the color source for map points
    (reference ``getColors``, ``include/monoUtils.h:180-193``); otherwise
    the grayscale intensity is replicated.
    """
    fe = cfg.frontend
    cam = _cam_of(cfg)
    if fe.stereo_matcher == "orb":
        # Non-dense reference path (DENSE_FLAG=false): per-view features +
        # brute-force descriptor matching (src/triangulation.cpp:104-134),
        # here as one MXU Hamming matmul with an epipolar row gate.
        fl = orb.detect_and_compute(left_pyr[0], fe.max_points, fe.fast_thresh / 255.0)
        fr = orb.detect_and_compute(right_pyr[0], fe.max_points, fe.fast_thresh / 255.0)
        dv = jnp.abs(fl.pts[:, None, 1] - fr.pts[None, :, 1])
        disp = fl.pts[:, None, 0] - fr.pts[None, :, 0]
        pair_ok = (dv <= fe.orb_epipolar_tol_px) & (disp > 0.1)
        mres = match.mutual_hamming_match(
            fl.desc_sign, fl.valid, fr.desc_sign, fr.valid,
            max_dist=fe.orb_match_max_dist, ratio=fe.orb_match_ratio,
            pair_mask=pair_ok,
        )
        grid_pts = fl.pts
        right_pts = fr.pts[mres.idx]
        m = mres.valid
    else:
        grid_pts, grid_mask = _sample_keypoints(left_pyr, grid_pts, grid_mask, cfg)
        res = lk.track(
            left_pyr, right_pyr, grid_pts, stereo_flow,
            frontend._lk_stereo_params(fe),
        )
        m = grid_mask & res.valid
        if fe.stereo_gate == "epipolar":
            # rectified pair: the epipolar constraint is y_l == y_r with
            # positive disparity — no RANSAC needed (see config)
            dy = res.points[:, 1] - grid_pts[:, 1]
            disp = grid_pts[:, 0] - res.points[:, 0]
            m = m & (jnp.abs(dy) <= fe.stereo_epipolar_tol_px) & (disp > 0.05)
        else:
            fres = ransac.fmat_ransac(
                key, grid_pts, res.points, m,
                thresh_px=fe.fmat_stereo_thresh_px, iters=fe.fmat_iters,
            )
            m = m & fres.inliers
        right_pts = res.points
    tri = triangulate.triangulate_rectified(
        cam, jnp.float32(cfg.camera.baseline), grid_pts, right_pts, m,
        max_depth=cfg.keyframes.max_depth,
    )
    # Statistical outlier removal on the fresh cloud (reference applies
    # SORcloud at keyframe insertion, src/VisualSLAM.cpp:128,154).
    kfc = cfg.keyframes
    clean = sor.sor_filter(
        tri.points, tri.valid, mean_k=kfc.sor_mean_k,
        std_mul=kfc.sor_std_mul, max_depth=kfc.max_depth,
    )
    pts_world = lie.transform_points(T_wc, tri.points)
    if left_rgb is not None:
        rgb = left_rgb
        if rgb.dtype == jnp.uint8:
            rgb = rgb.astype(jnp.float32) * (1.0 / 255.0)
        colors = jnp.stack(
            [interp.bilinear_at(rgb[..., c], grid_pts) for c in range(3)],
            axis=-1,
        )
    else:
        gray = interp.bilinear_at(left_pyr[0], grid_pts)
        colors = jnp.stack([gray, gray, gray], axis=-1)
    track = TrackState(pts2d=grid_pts, pts3d=pts_world, colors=colors, mask=clean)
    return track, right_pts, clean


def _track_and_pnp(carry, ref_pyr, c_pyr, init_flow, lk_params, keys,
                   cfg: PipelineConfig, cam, T_prior):
    """LK track -> F-RANSAC gate -> PnP with the folded retry ladder
    (``src/tracking.cpp:46-91``, ``src/rosFuncs.cpp:73-94``).  The
    previous pose seeds a planar-safe GN hypothesis family (the P6P
    DLT degenerates on single-wall views).  Shared by the single-lane
    step and the batched (DP-over-sequences) step in step_batched.py."""
    fe, pc = cfg.frontend, cfg.pnp
    kf_, kp_ = keys
    r = lk.track(ref_pyr, c_pyr, carry.track.pts2d, init_flow, lk_params)
    mm = carry.track.mask & r.valid
    if fe.fmat_gate == "ransac":
        fr = ransac.fmat_ransac(
            kf_, carry.track.pts2d, r.points, mm,
            thresh_px=fe.fmat_thresh_px, iters=fe.fmat_iters,
        )
        mm = mm & fr.inliers
    pp = pnp.pnp_ransac(
        kp_, cam, carry.track.pts3d, r.points, mm,
        thresh_px=pc.thresh_px, iters=pc.iters,
        refine_iters=pc.refine_iters,
        T_init=T_prior, retry_thresh_px=pc.retry_thresh_px,
        min_inliers=pc.min_inliers, huber_px=pc.refine_huber_px,
    )
    return r.points, mm, pp


def _right_cam_pose(T_wc: jnp.ndarray, baseline) -> jnp.ndarray:
    """Cam-from-world of the RIGHT camera: shift by -baseline along cam x."""
    shift = jnp.eye(4, dtype=T_wc.dtype).at[0, 3].set(-baseline)
    return shift @ lie.inv_se3(T_wc)


def _ba_reset(
    track: TrackState, right_uv, right_mask, T_wc, left_uv, cfg: PipelineConfig
) -> BAState:
    """Fresh window after a (re)bootstrap: slot 0 = the keyframe's left
    observations; right-view obs pin scale."""
    st = BAState.empty(cfg.ba.window, cfg.frontend.max_points)
    T_cw = lie.inv_se3(T_wc)
    return st._replace(
        obs_uv=st.obs_uv.at[0].set(left_uv),
        obs_mask=st.obs_mask.at[0].set(track.mask),
        T_cw=st.T_cw.at[0].set(T_cw),
        right_uv=right_uv,
        right_mask=right_mask,
        T_cw_right=_right_cam_pose(T_wc, cfg.camera.baseline),
        n_frames=jnp.int32(1),
    )


def _ba_refine(
    ba: BAState, track: TrackState, T_wc, obs_uv, obs_mask, cfg: PipelineConfig
):
    """Push this frame's observations and run windowed Schur BA.

    Returns (new_ba, refined T_wc, refined track, rms_after).
    """
    from ros_stereo_slam_tpu.models import bundle_adjust as ba_mod

    W = cfg.ba.window
    cam = _cam_of(cfg)
    slot = ba.n_frames % W
    ba = ba._replace(
        obs_uv=ba.obs_uv.at[slot].set(obs_uv),
        obs_mask=ba.obs_mask.at[slot].set(obs_mask),
        T_cw=ba.T_cw.at[slot].set(lie.inv_se3(T_wc)),
        n_frames=ba.n_frames + 1,
    )
    # Stack: slot 0 = right view (always fixed), 1.. = ring frames.
    poses = jnp.concatenate([ba.T_cw_right[None], ba.T_cw], axis=0)
    obs = jnp.concatenate([ba.right_uv[None], ba.obs_uv], axis=0)
    masks = jnp.concatenate([ba.right_mask[None], ba.obs_mask], axis=0)
    # Fix the right view + the oldest ring frame (gauge + scale anchor).
    oldest = jnp.where(ba.n_frames <= W, 0, ba.n_frames % W)
    ring_ids = jnp.arange(W)
    ring_unused = ring_ids >= ba.n_frames  # slots never written
    fixed = jnp.concatenate(
        [jnp.ones((1,), bool), (ring_ids == oldest) | ring_unused]
    )
    res = ba_mod.ba_solve(
        cam, poses, track.pts3d, obs, masks, fixed,
        iters=cfg.ba.iters, damping=cfg.ba.damping, huber_px=cfg.ba.huber_px,
    )
    ba = ba._replace(T_cw=res.T_cw[1:])
    T_wc_new = lie.inv_se3(res.T_cw[1 + slot])
    track = track._replace(pts3d=res.landmarks)
    return ba, T_wc_new, track, res.rms_after


def _insert_keyframe(
    kf: KeyframeStore, track: TrackState, T_wc, frame_idx
) -> KeyframeStore:
    slot = kf.count % kf.capacity
    return kf._replace(
        poses=kf.poses.at[slot].set(T_wc),
        frame_idx=kf.frame_idx.at[slot].set(frame_idx),
        points=kf.points.at[slot].set(track.pts3d),
        colors=kf.colors.at[slot].set(track.colors),
        point_mask=kf.point_mask.at[slot].set(track.mask),
        retrack=kf.retrack.at[slot].set(False),
        valid=kf.valid.at[slot].set(True),
        count=kf.count + 1,
    )


@partial(jax.jit, static_argnames=("cfg",))
def slam_frame_step(
    carry: SlamCarry,
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    grid_pts: jnp.ndarray,
    grid_mask: jnp.ndarray,
    cfg: PipelineConfig,
    left_rgb: jnp.ndarray | None = None,
) -> tuple[SlamCarry, FrameStats]:
    """One complete SLAM frame, fully on device.

    `left_rgb` (H, W, 3; f32 or uint8), if given, colors the points the
    keyframe branch triangulates (the RGB map path, config 2).

    `left_img`/`right_img` may be uint8: long sequences stage 4x more
    frames in HBM that way (a 4,096-frame KITTI-res f32 stack is ~15 GB —
    past v5e HBM — vs 3.8 GB as uint8); the cast to the pipeline's [0, 1]
    float range happens here, per frame, inside the scan.
    """
    if left_img.dtype == jnp.uint8:
        left_img = left_img.astype(jnp.float32) * (1.0 / 255.0)
    if right_img.dtype == jnp.uint8:
        right_img = right_img.astype(jnp.float32) * (1.0 / 255.0)
    fe, pc, kfc = cfg.frontend, cfg.pnp, cfg.keyframes
    cam = _cam_of(cfg)
    key, k_f, k_pnp, k_retry, k_kf = jax.random.split(carry.key, 5)

    seeded = fe.lk_seed == "const_velocity" and carry.dT is not None
    # Lazy pyramid: on the seeded happy path only the finest
    # `_happy_levels` are ever touched (seeded temporal track + seeded
    # stereo rematch); the coarse levels exist solely for the rescue
    # re-track and are built INSIDE its lax.cond branch — frames that
    # never rescue never pay for them.
    cur_pyr = tuple(
        pyramid.build_pyramid(left_img, _happy_levels(fe) if seeded
                              else fe.lk_levels)
    )

    # --- temporal tracking + F-gate + PnP (C4 + C5 + C7) ---
    T_prior = lie.inv_se3(carry.T_wc)

    def track_and_pnp(ref_pyr, c_pyr, init_flow, lk_params, keys):
        return _track_and_pnp(
            carry, ref_pyr, c_pyr, init_flow, lk_params, keys,
            cfg, cam, T_prior,
        )

    if fe.lk_seed == "const_velocity" and carry.dT is not None:
        # Predict the pose by replaying the last inter-frame motion, project
        # the landmarks, and track on a shallow pyramid from that seed.
        T_pred_cw = lie.inv_se3(carry.T_wc @ carry.dT)
        uv_pred, z_ok = project(
            cam, lie.transform_points(T_pred_cw, carry.track.pts3d)
        )
        h0, w0 = cur_pyr[0].shape
        seed_ok = (
            z_ok
            & jnp.all(jnp.isfinite(uv_pred), axis=-1)
            & interp.in_bounds(uv_pred, h0, w0, fe.lk_window // 2 + 1)
        )
        init_flow = jnp.where(
            seed_ok[:, None], uv_pred - carry.track.pts2d, 0.0
        )
        n_lvl = min(fe.lk_seeded_levels, fe.lk_levels)
        pts_s, m_s, p_s = track_and_pnp(
            carry.ref_pyr[:n_lvl], cur_pyr[:n_lvl], init_flow,
            frontend._lk_params(fe)._replace(
                iters=fe.lk_seeded_iters,
                walk_iters=fe.lk_seeded_walk_iters,
            ),
            jax.random.split(k_f, 2),
        )
        # Rescue: a wrong velocity prior (first frame, motion
        # discontinuity) starves PnP — re-track unseeded on the FULL
        # pyramid.  lax.cond: the expensive branch (including the coarse
        # pyramid builds for both frames) runs only then.
        def rescue():
            ref_full = tuple(
                pyramid.build_pyramid(carry.ref_pyr[0], fe.lk_levels)
            )
            cur_full = tuple(pyramid.build_pyramid(left_img, fe.lk_levels))
            return track_and_pnp(
                ref_full, cur_full, None, frontend._lk_params(fe),
                jax.random.split(k_pnp, 2),
            )

        tracked_pts, m, p = lax.cond(
            (p_s.n_inliers < fe.lk_rescue_min_inliers) | ~carry.dT_valid,
            rescue,
            lambda: (pts_s, m_s, p_s),
        )
    else:
        tracked_pts, m, p = track_and_pnp(
            carry.ref_pyr, cur_pyr, None, frontend._lk_params(fe),
            (k_f, k_pnp),
        )
    n_tracked = jnp.sum(m)
    need_retry = p.used_retry
    tracking_ok = p.n_inliers >= pc.min_inliers
    T_wc = jnp.where(tracking_ok, lie.inv_se3(p.T_cw), carry.T_wc)

    # --- windowed Schur bundle adjustment (C13, config 4) ---
    ba_state = carry.ba
    track_cur = carry.track
    ba_rms = jnp.float32(0.0)
    if cfg.ba_enabled:
        ba_state, T_wc, track_cur, ba_rms = _ba_refine(
            ba_state, track_cur, T_wc, tracked_pts, p.inliers & m, cfg
        )

    # --- keyframe trigger + re-triangulation (C8) ---
    is_kf = (p.n_inliers < kfc.min_pnp_inliers) | (~tracking_ok)

    stereo_seeded = (
        fe.lk_seed == "const_velocity"
        and fe.sampler == "grid"
        and fe.stereo_matcher == "lk"
        and carry.stereo_flow is not None
    )

    def kf_branch(_):
        if stereo_seeded:
            n_lvl = min(fe.lk_stereo_seeded_levels, fe.lk_levels)
            right_pyr = tuple(pyramid.build_pyramid(right_img, n_lvl))
            track, r_uv, r_mask = _bootstrap_track(
                cur_pyr[:n_lvl], right_pyr, grid_pts, grid_mask, T_wc, k_kf,
                cfg, stereo_flow=carry.stereo_flow, left_rgb=left_rgb,
            )
            flow = jnp.where(
                track.mask[:, None], r_uv - grid_pts, carry.stereo_flow
            )
        else:
            right_pyr = tuple(pyramid.build_pyramid(right_img, fe.lk_levels))
            track, r_uv, r_mask = _bootstrap_track(
                cur_pyr, right_pyr, grid_pts, grid_mask, T_wc, k_kf, cfg,
                left_rgb=left_rgb,
            )
            flow = carry.stereo_flow
        if cfg.ba_enabled:
            new_ba = _ba_reset(track, r_uv, r_mask, T_wc, track.pts2d, cfg)
        else:
            new_ba = None
        return track, new_ba, flow

    def continue_branch(_):
        return (
            track_cur._replace(pts2d=tracked_pts, mask=p.inliers & m),
            ba_state,
            carry.stereo_flow,
        )

    new_track, new_ba, new_flow = lax.cond(is_kf, kf_branch, continue_branch, None)
    new_kf_store = lax.cond(
        is_kf,
        lambda s: _insert_keyframe(s, new_track, T_wc, carry.frame_idx),
        lambda s: s,
        carry.keyframes,
    )

    if carry.dT is not None:
        # Velocity update: keep the last good estimate through a tracking
        # failure (the held pose would otherwise zero the prior and strand
        # the next frame's seed).
        dT_new = jnp.where(tracking_ok, lie.inv_se3(carry.T_wc) @ T_wc, carry.dT)
        dT_valid_new = carry.dT_valid | tracking_ok
    else:
        dT_new = None
        dT_valid_new = None
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
        used_retry=need_retry,
        ba_rms=ba_rms,
    )
    return new_carry, stats


@partial(jax.jit, static_argnames=("cfg",))
def init_carry(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    grid_pts: jnp.ndarray,
    grid_mask: jnp.ndarray,
    key: jax.Array,
    cfg: PipelineConfig,
    left_rgb: jnp.ndarray | None = None,
) -> SlamCarry:
    """Frame-0 bootstrap (reference initSequence :22-52)."""
    if left_img.dtype == jnp.uint8:
        left_img = left_img.astype(jnp.float32) * (1.0 / 255.0)
    if right_img.dtype == jnp.uint8:
        right_img = right_img.astype(jnp.float32) * (1.0 / 255.0)
    fe = cfg.frontend
    left_pyr = tuple(pyramid.build_pyramid(left_img, fe.lk_levels))
    right_pyr = tuple(pyramid.build_pyramid(right_img, fe.lk_levels))
    key, k_b = jax.random.split(key)
    T0 = jnp.eye(4, dtype=jnp.float32)
    track, r_uv, r_mask = _bootstrap_track(
        left_pyr, right_pyr, grid_pts, grid_mask, T0, k_b, cfg,
        left_rgb=left_rgb,
    )
    kf = KeyframeStore.empty(cfg.keyframes.max_keyframes, fe.max_points)
    kf = _insert_keyframe(kf, track, T0, jnp.int32(0))
    ba = (
        _ba_reset(track, r_uv, r_mask, T0, track.pts2d, cfg)
        if cfg.ba_enabled
        else None
    )
    stereo_flow = jnp.where(
        track.mask[:, None], r_uv - track.pts2d, jnp.zeros_like(r_uv)
    )
    # Carry only the pyramid depth the steady-state (seeded) path touches;
    # the rescue branch rebuilds coarse levels from level 0 on demand.
    ref_keep = (
        left_pyr[: _happy_levels(fe)]
        if fe.lk_seed == "const_velocity" else left_pyr
    )
    return SlamCarry(
        track=track, T_wc=T0, keyframes=kf, ref_pyr=ref_keep,
        key=key, frame_idx=jnp.int32(1), ba=ba,
        dT=jnp.eye(4, dtype=jnp.float32),
        dT_valid=jnp.bool_(False),
        stereo_flow=stereo_flow,
    )


@partial(jax.jit, static_argnames=("cfg",))
def run_sequence(
    left_seq: jnp.ndarray,  # (F, H, W) float32 — frames 1..F (post frame 0)
    right_seq: jnp.ndarray,  # (F, H, W)
    carry: SlamCarry,
    grid_pts: jnp.ndarray,
    grid_mask: jnp.ndarray,
    cfg: PipelineConfig,
    rgb_seq: jnp.ndarray | None = None,  # (F, H, W, 3) f32/uint8 optional
) -> tuple[SlamCarry, FrameStats]:
    """The whole sequence as ONE XLA program (lax.scan over frames)."""

    if rgb_seq is None:
        def body(c, imgs):
            left, right = imgs
            return slam_frame_step(c, left, right, grid_pts, grid_mask, cfg)

        return lax.scan(body, carry, (left_seq, right_seq))

    def body_rgb(c, imgs):
        left, right, rgb = imgs
        return slam_frame_step(
            c, left, right, grid_pts, grid_mask, cfg, left_rgb=rgb
        )

    return lax.scan(body_rgb, carry, (left_seq, right_seq, rgb_seq))
