"""Jitted per-frame pipeline stages (tracking, localization, bootstrap).

These are the TPU-resident equivalents of the reference's per-frame calls
(``/root/reference/src/VisualSLAM.cpp:54-200``):

- :func:`preprocess`       — image -> pyramid (device-resident across frames)
- :func:`odometry_step`    — ``PerspectiveNpointEstimation``
  (``src/rosFuncs.cpp:73-94``): temporal LK + F-gate + PnP-RANSAC.
- :func:`stereo_bootstrap` — ``stereoTriangulate``
  (``src/triangulation.cpp:73-166``): stereo LK + F-gate + triangulation,
  lifted to world frame (used at init and on keyframe insertion,
  ``src/keyFrameManagement.cpp:9-31``).

Each returns fixed-shape masked arrays; the ONLY values the host reads per
frame are a few scalars (inlier count, validity) to drive the keyframe /
failure ladders — everything else stays on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.config import FrontendConfig, PnPConfig
from ros_stereo_slam_tpu.models.state import TrackState
from ros_stereo_slam_tpu.ops import interp, lk, pnp, pyramid, ransac, triangulate
from ros_stereo_slam_tpu.utils import lie
from ros_stereo_slam_tpu.utils.camera import Pinhole


class OdometryOut(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4) cam-from-world
    T_wc: jnp.ndarray  # (4, 4) world-from-cam (the pose the pipeline logs)
    tracked: jnp.ndarray  # (N, 2) tracked 2D points in the current frame
    mask: jnp.ndarray  # (N,) bool — PnP inliers among tracked points
    n_tracked: jnp.ndarray  # () i32 — survivors of LK + F-gate
    n_inliers: jnp.ndarray  # () i32 — PnP inliers


def _lk_params(cfg: FrontendConfig) -> lk.LKParams:
    return lk.LKParams(
        window=cfg.lk_window,
        levels=cfg.lk_levels,
        iters=cfg.lk_iters,
        eps=cfg.lk_eps,
        min_eig=cfg.lk_min_eig,
        max_residual=cfg.lk_max_residual,
    )


def _lk_stereo_params(cfg: FrontendConfig) -> lk.LKParams:
    """Lighter profile for the rectified L->R match (1-D search)."""
    return _lk_params(cfg)._replace(
        iters=cfg.lk_stereo_iters, levels=cfg.lk_stereo_levels
    )


@partial(jax.jit, static_argnames=("levels",))
def preprocess(img: jnp.ndarray, levels: int) -> tuple:
    """Image -> pyramid tuple (computed once, reused by both LK call sites)."""
    return tuple(pyramid.build_pyramid(img, levels))


@partial(jax.jit, static_argnames=("fe", "pc"))
def odometry_step(
    ref_pyr: tuple,
    cur_pyr: tuple,
    track: TrackState,
    key: jax.Array,
    cam: Pinhole,
    pnp_thresh: jnp.ndarray,
    fe: FrontendConfig,
    pc: PnPConfig,
) -> OdometryOut:
    """Track the reference feature set into the current frame and localize.

    Mirrors ``PyrLKtrackFrame2Frame`` + ``solvePnPRansac``
    (``src/tracking.cpp:46-91``, ``src/rosFuncs.cpp:73-94``), with the
    vector compactions replaced by masks.
    """
    k_f, k_pnp = jax.random.split(key)
    res = lk.track(ref_pyr, cur_pyr, track.pts2d, None, _lk_params(fe))
    m = track.mask & res.valid
    fres = ransac.fmat_ransac(
        k_f, track.pts2d, res.points, m,
        thresh_px=fe.fmat_thresh_px, iters=fe.fmat_iters,
    )
    m = m & fres.inliers
    n_tracked = jnp.sum(m)
    pres = pnp.pnp_ransac(
        k_pnp, cam, track.pts3d, res.points, m,
        thresh_px=pnp_thresh, iters=pc.iters, refine_iters=pc.refine_iters,
        huber_px=pc.refine_huber_px,
    )
    return OdometryOut(
        T_cw=pres.T_cw,
        T_wc=lie.inv_se3(pres.T_cw),
        tracked=res.points,
        mask=pres.inliers,
        n_tracked=n_tracked,
        n_inliers=pres.n_inliers,
    )


@partial(jax.jit, static_argnames=("fe",))
def stereo_bootstrap(
    left_pyr: tuple,
    right_pyr: tuple,
    grid_pts: jnp.ndarray,
    grid_mask: jnp.ndarray,
    T_wc: jnp.ndarray,
    key: jax.Array,
    cam: Pinhole,
    baseline: jnp.ndarray,
    max_depth: jnp.ndarray,
    fe: FrontendConfig,
) -> tuple[TrackState, jnp.ndarray]:
    """(Re)build the tracked feature set from a stereo pair.

    Stereo LK epipolar matching -> F-gate -> closed-form triangulation ->
    world lift by T_wc.  Returns (new TrackState, n_valid scalar).
    """
    left0 = left_pyr[0]
    res = lk.track(left_pyr, right_pyr, grid_pts, None, _lk_stereo_params(fe))
    m = grid_mask & res.valid
    fres = ransac.fmat_ransac(
        key, grid_pts, res.points, m,
        thresh_px=fe.fmat_stereo_thresh_px, iters=fe.fmat_iters,
    )
    m = m & fres.inliers
    tri = triangulate.triangulate_rectified(
        cam, baseline, grid_pts, res.points, m, max_depth=max_depth
    )
    pts_world = lie.transform_points(T_wc, tri.points)
    gray = interp.bilinear_at(left0, grid_pts)
    colors = jnp.stack([gray, gray, gray], axis=-1)
    state = TrackState(
        pts2d=grid_pts, pts3d=pts_world, colors=colors, mask=tri.valid
    )
    return state, jnp.sum(tri.valid)
