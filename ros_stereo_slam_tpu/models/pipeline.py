"""Host-side SLAM drivers — the orchestrator (reference C1).

Python equivalents of ``visualSLAM::initSequence``'s frame loop
(``/root/reference/src/VisualSLAM.cpp:11-214``), in two flavors:

- :class:`StereoOdometry` — streaming driver: one fused jitted step per
  frame (:mod:`ros_stereo_slam_tpu.models.step`), host reads a handful of
  scalars per frame for logging/recovery decisions.
- :func:`run_offline` — throughput driver: the whole sequence as one
  ``lax.scan`` XLA program; host touches the device exactly twice
  (upload stacked frames, download trajectory + stats).

All data-dependent control flow (PnP retry ladder, keyframe trigger,
tracking-failure handling) runs ON DEVICE via ``lax.cond`` — the host
never gates the math.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.config import PipelineConfig
from ros_stereo_slam_tpu.models import step as step_mod
from ros_stereo_slam_tpu.models.state import KeyframeStore
from ros_stereo_slam_tpu.ops import grid


@dataclass
class FrameInfo:
    """Host-visible per-frame result (a few scalars + the pose)."""

    frame: int
    T_wc: np.ndarray  # (4, 4)
    n_tracked: int
    n_inliers: int
    is_keyframe: bool
    tracking_ok: bool
    used_retry: bool


@dataclass
class OfflineResult:
    """Result of a whole-sequence scan run."""

    trajectory: np.ndarray  # (F, 4, 4) incl. frame 0
    n_tracked: np.ndarray  # (F-1,)
    n_inliers: np.ndarray  # (F-1,)
    is_keyframe: np.ndarray  # (F-1,) bool
    tracking_ok: np.ndarray  # (F-1,) bool
    used_retry: np.ndarray  # (F-1,) bool
    keyframes: KeyframeStore  # final device-side store


def _grid_for(cfg: PipelineConfig):
    c, fe = cfg.camera, cfg.frontend
    pts, mask = grid.grid_points(c.height, c.width, fe.grid_step, fe.max_points)
    return jnp.asarray(pts), jnp.asarray(mask)


@dataclass
class StereoOdometry:
    """Streaming odometry driver over the fused on-device step."""

    config: PipelineConfig
    frame_count: int = field(init=False, default=0)

    def __post_init__(self):
        self.grid_pts, self.grid_mask = _grid_for(self.config)
        self._carry = None
        self.trajectory: list[np.ndarray] = []
        self.keyframe_frames: list[int] = []
        self.tracking_failed = False

    # -- public API --------------------------------------------------------

    def initialize(self, left: np.ndarray, right: np.ndarray,
                   left_rgb: np.ndarray | None = None) -> FrameInfo:
        """Frame 0: triangulate the initial feature set (reference :22-52)."""
        self._carry = step_mod.init_carry(
            jnp.asarray(left, jnp.float32),
            jnp.asarray(right, jnp.float32),
            self.grid_pts, self.grid_mask,
            jax.random.PRNGKey(self.config.seed),
            self.config,
            left_rgb=None if left_rgb is None else jnp.asarray(left_rgb),
        )
        n = int(jnp.sum(self._carry.track.mask))
        self.trajectory.append(np.asarray(self._carry.T_wc))
        self.keyframe_frames.append(0)
        self.frame_count = 1
        return FrameInfo(
            frame=0, T_wc=self.trajectory[-1], n_tracked=n, n_inliers=n,
            is_keyframe=True, tracking_ok=True, used_retry=False,
        )

    def process_frame(self, left: np.ndarray, right: np.ndarray,
                      left_rgb: np.ndarray | None = None) -> FrameInfo:
        """One odometry frame (single fused device dispatch)."""
        self._carry, stats = step_mod.slam_frame_step(
            self._carry,
            jnp.asarray(left, jnp.float32),
            jnp.asarray(right, jnp.float32),
            self.grid_pts, self.grid_mask, self.config,
            left_rgb=None if left_rgb is None else jnp.asarray(left_rgb),
        )
        frame_idx = self.frame_count
        self.frame_count += 1
        info = FrameInfo(
            frame=frame_idx,
            T_wc=np.asarray(stats.T_wc),
            n_tracked=int(stats.n_tracked),
            n_inliers=int(stats.n_inliers),
            is_keyframe=bool(stats.is_keyframe),
            tracking_ok=bool(stats.tracking_ok),
            used_retry=bool(stats.used_retry),
        )
        self.trajectory.append(info.T_wc)
        if info.is_keyframe:
            self.keyframe_frames.append(frame_idx)
        if not info.tracking_ok:
            self.tracking_failed = True
        return info

    @property
    def keyframes(self) -> KeyframeStore:
        return self._carry.keyframes

    # -- outputs -----------------------------------------------------------

    def trajectory_array(self) -> np.ndarray:
        return np.stack(self.trajectory, axis=0)

    def map_points(self) -> tuple[np.ndarray, np.ndarray]:
        """(M, 3) world points + (M, 3) colors from all keyframe blocks."""
        return map_points_of(self.keyframes)


def map_points_of(kf: KeyframeStore) -> tuple[np.ndarray, np.ndarray]:
    pm = np.asarray(kf.point_mask) & np.asarray(kf.valid)[:, None]
    return np.asarray(kf.points)[pm], np.asarray(kf.colors)[pm]


def run_offline(
    cfg: PipelineConfig,
    left_seq: np.ndarray,
    right_seq: np.ndarray,
    block: bool = True,
    rgb_seq: np.ndarray | None = None,
) -> OfflineResult:
    """Run a full sequence as one scan program.

    left_seq/right_seq: (F, H, W) float32 OR uint8 stacks (frame 0
    included) — uint8 stages 4x more frames in HBM (the cast runs per
    frame inside the scan; see step.slam_frame_step).
    rgb_seq: optional (F, H, W, 3) float32 or uint8 color stack — colors
    the keyframe map points (RGB map path; uint8 keeps HBM down and is
    cast per frame inside the scan).
    `block` is retained for signature compatibility; the single fused
    device_get of the stats always blocks.
    """
    del block
    grid_pts, grid_mask = _grid_for(cfg)
    stage_dtype = (jnp.uint8 if left_seq.dtype == np.uint8
                   else jnp.float32)
    seqs = (jnp.asarray(left_seq, stage_dtype),
            jnp.asarray(right_seq, stage_dtype))
    rgb = None if rgb_seq is None else jnp.asarray(rgb_seq)
    # ONE dispatch for bootstrap + scan (init_carry as a separate jitted
    # call costs a full host->device round trip — ~30 ms over the dev
    # tunnel, per run) and ONE device_get for every stats leaf (each
    # np.asarray is its own round trip: the six separate transfers this
    # replaces billed ~150 ms/run to the tunnel, ~0.4 ms/frame at the
    # 384-frame bench scale).
    carry, stats = _run_offline_fused(
        seqs[0], seqs[1], grid_pts, grid_mask, cfg, rgb
    )
    stats = jax.device_get(stats)
    traj = np.concatenate(
        [np.eye(4, dtype=np.float32)[None], stats.T_wc], axis=0
    )
    return OfflineResult(
        trajectory=traj,
        n_tracked=stats.n_tracked,
        n_inliers=stats.n_inliers,
        is_keyframe=stats.is_keyframe,
        tracking_ok=stats.tracking_ok,
        used_retry=stats.used_retry,
        keyframes=carry.keyframes,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _run_offline_fused(left_all, right_all, grid_pts, grid_mask,
                       cfg: PipelineConfig, rgb_all=None):
    """Frame-0 bootstrap + whole-sequence scan as ONE XLA program."""
    carry = step_mod.init_carry(
        left_all[0], right_all[0], grid_pts, grid_mask,
        jax.random.PRNGKey(cfg.seed), cfg,
        left_rgb=None if rgb_all is None else rgb_all[0],
    )
    return step_mod.run_sequence(
        left_all[1:], right_all[1:], carry, grid_pts, grid_mask, cfg,
        rgb_seq=None if rgb_all is None else rgb_all[1:],
    )
