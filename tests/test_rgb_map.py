"""RGB map data path (config 2): colors sampled from a color image at
triangulation time must land in the keyframe store and the PLY export
(reference ``getColors``, ``/root/reference/include/monoUtils.h:180-193``;
the README ships an RGB KITTI-13 map)."""

import numpy as np
import pytest

import jax

import jax.numpy as jnp

from ros_stereo_slam_tpu.config import FrontendConfig, preset_mapping
from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.models.pipeline import map_points_of, run_offline

pytestmark = pytest.mark.slow  # multi-minute XLA compile; excluded from the default run (pytest.ini)


@pytest.fixture(scope="module")
def rgb_run():
    # XLA CPU compiler aborts under heavy executable-cache pressure
    # (see tests/test_slam_scan.py); start from a clean cache.
    jax.clear_caches()
    n = 6
    world = small_world(n_frames=n, seed=4)
    L, R, RGB = [], [], []
    for i in range(n):
        l, r, _ = world.render(i)
        L.append(l)
        R.append(r)
        RGB.append(world.render_rgb(i))
    L = np.stack(L)
    R = np.stack(R)
    RGB = np.stack(RGB)
    cfg = preset_mapping().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=16, max_points=768),
    )
    res = run_offline(cfg, L, R, rgb_seq=RGB)
    return world, RGB, res


def test_map_colors_are_true_rgb(rgb_run):
    """Keyframe colors must be genuinely chromatic (distinct channels) and
    match the source color image at the sampled pixels."""
    world, RGB, res = rgb_run
    pts, cols = map_points_of(res.keyframes)
    assert pts.shape[0] > 200
    # chromatic: channels differ materially across the map
    spread = np.abs(cols[:, 0] - cols[:, 2]).mean()
    assert spread > 0.02, f"map is effectively grayscale (spread={spread})"
    assert (cols >= 0).all() and (cols <= 1).all()


def test_frame0_keyframe_colors_match_source(rgb_run):
    """Frame 0's keyframe block colors equal bilinear samples of the frame-0
    color image at the grid points."""
    world, RGB, res = rgb_run
    kf = res.keyframes
    mask0 = np.asarray(kf.point_mask[0])
    cols0 = np.asarray(kf.colors[0])[mask0]
    # reconstruct the expected samples
    from ros_stereo_slam_tpu.models.pipeline import _grid_for
    from ros_stereo_slam_tpu.config import FrontendConfig, preset_mapping
    from ros_stereo_slam_tpu.ops import interp

    cfg = preset_mapping().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=16, max_points=768),
    )
    grid_pts, _ = _grid_for(cfg)
    want = np.stack(
        [
            np.asarray(interp.bilinear_at(jnp.asarray(RGB[0][..., c]), grid_pts))
            for c in range(3)
        ],
        axis=-1,
    )[mask0]
    np.testing.assert_allclose(cols0, want, atol=1e-4)


def test_grayscale_fallback_still_monochrome():
    """Without an RGB stack, colors replicate the grayscale intensity."""
    world = small_world(n_frames=3, seed=4)
    L, R = [], []
    for i in range(3):
        l, r, _ = world.render(i)
        L.append(l)
        R.append(r)
    cfg = preset_mapping().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=16, max_points=768),
    )
    res = run_offline(cfg, np.stack(L), np.stack(R))
    _, cols = map_points_of(res.keyframes)
    np.testing.assert_allclose(cols[:, 0], cols[:, 1], atol=1e-6)
    np.testing.assert_allclose(cols[:, 0], cols[:, 2], atol=1e-6)


def test_uint8_rgb_equivalent_to_f32(rgb_run):
    """uint8 color stacks (the HBM-friendly form) decode to the same map
    colors as float32 within quantization error."""
    world, RGB, res = rgb_run
    cfg = preset_mapping().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=16, max_points=768),
    )
    n = RGB.shape[0]
    L, R = [], []
    for i in range(n):
        l, r, _ = world.render(i)
        L.append(l)
        R.append(r)
    rgb8 = (RGB * 255.0 + 0.5).astype(np.uint8)
    res8 = run_offline(cfg, np.stack(L), np.stack(R), rgb_seq=rgb8)
    _, c32 = map_points_of(res.keyframes)
    _, c8 = map_points_of(res8.keyframes)
    assert c8.shape == c32.shape
    np.testing.assert_allclose(c8, c32, atol=3.0 / 255.0)


def test_scan_slam_rgb_colors(rgb_run):
    """run_offline_slam (config 3, detection in-scan) carries the same RGB
    color path as run_offline: keyframe map colors show real chroma."""
    import dataclasses

    from ros_stereo_slam_tpu.config import LoopClosureConfig, preset_loop_closure
    from ros_stereo_slam_tpu.models import vocab as vocab_mod
    from ros_stereo_slam_tpu.models.slam_scan import run_offline_slam
    from ros_stereo_slam_tpu.ops import orb

    world, RGB, _ = rgb_run
    L, R = [], []
    for i in range(RGB.shape[0]):
        l, r, _ = world.render(i)
        L.append(l)
        R.append(r)
    L, R = np.stack(L), np.stack(R)
    descs = []
    for i in range(0, L.shape[0], 2):
        f = orb.detect_and_compute(jnp.asarray(L[i]), 64)
        descs.append(np.asarray(f.desc_sign)[np.asarray(f.valid)])
    voc = vocab_mod.train(np.concatenate(descs), k=4, levels=2)
    cfg = preset_loop_closure().replace(
        camera=world.camera,
        frontend=FrontendConfig(grid_step=16, max_points=768),
        loop=dataclasses.replace(
            LoopClosureConfig(), orb_features=64, db_capacity=16,
            max_db_results=8, shortlist=16,
        ),
    )
    res = run_offline_slam(cfg, voc, L, R, rgb_seq=RGB)
    kf = res.keyframes
    colors = np.asarray(kf.colors)[np.asarray(kf.point_mask)]
    assert colors.size > 0
    chroma = np.abs(colors - colors.mean(axis=1, keepdims=True)).max()
    assert chroma > 0.05, "scan-mode SLAM map colors are monochrome"
