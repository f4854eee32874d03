"""LK tracker tests against analytic oracles.

Oracle: synthetically warped images with exactly known flow (pure
translation applied via bilinear resampling of a smooth random texture),
plus the synthetic 3D world renderer for realistic parallax.
"""

import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.data.synthetic import _smooth_noise_2d, small_world
from ros_stereo_slam_tpu.ops import grid, lk


def _shift_image(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Bilinear-shift: out(y, x) = img(y - dy, x - dx)."""
    h, w = img.shape
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
    sy = np.clip(ys - dy, 0, h - 1.001)
    sx = np.clip(xs - dx, 0, w - 1.001)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    fy = sy - y0
    fx = sx - x0
    return (
        img[y0, x0] * (1 - fy) * (1 - fx)
        + img[y0, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1, x0] * fy * (1 - fx)
        + img[y0 + 1, x0 + 1] * fy * fx
    ).astype(np.float32)


def test_lk_pure_translation_subpixel():
    rng = np.random.default_rng(0)
    img = _smooth_noise_2d((192, 256), rng, octaves=5, base_period=24)
    dx, dy = 3.37, -2.21
    cur = _shift_image(img, dx, dy)
    pts, mask = grid.grid_points(192, 256, 16, 128)
    res = lk.track_images(jnp.asarray(img), jnp.asarray(cur), jnp.asarray(pts))
    valid = np.asarray(res.valid) & mask
    assert valid.sum() > 60
    flow = np.asarray(res.points) - pts
    err = np.abs(flow[valid] - np.array([dx, dy]))
    assert np.median(err) < 0.05, f"median err {np.median(err)}"
    assert np.percentile(err, 90) < 0.25


def test_lk_large_translation_needs_pyramid():
    rng = np.random.default_rng(1)
    img = _smooth_noise_2d((192, 256), rng, octaves=4, base_period=48)
    dx, dy = 17.0, 9.0  # far beyond a 21px window without a pyramid
    cur = _shift_image(img, dx, dy)
    pts, mask = grid.grid_points(192, 256, 16, 128)
    res = lk.track_images(jnp.asarray(img), jnp.asarray(cur), jnp.asarray(pts))
    valid = np.asarray(res.valid) & mask
    assert valid.sum() > 40
    flow = np.asarray(res.points) - pts
    err = np.linalg.norm(flow[valid] - np.array([dx, dy]), axis=1)
    assert np.median(err) < 0.2, f"median err {np.median(err)}"


def test_lk_stereo_disparity_on_synthetic_world():
    world = small_world(n_frames=2, seed=3)
    left, right, depth = world.render(0)
    cam = world.camera
    pts, mask = grid.grid_points(cam.height, cam.width, 20, 256)
    res = lk.track_images(jnp.asarray(left), jnp.asarray(right), jnp.asarray(pts))
    valid = np.asarray(res.valid) & mask
    assert valid.sum() > 100
    flow = np.asarray(res.points) - pts
    # Ground-truth disparity: right cam is +baseline along +x, so features
    # move LEFT: du = -fx * b / z, dv = 0.
    z = depth[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    gt_du = -cam.fx * cam.baseline / z
    # Compare where disparity is meaningful (far-wall points at 200 m+ have
    # sub-0.5px disparity and pixel-quantized GT depth).
    near = valid & (z < 60.0)
    assert near.sum() > 50
    err_u = np.abs(flow[near, 0] - gt_du[near])
    err_v = np.abs(flow[near, 1])
    # Corridor walls are highly oblique: translation-only LK sees left/right
    # patch distortion, giving ~0.2px disparity bias (vs 0.006px on
    # fronto-parallel scenes — see test_lk_pure_translation_subpixel).
    assert np.median(err_u) < 0.35, f"median disparity err {np.median(err_u)}"
    assert np.median(err_v) < 0.35


def test_lk_invalid_flat_region():
    # Featureless (flat) patches must be flagged invalid, not hallucinated.
    img = np.full((128, 128), 0.5, dtype=np.float32)
    pts = np.asarray([[64.0, 64.0], [30.0, 30.0]], dtype=np.float32)
    res = lk.track_images(jnp.asarray(img), jnp.asarray(img), jnp.asarray(pts))
    assert not bool(np.any(np.asarray(res.valid)))
