"""Dense disparity (SGBM) tests against the synthetic depth oracle."""

import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.ops import sgbm
from ros_stereo_slam_tpu.utils.camera import Pinhole


def test_sgbm_recovers_synthetic_disparity():
    world = small_world(n_frames=1, seed=31)
    L, R, D = world.render(0)
    camc = world.camera
    gt_disp = camc.fx * camc.baseline / D  # (H, W)
    res = sgbm.sgbm(jnp.asarray(L), jnp.asarray(R), max_disp=64, block=7)
    disp = np.asarray(res.disparity)
    valid = np.asarray(res.valid)
    # Evaluate where GT disparity is in measurable range and not too close
    # to the border.
    H, W = L.shape
    m = valid.copy()
    m[:10] = m[-10:] = False
    m[:, :70] = m[:, -10:] = False
    m &= (gt_disp > 2.0) & (gt_disp < 60.0)
    assert m.sum() > 0.2 * H * W, f"too few valid disparities: {m.sum()}"
    err = np.abs(disp[m] - gt_disp[m])
    assert np.median(err) < 1.0, f"median disparity error {np.median(err):.2f}"
    # gross-error rate (bad pixels > 3px)
    assert (err > 3.0).mean() < 0.15, f"bad-pixel rate {(err > 3).mean():.3f}"


def test_disparity_to_cloud():
    world = small_world(n_frames=1, seed=32)
    L, R, D = world.render(0)
    camc = world.camera
    cam = Pinhole(fx=jnp.float32(camc.fx), fy=jnp.float32(camc.fy),
                  cx=jnp.float32(camc.cx), cy=jnp.float32(camc.cy))
    gt_disp = jnp.asarray(camc.fx * camc.baseline / D)
    valid = jnp.ones_like(gt_disp, dtype=bool)
    pts, ok = sgbm.disparity_to_cloud(cam, camc.baseline, gt_disp, valid,
                                      max_depth=100.0)
    pts = np.asarray(pts)
    ok = np.asarray(ok)
    # Reprojected depth must equal the oracle depth where kept.
    z = pts[:, 2].reshape(D.shape)
    keep = ok.reshape(D.shape)
    np.testing.assert_allclose(z[keep], D[keep], rtol=1e-4)
