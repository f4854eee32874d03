"""Essential matrix + monocular pose recovery (ops/essential.py, ref C18).

Oracles: the synthetic world's exact poses and analytic depth.  The
reference's monocular path (``/root/reference/src/StereoCV.cpp:123-189``)
recovers an up-to-scale pose via findEssentialMat + recoverPose; here we
check rotation to fractions of a degree and translation DIRECTION (scale
is unobservable monocularly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.data.synthetic import small_world
from ros_stereo_slam_tpu.ops import essential, grid, lk
from ros_stereo_slam_tpu.utils.camera import Pinhole


@pytest.fixture(scope="module")
def setup():
    world = small_world(n_frames=3, seed=7)
    camc = world.camera
    cam = Pinhole(
        fx=jnp.float32(camc.fx), fy=jnp.float32(camc.fy),
        cx=jnp.float32(camc.cx), cy=jnp.float32(camc.cy),
    )
    L0, R0, D0 = world.render(0)
    L1, _, _ = world.render(1)
    pts, mask = grid.grid_points(camc.height, camc.width, 15, 512)
    tr = lk.track_images(jnp.asarray(L0), jnp.asarray(L1), jnp.asarray(pts))
    m = jnp.asarray(np.asarray(tr.valid) & np.asarray(mask))
    # GT cam1->cam2: p_c2 = (T_wc2^-1 T_wc1) p_c1
    T21 = np.linalg.inv(world.poses[1]) @ world.poses[0]
    return world, cam, np.asarray(pts), tr.points, m, T21, (L0, R0, D0)


def test_essential_ransac_inliers_and_epipolar(setup):
    _, cam, pts, cur, m, T21, _ = setup
    er = essential.essential_ransac(
        jax.random.PRNGKey(0), cam, jnp.asarray(pts), cur, m, 1.0, 256
    )
    n_valid = int(np.sum(np.asarray(m)))
    assert int(er.n_inliers) > 0.7 * n_valid
    # E must satisfy the epipolar constraint for the GT geometry: the GT
    # E_gt = [t]x R (up to scale) should be parallel to the estimate.
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R
    E = np.asarray(er.E)
    cosang = abs(np.sum(E * E_gt)) / (
        np.linalg.norm(E) * np.linalg.norm(E_gt)
    )
    # LK-tracked correspondences: forward motion constrains the epipole
    # weakly, so this is a sanity bound; test_exact_correspondences holds
    # the estimator itself to tight tolerances.
    assert cosang > 0.995


def test_project_essential_singular_values(setup):
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.standard_normal((4, 3, 3)).astype(np.float32))
    E = jax.vmap(essential.project_essential)(M)
    s = np.linalg.svd(np.asarray(E), compute_uv=False)
    np.testing.assert_allclose(s[:, 0], s[:, 1], rtol=1e-3)
    assert np.all(s[:, 2] < 1e-3 * s[:, 0])


def test_recover_pose_matches_gt(setup):
    _, cam, pts, cur, m, T21, _ = setup
    er, rp = essential.monocular_triangulate(
        jax.random.PRNGKey(1), cam, jnp.asarray(pts), cur, m, 1.0, 256
    )
    R_gt, t_gt = T21[:3, :3], T21[:3, 3]
    R = np.asarray(rp.R)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_gt.T @ R) - 1) / 2, -1, 1))
    )
    assert ang < 0.2, f"rotation error {ang} deg"
    tdir = np.asarray(rp.t)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert abs(np.dot(tdir, t_gt_dir)) > 0.99  # ~8 deg; LK-noise bound
    # cheirality: the winning candidate keeps most inliers in front
    assert int(rp.n_good) > 0.8 * int(er.n_inliers)


def test_exact_correspondences_tight(setup):
    """Estimator precision oracle: GT-projected correspondences -> the
    recovered pose must be near-exact (isolates estimator from LK)."""
    world, cam, pts, _, _, T21, (_, _, D0) = setup
    camc = world.camera
    z = D0[
        np.clip(pts[:, 1].astype(int), 0, camc.height - 1),
        np.clip(pts[:, 0].astype(int), 0, camc.width - 1),
    ]
    x = (pts[:, 0] - camc.cx) / camc.fx * z
    y = (pts[:, 1] - camc.cy) / camc.fy * z
    P2 = np.stack([x, y, z], 1) @ T21[:3, :3].T + T21[:3, 3]
    uv2 = np.stack(
        [
            P2[:, 0] / P2[:, 2] * camc.fx + camc.cx,
            P2[:, 1] / P2[:, 2] * camc.fy + camc.cy,
        ],
        1,
    )
    m = (
        (P2[:, 2] > 0.1)
        & (uv2[:, 0] >= 0) & (uv2[:, 0] < camc.width)
        & (uv2[:, 1] >= 0) & (uv2[:, 1] < camc.height)
        & np.isfinite(z)
    )
    er, rp = essential.monocular_triangulate(
        jax.random.PRNGKey(1), cam,
        jnp.asarray(pts, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(m), 1.0, 256,
    )
    assert int(er.n_inliers) > 0.95 * int(m.sum())
    R = np.asarray(rp.R)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(T21[:3, :3].T @ R) - 1) / 2, -1, 1))
    )
    assert ang < 0.1
    t_gt_dir = T21[:3, 3] / np.linalg.norm(T21[:3, 3])
    assert abs(np.dot(np.asarray(rp.t), t_gt_dir)) > 0.9999


def test_midpoint_depth_matches_stereo_oracle(setup):
    world, cam, pts, _, _, _, (L0, R0, D0) = setup
    camc = world.camera
    # Stereo pair as a two-view problem: right cam = left shifted by
    # +baseline along x, so cam2-from-cam1 is R=I, t=(-b, 0, 0).
    tr = lk.track_images(jnp.asarray(L0), jnp.asarray(R0), jnp.asarray(pts))
    m = np.asarray(tr.valid)
    x1 = essential.normalized_coords(cam, jnp.asarray(pts))
    x2 = essential.normalized_coords(cam, tr.points)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.asarray([-camc.baseline, 0.0, 0.0], jnp.float32)
    p, z1, z2 = essential.midpoint_triangulate(R, t, x1, x2)
    z1 = np.asarray(z1)
    gt = D0[
        np.clip(pts[:, 1].astype(int), 0, camc.height - 1),
        np.clip(pts[:, 0].astype(int), 0, camc.width - 1),
    ]
    sel = m & (gt < 60) & (z1 > 0)
    err = np.abs(z1[sel] - gt[sel])
    assert np.median(err) < 0.5, f"median depth err {np.median(err)}"


def test_degenerate_all_masked(setup):
    _, cam, pts, cur, _, _, _ = setup
    m0 = jnp.zeros((pts.shape[0],), bool)
    er, rp = essential.monocular_triangulate(
        jax.random.PRNGKey(2), cam, jnp.asarray(pts), cur, m0, 1.0, 64
    )
    assert int(er.n_inliers) == 0
    assert np.all(np.isfinite(np.asarray(rp.R)))
    assert np.all(np.isfinite(np.asarray(rp.t)))
