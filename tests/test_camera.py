import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.utils import camera


def test_project_backproject_roundtrip():
    cam = camera.kitti_default()
    rng = np.random.default_rng(0)
    pts = np.stack(
        [
            rng.uniform(-10, 10, 128),
            rng.uniform(-5, 5, 128),
            rng.uniform(1, 50, 128),
        ],
        axis=1,
    ).astype(np.float32)
    uv, valid = camera.project(cam, jnp.asarray(pts))
    assert bool(np.all(np.asarray(valid)))
    back = camera.backproject(cam, uv, jnp.asarray(pts[:, 2]))
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-3)


def test_project_invalid_depth():
    cam = camera.kitti_default()
    pts = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 2.0]], dtype=jnp.float32)
    _, valid = camera.project(cam, pts)
    assert not bool(valid[0]) and bool(valid[1])


def test_K_matrix():
    cam = camera.kitti_default()
    K = np.asarray(cam.K)
    assert K[0, 0] == np.float32(718.856)
    assert K[1, 2] == np.float32(185.2157)
    cam2 = camera.Pinhole.from_K(K)
    assert float(cam2.fx) == float(cam.fx)
