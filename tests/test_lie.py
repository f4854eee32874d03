"""SE(3)/SO(3) property tests: round-trips, composition, Jacobian identities.

Oracle strategy per SURVEY.md §4: scipy.spatial.transform.Rotation where a
third-party oracle exists, plus algebraic identities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.utils import lie

try:
    from scipy.spatial.transform import Rotation as ScipyRot

    HAVE_SCIPY = True
except ImportError:  # pragma: no cover
    HAVE_SCIPY = False


def random_phis(n, scale=2.0, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


def test_exp_log_so3_roundtrip():
    # Exact recovery requires the canonical representative: clip ||phi|| < pi.
    phis = random_phis(64, scale=1.2)
    norms = np.linalg.norm(phis, axis=1, keepdims=True)
    phis = phis * np.minimum(norms, 3.0) / np.maximum(norms, 1e-9)
    R = jax.vmap(lie.exp_so3)(jnp.asarray(phis))
    back = jax.vmap(lie.log_so3)(R)
    np.testing.assert_allclose(np.asarray(back), phis, atol=5e-4)


def test_exp_log_so3_rotation_equivalence_large_angle():
    # ||phi|| > pi maps to the antipodal representative; rotations must match.
    phis = random_phis(64, scale=3.0, seed=11)
    R = jax.vmap(lie.exp_so3)(jnp.asarray(phis))
    back = jax.vmap(lie.log_so3)(R)
    R2 = jax.vmap(lie.exp_so3)(back)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_exp_so3_orthonormal():
    phis = random_phis(32, scale=3.0, seed=1)
    R = np.asarray(jax.vmap(lie.exp_so3)(jnp.asarray(phis)))
    eye = np.eye(3)[None].repeat(32, axis=0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy unavailable")
def test_exp_so3_vs_scipy():
    phis = random_phis(64, scale=2.5, seed=2)
    ours = np.asarray(jax.vmap(lie.exp_so3)(jnp.asarray(phis)))
    theirs = ScipyRot.from_rotvec(phis).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_log_so3_near_pi():
    # Angles very close to pi exercise the near-pi branch.
    rng = np.random.default_rng(3)
    axes = rng.standard_normal((16, 3)).astype(np.float32)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    phis = axes * (np.pi - 1e-4)
    R = jax.vmap(lie.exp_so3)(jnp.asarray(phis.astype(np.float32)))
    back = np.asarray(jax.vmap(lie.log_so3)(R))
    # log may return the antipodal representative; compare rotations.
    R2 = np.asarray(jax.vmap(lie.exp_so3)(jnp.asarray(back)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_exp_log_se3_roundtrip():
    rng = np.random.default_rng(4)
    phi = rng.standard_normal((64, 3)).astype(np.float32)
    norms = np.linalg.norm(phi, axis=1, keepdims=True)
    phi = phi * np.minimum(norms, 3.0) / np.maximum(norms, 1e-9)  # keep < pi
    xi = np.concatenate(
        [rng.standard_normal((64, 3)).astype(np.float32) * 2.0, phi], axis=1
    ).astype(np.float32)
    T = jax.vmap(lie.exp_se3)(jnp.asarray(xi))
    back = np.asarray(jax.vmap(lie.log_se3)(T))
    np.testing.assert_allclose(back, xi, atol=5e-4)


def test_inv_se3():
    xi = jnp.asarray(random_phis(1, seed=5)[0].tolist() + [0.3, -0.2, 0.9], dtype=jnp.float32)
    T = lie.exp_se3(xi)
    np.testing.assert_allclose(
        np.asarray(T @ lie.inv_se3(T)), np.eye(4), atol=1e-5
    )


def test_left_jacobian_identity():
    # J_l J_l^-1 = I on the standard domain ||phi|| < pi (J_l is singular
    # at 2*pi, and the closed-form inverse assumes the canonical chart).
    phis = random_phis(32, scale=2.0, seed=6)
    norms = np.linalg.norm(phis, axis=1, keepdims=True)
    phis = phis * np.minimum(norms, 3.0) / np.maximum(norms, 1e-9)
    J = jax.vmap(lie.left_jacobian_so3)(jnp.asarray(phis))
    Jinv = jax.vmap(lie.left_jacobian_inv_so3)(jnp.asarray(phis))
    eye = np.eye(3)[None].repeat(32, axis=0)
    np.testing.assert_allclose(np.asarray(J @ Jinv), eye, atol=1e-4)


def test_left_jacobian_numeric():
    # exp((phi + d)^) ~= exp((J_l d)^) exp(phi^) for small d.
    phi = jnp.asarray([0.4, -0.7, 0.2], dtype=jnp.float32)
    d = jnp.asarray([1e-3, -2e-3, 1.5e-3], dtype=jnp.float32)
    lhs = lie.exp_so3(phi + d)
    rhs = lie.exp_so3(lie.left_jacobian_so3(phi) @ d) @ lie.exp_so3(phi)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy unavailable")
def test_quat_roundtrip():
    phis = random_phis(32, scale=2.0, seed=7)
    R = jax.vmap(lie.exp_so3)(jnp.asarray(phis))
    q = np.asarray(jax.vmap(lie.quat_from_rot)(R))  # (w, x, y, z)
    scipy_q = ScipyRot.from_matrix(np.asarray(R)).as_quat()  # (x, y, z, w)
    scipy_q = np.concatenate([scipy_q[:, 3:4], scipy_q[:, :3]], axis=1)
    sign = np.sign(np.sum(q * scipy_q, axis=1, keepdims=True))
    np.testing.assert_allclose(q, scipy_q * sign, atol=1e-5)
    back = np.asarray(jax.vmap(lie.rot_from_quat)(jnp.asarray(q)))
    np.testing.assert_allclose(back, np.asarray(R), atol=1e-5)


def test_transform_points():
    xi = jnp.asarray([0.1, 0.2, 0.3, 0.2, -0.1, 0.15], dtype=jnp.float32)
    T = lie.exp_se3(xi)
    pts = jnp.asarray(np.random.default_rng(8).standard_normal((100, 3)), dtype=jnp.float32)
    out = lie.transform_points(T, pts)
    expect = np.asarray(pts) @ np.asarray(T[:3, :3]).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_adjoint():
    # Ad_T log(T X T^-1) == log(X) identity: log(T X T^-1) = Ad_T log(X).
    xiT = jnp.asarray([0.3, -0.2, 0.5, 0.1, 0.4, -0.3], dtype=jnp.float32)
    xiX = jnp.asarray([0.05, 0.02, -0.03, 0.04, -0.01, 0.02], dtype=jnp.float32)
    T = lie.exp_se3(xiT)
    X = lie.exp_se3(xiX)
    lhs = lie.log_se3(T @ X @ lie.inv_se3(T))
    rhs = lie.adjoint_se3(T) @ xiX
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-3)
