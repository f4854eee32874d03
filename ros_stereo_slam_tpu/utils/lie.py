"""SO(3) / SE(3) manifold operations, batched and jit-friendly.

Replaces the reference's ad-hoc Eigen/OpenCV conversions
(``/root/reference/include/monoUtils.h:72-127`` — ``euler2Quaternion``,
``cvMat2Eigen``, ``Rmat2Quat``) and the g2o internal SE(3) machinery used by
its pose graph (``/root/reference/include/poseGraph.h``) with explicit,
numerically-stable exp/log maps.  Everything is pure jnp, shaped for
``vmap``: functions accept a single element (3-vector / 6-vector / matrix)
and are batched by the caller.

Conventions
-----------
- Rotations as 3x3 matrices ``R`` (world-from-body unless stated otherwise).
- SE(3) as 4x4 homogeneous matrices ``T = [[R, t], [0, 1]]``.
- Twists are 6-vectors ``xi = (rho, phi)`` with translation part first,
  rotation part last; ``T = exp(hat(xi))``.
- float32 throughout (TPU native); the series expansions below keep the
  small-angle paths accurate in f32.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric 3x3 matrix."""
    x, y, z = phi[0], phi[1], phi[2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y]),
            jnp.stack([z, zero, -x]),
            jnp.stack([-y, x, zero]),
        ]
    )


def vee_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat_so3` (assumes M skew-symmetric)."""
    return jnp.stack([M[2, 1], M[0, 2], M[1, 0]])


def _sinc(theta2: jnp.ndarray) -> jnp.ndarray:
    """sin(t)/t with a Taylor branch, as a function of t^2."""
    theta = jnp.sqrt(theta2)
    small = theta2 < _EPS
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe) / safe)


def _cosc(theta2: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos(t)) / t^2 with a Taylor branch."""
    small = theta2 < _EPS
    safe = jnp.where(small, 1.0, theta2)
    return jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(jnp.sqrt(safe))) / safe)


def _sinc3(theta2: jnp.ndarray) -> jnp.ndarray:
    """(t - sin(t)) / t^3 with a Taylor branch."""
    small = theta2 < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta * theta2),
    )


def exp_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis-angle 3-vector -> rotation matrix."""
    theta2 = jnp.dot(phi, phi)
    K = hat_so3(phi)
    I = jnp.eye(3, dtype=phi.dtype)
    return I + _sinc(theta2) * K + _cosc(theta2) * (K @ K)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle 3-vector, stable near 0 and pi."""
    trace = jnp.clip(R[0, 0] + R[1, 1] + R[2, 2], -1.0, 3.0)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Generic branch: vee of the antisymmetric part, scaled.
    w = vee_so3(R - R.T)  # = 2 sin(theta) * axis
    sin_theta = jnp.sin(theta)
    generic = jnp.where(
        theta < 1e-5,
        # theta/(2 sin theta) ~ 0.5 + theta^2/12
        (0.5 + theta * theta / 12.0) * w,
        theta / jnp.maximum(2.0 * sin_theta, 1e-20) * w,
    )
    # Near pi: sin(theta) -> 0, use the diagonal of the outer-product form.
    #   R = I + sin* K + (1-cos) K^2 ; at pi, R = I + 2 aa^T - 2 I (off axis)
    #   => aa^T = (R + I)/2 ; take column with largest diagonal.
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.maximum(jnp.stack([B[0, 0], B[1, 1], B[2, 2]]), 1e-12)
    k = jnp.argmax(diag)
    axis_col = B[:, k] / jnp.sqrt(diag[k])
    # Fix sign so it agrees with the antisymmetric part (which may be ~0; then
    # sign is arbitrary and either choice is a valid log).
    sign = jnp.where(jnp.dot(axis_col, w) < 0.0, -1.0, 1.0)
    near_pi = sign * axis_col * theta
    return jnp.where(jnp.pi - theta < 1e-3, near_pi, generic)


def left_jacobian_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(phi): exp((phi+dphi)^) ~ exp(J_l dphi ^) exp(phi^)."""
    theta2 = jnp.dot(phi, phi)
    K = hat_so3(phi)
    I = jnp.eye(3, dtype=phi.dtype)
    return I + _cosc(theta2) * K + _sinc3(theta2) * (K @ K)


def left_jacobian_inv_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the SO(3) left Jacobian (closed form)."""
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    K = hat_so3(phi)
    I = jnp.eye(3, dtype=phi.dtype)
    small = theta2 < _EPS
    half = jnp.where(small, 1.0, theta * 0.5)
    # coef = (1/theta^2) * (1 - theta/2 * cot(theta/2))
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-20))
        / jnp.where(small, 1.0, theta2),
    )
    return I - 0.5 * K + cot_term * (K @ K)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble a 4x4 homogeneous transform from R (3x3) and t (3,)."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def rot(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def trans(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform: [R,t]^-1 = [R^T, -R^T t].

    This is the closed form the reference computes by hand per frame
    (``/root/reference/src/VisualSLAM.cpp:71-74`` and ``:93-108``).
    """
    R = T[:3, :3]
    t = T[:3, 3]
    return make_se3(R.T, -R.T @ t)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (rho, phi) 6-vector -> 4x4 transform."""
    rho, phi = xi[:3], xi[3:]
    R = exp_so3(phi)
    V = left_jacobian_so3(phi)
    return make_se3(R, V @ rho)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform -> twist (rho, phi) 6-vector."""
    phi = log_so3(T[:3, :3])
    Vinv = left_jacobian_inv_so3(phi)
    rho = Vinv @ T[:3, 3]
    return jnp.concatenate([rho, phi])


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of T: Ad_T = [[R, t^ R], [0, R]] (acts on (rho, phi) twists)."""
    R = T[:3, :3]
    t = T[:3, 3]
    top = jnp.concatenate([R, hat_so3(t) @ R], axis=1)
    bot = jnp.concatenate([jnp.zeros((3, 3), dtype=T.dtype), R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """T_a @ T_b (kept as a named op for readability at call sites)."""
    return Ta @ Tb


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to an (N, 3) point array: R @ p + t.

    Batched as a single matmul so XLA maps it onto the MXU — this is the
    TPU equivalent of the reference's per-keyframe Eigen loops
    (``/root/reference/src/keyFrameManagement.cpp:33-46``,
    ``/root/reference/src/optimizationStuff.cpp:27-41``).
    """
    return pts @ T[:3, :3].T + T[:3, 3]


def quat_from_rot(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z); replaces
    ``Rmat2Quat`` (``/root/reference/include/monoUtils.h:215-227``).

    Uses the branch-free Shepperd-style construction with jnp.where.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)])

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)])

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)])

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3])

    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22])
    best = jnp.argmax(scores)
    q = jnp.stack([q0, q1, q2, q3])[best]
    return q / jnp.linalg.norm(q)


def rot_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
        ]
    )
