"""Essential-matrix estimation + monocular pose recovery (reference C18).

TPU-native replacement for the monocular utilities of the reference's
dense-disparity node: ``cv::findEssentialMat`` + ``cv::recoverPose`` +
mid-point triangulation (``/root/reference/src/StereoCV.cpp:123-189``
``monocularTriangulate``, essential/recover at ``:162-163``).

Same fixed-budget parallel-hypothesis design as :mod:`.ransac` (SURVEY.md
§7): Gumbel-top-k minimal-set sampling, batched 8-point solves in
camera-normalized coordinates, projection onto the essential manifold
(sigma = (1, 1, 0)) via the analytic 3x3 eigendecomposition, Sampson
scoring as one (K, N) masked matmul reduction.  Pose disambiguation is the
classic 4-candidate cheirality vote, evaluated for all candidates at once;
triangulation is the closed-form two-ray midpoint (batched 2x2 solves —
no per-point LAPACK SVDs on the device).

Scale note: as in the reference's monocular path, translation is only
recovered up to scale; ``t`` is unit-norm.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ros_stereo_slam_tpu.ops import linalg
from ros_stereo_slam_tpu.ops.ransac import (
    _epipolar_design,
    _sample_minimal_sets,
    sampson_distance,
)
from ros_stereo_slam_tpu.utils.camera import Pinhole


class EssentialResult(NamedTuple):
    E: jnp.ndarray  # (3, 3) best essential matrix
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32


class RecoveredPose(NamedTuple):
    R: jnp.ndarray  # (3, 3) cam2-from-cam1 rotation
    t: jnp.ndarray  # (3,) unit-norm cam2-from-cam1 translation
    points: jnp.ndarray  # (N, 3) triangulated points in cam1 frame
    in_front: jnp.ndarray  # (N,) bool: positive depth in BOTH cameras
    n_good: jnp.ndarray  # () int32 cheirality vote of the winner


def normalized_coords(cam: Pinhole, pts: jnp.ndarray) -> jnp.ndarray:
    """Pixel (N, 2) -> camera-normalized (N, 2): K^-1 [u, v, 1]."""
    x = (pts[..., 0] - cam.cx) / cam.fx
    y = (pts[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def _ortho3(M: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Right-handed SVD factors of a (batch of) 3x3 E with sigma ~ (s, s, 0).

    Returns (U, V) with det(U) = det(V) = +1 and the zero-singular-value
    direction in the LAST column, built from the analytic eigh of E^T E
    (columns ascending) — avoiding the serial QDWH/LAPACK SVD path.
    """
    evals, Vasc = linalg.eigh3x3(jnp.swapaxes(M, -1, -2) @ M)
    # Reorder columns to descending singular value: (2, 1, 0).
    v1 = Vasc[..., :, 2]
    v2 = Vasc[..., :, 1]
    v3 = jnp.cross(v1, v2)  # right-handed; null direction of E
    s1 = jnp.sqrt(jnp.maximum(evals[..., 2], 1e-20))[..., None]
    s2 = jnp.sqrt(jnp.maximum(evals[..., 1], 1e-20))[..., None]
    u1 = jnp.einsum("...ij,...j->...i", M, v1) / s1
    u2 = jnp.einsum("...ij,...j->...i", M, v2) / s2
    # Re-orthonormalize u2 against u1 (f32 + near-degenerate hypotheses).
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-12)
    u2 = u2 - jnp.sum(u1 * u2, axis=-1, keepdims=True) * u1
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), 1e-12)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    V = jnp.stack([v1, v2, v3], axis=-1)
    return U, V


def _essential_factors(E: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(U, V) SVD factors of an (already manifold-projected) essential E.

    A true essential matrix has singular values (s, s, 0): the repeated
    pair makes Eberly-style eigenvector extraction (``linalg.eigh3x3``)
    ill-defined there, but the E -> (R, t) decomposition is invariant to
    the in-plane rotation freedom, so ANY right-handed orthonormal
    completion of the (isolated) null directions is valid:

    - v3 = unit null vector of E (isolated eigenvalue 0 of E^T E);
    - v1 = deterministic completion orthogonal to v3, v2 = v3 x v1;
    - u_i = E v_i / |E v_i| (i = 1, 2), u3 = u1 x u2.
    """
    EtE = jnp.swapaxes(E, -1, -2) @ E
    # Null direction: columns of (EtE - s I)^2 with s the repeated value
    # span v3; s = trace/2 for sigma = (s, s, 0).
    s = 0.5 * jnp.trace(EtE, axis1=-2, axis2=-1)[..., None, None]
    P = (EtE - s * jnp.eye(3, dtype=E.dtype))
    P = P @ P
    norms = jnp.sum(P * P, axis=-2)
    bestc = jnp.argmax(norms, axis=-1)
    v3 = jnp.take_along_axis(P, bestc[..., None, None], axis=-1)[..., 0]
    v3 = v3 / jnp.maximum(jnp.linalg.norm(v3, axis=-1, keepdims=True), 1e-12)
    # Deterministic completion: cross with the world axis least aligned
    # with v3 (selected smoothly via the smallest |component|).
    eye = jnp.eye(3, dtype=E.dtype)
    axis_idx = jnp.argmin(jnp.abs(v3), axis=-1)
    a = eye[axis_idx]
    v1 = jnp.cross(v3, a)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-12)
    v2 = jnp.cross(v3, v1)
    V = jnp.stack([v1, v2, v3], axis=-1)
    u1 = jnp.einsum("...ij,...j->...i", E, v1)
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-12)
    u2 = jnp.einsum("...ij,...j->...i", E, v2)
    u2 = u2 - jnp.sum(u1 * u2, axis=-1, keepdims=True) * u1
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), 1e-12)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    return U, V


def project_essential(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest essential matrix: U diag(1, 1, 0) V^T (scale-free)."""
    U, V = _ortho3(M)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], M.dtype))
    return U @ D @ jnp.swapaxes(V, -1, -2)


def _eight_point_essential(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    A = _epipolar_design(p1, p2)  # (8, 9)
    return project_essential(linalg.null_vector(A).reshape(3, 3))


@partial(jax.jit, static_argnames=("iters",))
def essential_ransac(
    key: jax.Array,
    cam: Pinhole,
    pts1: jnp.ndarray,  # (N, 2) pixels, view 1
    pts2: jnp.ndarray,  # (N, 2) pixels, view 2
    mask: jnp.ndarray,  # (N,) bool
    thresh_px: float | jnp.ndarray = 1.0,
    iters: int = 256,
) -> EssentialResult:
    """Fixed-budget parallel RANSAC for E on pixel correspondences."""
    n = pts1.shape[0]
    x1 = normalized_coords(cam, pts1)
    x2 = normalized_coords(cam, pts2)
    idx = _sample_minimal_sets(key, mask, iters, 8)
    E = jax.vmap(_eight_point_essential)(x1[idx], x2[idx])  # (K, 3, 3)

    x1h = jnp.concatenate([x1, jnp.ones((n, 1), x1.dtype)], axis=1)
    x2h = jnp.concatenate([x2, jnp.ones((n, 1), x2.dtype)], axis=1)
    # Sampson distance in normalized coords; convert the pixel threshold
    # with the mean focal length (first-order, as OpenCV does).
    f = 0.5 * (cam.fx + cam.fy)
    thr = (thresh_px / f) ** 2
    err = sampson_distance(E, x1h, x2h)  # (K, N)
    inl = (err < thr) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    # MSAC model selection: sum of truncated errors (lower = better) is
    # far more discriminative than inlier counting when many hypotheses
    # saturate the count (near-forward motion).
    msac = jnp.sum(
        jnp.where(mask[None, :], jnp.minimum(err, thr), 0.0), axis=1
    )
    best = jnp.argmin(jnp.where(jnp.isfinite(msac), msac, jnp.inf))

    # IRLS polish: three rounds of Sampson-weighted refit over the current
    # inlier set (deterministic, fixed trip count — jit-friendly).  Keeps
    # the best-of (hypothesis, refit) by inlier count.
    A_full = _epipolar_design(x1, x2)

    def msac_of(E_cur):
        e = sampson_distance(E_cur, x1h, x2h)
        return e, jnp.sum(jnp.where(mask, jnp.minimum(e, thr), 0.0))

    def refit(carry, _):
        E_cur, inl_cur, sc_cur = carry
        e = sampson_distance(E_cur, x1h, x2h)
        w = inl_cur.astype(x1.dtype) / (1.0 + e / jnp.maximum(thr, 1e-12))
        E_new = project_essential(linalg.null_vector(A_full * w[:, None]).reshape(3, 3))
        err_n, sc_n = msac_of(E_new)
        inl_n = (err_n < thr) & mask
        ok = jnp.all(jnp.isfinite(E_new)) & (sc_n <= sc_cur)
        return (
            jnp.where(ok, E_new, E_cur),
            jnp.where(ok, inl_n, inl_cur),
            jnp.where(ok, sc_n, sc_cur),
        ), None

    (E_out, inl_out, _), _ = jax.lax.scan(
        refit, (E[best], inl[best], msac[best]), None, length=3
    )
    cnt_out = jnp.sum(inl_out)
    # Degenerate inputs (e.g. empty mask) can leave a non-finite E; return
    # a canonical valid essential matrix with zero inliers instead.
    finite = jnp.all(jnp.isfinite(E_out))
    E_canon = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E_out.dtype))
    return EssentialResult(
        E=jnp.where(finite, E_out, E_canon),
        inliers=inl_out & finite,
        n_inliers=jnp.where(finite, cnt_out, 0),
    )


def midpoint_triangulate(
    R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
):
    """Two-ray midpoint triangulation in cam1 coordinates.

    R, t: cam2-from-cam1 (p2 = R p1 + t).  x1, x2: (N, 2) normalized.
    Returns (points (N, 3), z1 (N,), z2 (N,)).  Closed-form batched 2x2
    solve — the TPU-friendly replacement for per-point homogeneous SVDs.
    """
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    f1 = jnp.concatenate([x1, ones], axis=-1)  # rays from cam1 origin
    # cam2 center and ray directions expressed in cam1 frame.
    c2 = -jnp.einsum("ji,j->i", R, t)
    f2 = jnp.einsum("ji,nj->ni", R, jnp.concatenate([x2, ones], axis=-1))
    # min_{a,b} || a f1 - (c2 + b f2) ||^2  ->  2x2 normal equations.
    a11 = jnp.sum(f1 * f1, -1)
    a22 = jnp.sum(f2 * f2, -1)
    a12 = -jnp.sum(f1 * f2, -1)
    b1 = jnp.sum(f1 * c2[None, :], -1)
    b2 = -jnp.sum(f2 * c2[None, :], -1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    a = (b1 * a22 - b2 * a12) / det
    b = (a11 * b2 - a12 * b1) / det
    p = 0.5 * (a[:, None] * f1 + c2[None, :] + b[:, None] * f2)
    z1 = p[..., 2]
    z2 = jnp.einsum("ij,nj->ni", R, p)[..., 2] + t[2]
    return p, z1, z2


@jax.jit
def recover_pose(
    E: jnp.ndarray,
    cam: Pinhole,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
) -> RecoveredPose:
    """``cv::recoverPose`` equivalent: 4-candidate cheirality vote.

    All four (R, t) decompositions of E are triangulated for ALL points in
    one batched evaluation; the candidate with the most points in front of
    both cameras wins (``/root/reference/src/StereoCV.cpp:163``).
    """
    E_canon = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype))
    E = jnp.where(jnp.all(jnp.isfinite(E)), E, E_canon)
    U, V = _essential_factors(E)
    Wm = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ Wm @ V.swapaxes(-1, -2)
    Rb = U @ Wm.T @ V.swapaxes(-1, -2)
    # det(U)=det(V)=+1 by construction, so det(Ra)=det(Rb)=+1 already.
    tu = U[:, 2] / jnp.maximum(jnp.linalg.norm(U[:, 2]), 1e-12)

    x1 = normalized_coords(cam, pts1)
    x2 = normalized_coords(cam, pts2)
    Rs = jnp.stack([Ra, Ra, Rb, Rb])  # (4, 3, 3)
    ts = jnp.stack([tu, -tu, tu, -tu])  # (4, 3)
    pts, z1, z2 = jax.vmap(midpoint_triangulate, in_axes=(0, 0, None, None))(
        Rs, ts, x1, x2
    )  # (4, N, 3), (4, N), (4, N)
    front = (z1 > 1e-6) & (z2 > 1e-6) & mask[None, :]
    votes = jnp.sum(front, axis=1)  # (4,)
    k = jnp.argmax(votes)
    return RecoveredPose(
        R=Rs[k], t=ts[k], points=pts[k], in_front=front[k], n_good=votes[k]
    )


def monocular_triangulate(
    key: jax.Array,
    cam: Pinhole,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    thresh_px: float | jnp.ndarray = 1.0,
    iters: int = 256,
) -> tuple[EssentialResult, RecoveredPose]:
    """Full C18 monocular flow: E-RANSAC -> recoverPose -> midpoint points.

    Mirrors ``monocularTriangulate`` (``/root/reference/src/StereoCV.cpp:
    123-189``): estimate E from two monocular views of the SAME camera,
    recover the up-to-scale relative pose, and triangulate the inliers.
    """
    er = essential_ransac(key, cam, pts1, pts2, mask, thresh_px, iters)
    rp = recover_pose(er.E, cam, pts1, pts2, er.inliers)
    return er, rp
