"""Small batched linear-algebra primitives tuned for TPU.

XLA's LAPACK-style SVD of many tiny matrices is serial and slow on TPU
(measured 3.4 ms for 256 x (8, 9), 5.7 ms for 256 x (12, 12) on v5e).
RANSAC minimal solvers only need the SMALLEST singular vector, which
shifted inverse iteration on the normal matrix delivers in a few batched
Cholesky solves (0.2-0.8 ms for the same shapes) — the convergence ratio
(sigma + lambda_min) / (sigma + lambda_next) is tiny for near-singular
systems, so 4 iterations are ample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_small(B: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of (..., n, n) SPD matrices, fully unrolled.

    XLA's ``Cholesky`` custom call is a serial LAPACK-style routine
    (~0.25-0.6 ms for 256 x 9..12 on v5e); for the tiny static n used
    here the unrolled update is a few hundred fused elementwise VPU ops.
    """
    n = B.shape[-1]
    col = [[None] * n for _ in range(n)]
    for j in range(n):
        d = B[..., j, j] - sum(col[j][k] * col[j][k] for k in range(j))
        dj = jnp.sqrt(jnp.maximum(d, 1e-30))
        col[j][j] = dj
        inv = 1.0 / dj
        for i in range(j + 1, n):
            s = B[..., i, j] - sum(col[i][k] * col[j][k] for k in range(j))
            col[i][j] = s * inv
    rows = [
        jnp.stack([col[i][j] if j <= i else jnp.zeros_like(col[i][i])
                   for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def chol_solve_small(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b with unrolled forward/back substitution.

    L: (..., n, n) lower-triangular; b: (..., n).
    """
    n = L.shape[-1]
    y = []
    for i in range(n):
        s = b[..., i] - sum(L[..., i, k] * y[k] for k in range(i))
        y.append(s / L[..., i, i])
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i] - sum(L[..., k, i] * x[k] for k in range(i + 1, n))
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def spd_solve(B: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve via the unrolled Cholesky (small static n)."""
    return chol_solve_small(cholesky_small(B), b)


def null_vector(A: jnp.ndarray, iters: int = 4) -> jnp.ndarray:
    """Smallest right singular vector of each (..., m, n) matrix (m >= n-1).

    Inverse iteration on A^T A with a tiny relative shift; unit-norm
    output.  Accurate for the near-singular systems RANSAC builds; for
    well-conditioned matrices it still returns the smallest-eigenvalue
    direction (just with fewer correct digits — irrelevant for hypothesis
    scoring, which re-evaluates residuals exactly).
    """
    AtA = jnp.einsum("...ij,...il->...jl", A, A)
    n = A.shape[-1]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    B = AtA + (1e-7 / n) * tr * jnp.eye(n, dtype=A.dtype)
    L = cholesky_small(B)
    x = jnp.ones(A.shape[:-2] + (n,), A.dtype)
    for _ in range(iters):
        x = chol_solve_small(L, x)
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30
        )
    return x


def det3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of (..., 3, 3) — no LU custom call."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv3x3(M: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Adjugate inverse of (..., 3, 3): fused elementwise ops only.

    Replaces the batched-LU ``jnp.linalg.inv`` path (a serial LAPACK-style
    custom call on TPU) for the per-landmark Schur blocks.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def spd_inverse_small(B: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., n, n) SPD matrices via the unrolled Cholesky.

    inv(B) = L^-T L^-1 with L^-1 from unrolled forward substitution
    against the identity.  For the tiny static n used here (6 for pose
    blocks) this is a few hundred fused VPU ops per matrix — no LAPACK
    custom call.
    """
    L = cholesky_small(B)
    n = B.shape[-1]
    # columns j of L^-1: solve L x = e_j (x[i] = 0 for i < j)
    zero = jnp.zeros_like(L[..., 0, 0])
    one = jnp.ones_like(zero)
    cols = []
    for j in range(n):
        x = [zero] * n
        for i in range(j, n):
            s = (one if i == j else zero) - sum(
                L[..., i, k] * x[k] for k in range(j, i)
            )
            x[i] = s / L[..., i, i]
        cols.append(jnp.stack(x, axis=-1))  # row index i
    Linv = jnp.stack(cols, axis=-1)  # (..., n(i), n(j)) = L^-1
    return jnp.einsum("...ki,...kj->...ij", Linv, Linv)  # L^-T L^-1


def eigh3x3(S: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic eigendecomposition of batched symmetric (..., 3, 3).

    Returns (eigvals ascending (..., 3), eigvecs (..., 3, 3) with
    ``eigvecs[..., :, i]`` the i-th eigenvector).  Replaces the serial
    EighTpu/QDWH custom-call path (trigonometric eigenvalues + the
    (S - l_j I)(S - l_k I) column-product eigenvectors, Eberly's method)
    with pure fused elementwise ops.  Inputs here are Gram matrices of
    noisy RANSAC estimates, so exact degeneracy is measure-zero; the
    max-norm column pick keeps near-degenerate cases finite.
    """
    dt = S.dtype
    q = jnp.trace(S, axis1=-2, axis2=-1) / 3.0
    A = S - q[..., None, None] * jnp.eye(3, dtype=dt)
    p2 = jnp.sum(A * A, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # r = det(A/p) / 2 in [-1, 1]
    detA = det3x3(A)
    r = jnp.clip(detA / (2.0 * p * p * p + 1e-38), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = q + 2.0 * p * jnp.cos(phi)  # largest
    l1 = 3.0 * q - l0 - l2
    lam = jnp.stack([l0, l1, l2], axis=-1)  # ascending

    eye = jnp.eye(3, dtype=dt)

    def vec_for(li, lj, lk):
        # Columns of (S - lj I)(S - lk I) span the li eigenspace.
        P = (S - lj[..., None, None] * eye) @ (S - lk[..., None, None] * eye)
        norms = jnp.sum(P * P, axis=-2)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(P, best[..., None, None], axis=-1)[..., 0]
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
        )

    v0 = vec_for(l0, l1, l2)
    v2 = vec_for(l2, l0, l1)
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return lam, V
