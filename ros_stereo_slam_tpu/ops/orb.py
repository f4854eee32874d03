"""Oriented-BRIEF (ORB) keypoints + binary descriptors, batched.

TPU-native replacement for ``cv::ORB::detectAndCompute`` as used by the
loop-closure driver (``/root/reference/src/optimizationStuff.cpp:50-55``)
and the vocabulary builder (``src/bagOfWordsDetector.cpp:25-45``):

- FAST-9 corner response computed densely (:mod:`..ops.fast`), ANMS for
  spatial spread (:mod:`..ops.anms`);
- orientation by the intensity-centroid moment over a circular patch
  (the ORB paper's method), from vectorized patch samples;
- rotated-BRIEF bits from a FIXED PRNG-generated Gaussian pair pattern
  (sigma = patch/5, the original BRIEF construction).  The pattern is
  our own — the reference's prebuilt DBoW2 vocabularies are absent from
  its repo (``.MISSING_LARGE_BLOBS``), so vocabulary + descriptors are
  self-consistent within this framework and no OpenCV bit-pattern
  compatibility is required.

Descriptors are produced in two forms:
- packed bits (N, 8) uint32 — compact storage, exact Hamming via XOR +
  population_count;
- sign floats (N, 256) {-1, +1} — Hamming distances between big sets as
  a single MXU matmul: ham(a, b) = (256 - a.b) / 2.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ros_stereo_slam_tpu.ops import anms, fast, interp

N_BITS = 256
PATCH = 31  # descriptor patch diameter
_PATTERN_SEED = 20260817


def _brief_pattern() -> tuple[np.ndarray, np.ndarray]:
    """(256, 2) + (256, 2) sampling offsets, Gaussian sigma = PATCH/5."""
    rng = np.random.default_rng(_PATTERN_SEED)
    sigma = PATCH / 5.0
    lim = PATCH // 2 - 1
    p = np.clip(rng.normal(0, sigma, (N_BITS, 2)), -lim, lim)
    q = np.clip(rng.normal(0, sigma, (N_BITS, 2)), -lim, lim)
    return p.astype(np.float32), q.astype(np.float32)


_PAT_P, _PAT_Q = _brief_pattern()

# Circular-patch offsets for the intensity centroid (radius 15).
def _centroid_offsets() -> np.ndarray:
    r = PATCH // 2
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    keep = ys**2 + xs**2 <= r**2
    return np.stack([xs[keep], ys[keep]], axis=1).astype(np.float32)  # (M, 2)


_CENT = _centroid_offsets()


class OrbFeatures(NamedTuple):
    pts: jnp.ndarray  # (N, 2) xy
    angle: jnp.ndarray  # (N,) radians
    desc_bits: jnp.ndarray  # (N, 8) uint32 packed
    desc_sign: jnp.ndarray  # (N, 256) float32 in {-1, +1}
    valid: jnp.ndarray  # (N,) bool


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) bool -> (N, 8) uint32."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=2)


def hamming_packed(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact Hamming distances between (N, 8) and (M, 8) packed sets."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_mxu(sa: jnp.ndarray, sb: jnp.ndarray) -> jnp.ndarray:
    """Hamming via sign-vector matmul: (N, 256) x (M, 256) -> (N, M)."""
    dot = sa @ sb.T
    return (N_BITS - dot) * 0.5


@partial(jax.jit, static_argnames=("n_features", "backend"))
def detect_and_compute(
    img: jnp.ndarray,
    n_features: int = 512,
    fast_thresh: float | jnp.ndarray = 12.0 / 255.0,
    backend: str = "auto",
) -> OrbFeatures:
    """Single-scale ORB on a [0,1] grayscale image.

    `backend`: "auto" uses the Pallas descriptor kernel on TPU (the jnp
    path's ~620k bilinear samples lower to near-scalar XLA gathers there,
    ~25 ms/frame); "jnp" forces the reference path (CPU / test oracle).
    """
    h, w = img.shape
    score = fast.fast_score(img, fast_thresh)
    cand_pts, cand_scores, cand_mask = fast.top_corners(score, 4 * n_features)
    pts, valid = anms.anms(cand_pts, cand_scores, cand_mask, n_features)
    margin = PATCH // 2 + 2
    valid = valid & interp.in_bounds(pts, h, w, margin)

    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from ros_stereo_slam_tpu.ops import orb_pallas

        sign_k, m = orb_pallas.orb_descriptors(img, pts)
        angle = jnp.arctan2(m[:, 1], m[:, 0])
        bits = sign_k > 0.0
        sign = sign_k * valid[:, None]
        return OrbFeatures(
            pts=pts,
            angle=angle,
            desc_bits=pack_bits(bits & valid[:, None]),
            desc_sign=sign,
            valid=valid,
        )

    # Orientation: intensity centroid over the circular patch.
    cent = jnp.asarray(_CENT)  # (M, 2)
    sample_pts = pts[:, None, :] + cent[None, :, :]  # (N, M, 2)
    flat = sample_pts.reshape(-1, 2)
    vals = interp.bilinear_at(img, flat).reshape(pts.shape[0], -1)  # (N, M)
    m10 = jnp.sum(vals * cent[None, :, 0], axis=1)
    m01 = jnp.sum(vals * cent[None, :, 1], axis=1)
    angle = jnp.arctan2(m01, m10)

    # Rotated BRIEF pairs.
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    rot = jnp.stack([jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], -2)  # (N,2,2)
    pat_p = jnp.asarray(_PAT_P)  # (256, 2)
    pat_q = jnp.asarray(_PAT_Q)
    rp = jnp.einsum("nij,bj->nbi", rot, pat_p) + pts[:, None, :]  # (N, 256, 2)
    rq = jnp.einsum("nij,bj->nbi", rot, pat_q) + pts[:, None, :]
    vp = interp.bilinear_at(img, rp.reshape(-1, 2)).reshape(pts.shape[0], N_BITS)
    vq = interp.bilinear_at(img, rq.reshape(-1, 2)).reshape(pts.shape[0], N_BITS)
    bits = vp < vq  # (N, 256) bool
    sign = jnp.where(bits, 1.0, -1.0).astype(jnp.float32)
    sign = sign * valid[:, None]  # invalid rows -> zero vectors
    return OrbFeatures(
        pts=pts,
        angle=angle,
        desc_bits=pack_bits(bits & valid[:, None]),
        desc_sign=sign,
        valid=valid,
    )


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) bool (inverse of :func:`pack_bits`)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return b.reshape(packed.shape[0], N_BITS).astype(bool)


def sign_of_packed(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) {-1, +1} float (for MXU scoring)."""
    return jnp.where(unpack_bits(packed), 1.0, -1.0).astype(jnp.float32)
