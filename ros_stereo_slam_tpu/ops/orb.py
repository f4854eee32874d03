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
    pts: jnp.ndarray  # (N, 2) xy — ALWAYS level-0 (full-res) coordinates
    angle: jnp.ndarray  # (N,) radians
    desc_bits: jnp.ndarray  # (N, 8) uint32 packed
    desc_sign: jnp.ndarray  # (N, 256) float32 in {-1, +1}
    valid: jnp.ndarray  # (N,) bool
    octave: jnp.ndarray  # (N,) i32 pyramid level the feature was detected at


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


def _level_features(
    img: jnp.ndarray, budget: int, fast_thresh, backend: str
):
    """Detection + description on ONE pyramid level (level coordinates).

    Returns (pts, angle, packed bits, sign, valid) with `budget` rows.
    """
    h, w = img.shape
    score = fast.fast_score(img, fast_thresh)
    cand_pts, cand_scores, cand_mask = fast.top_corners(score, 4 * budget)
    pts, valid = anms.anms(cand_pts, cand_scores, cand_mask, budget)
    margin = PATCH // 2 + 2
    valid = valid & interp.in_bounds(pts, h, w, margin)

    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from ros_stereo_slam_tpu.ops import orb_pallas

        # auto entry: routes to the grid=(B,) batched kernel under vmap
        sign_k, m = orb_pallas.orb_descriptors_auto(img, pts)
        angle = jnp.arctan2(m[:, 1], m[:, 0])
        bits = sign_k > 0.0
        sign = sign_k * valid[:, None]
        return pts, angle, pack_bits(bits & valid[:, None]), sign, valid

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
    return pts, angle, pack_bits(bits & valid[:, None]), sign, valid


def _level_budgets(n_features: int, n_levels: int, s: float) -> list[int]:
    """Per-level feature budgets summing to n_features, decaying by the
    scale factor per level (cv::ORB distributes points by the same
    geometric series)."""
    if n_features < 8 * n_levels:
        raise ValueError(
            f"n_features={n_features} cannot fund {n_levels} pyramid "
            f"levels at >=8 features each; lower n_levels or raise "
            f"n_features"
        )
    w = [s**-l for l in range(n_levels)]
    tot = sum(w)
    b = [max(int(round(n_features * x / tot)), 8) for x in w]
    # Rebalance rounding/clamp drift into level 0, then (if the clamps
    # pushed the sum high enough that level 0 would fall under 8) shed
    # the remainder from the other levels, largest first, floor 8 —
    # feasible because n_features >= 8 * n_levels.
    b[0] += n_features - sum(b)
    if b[0] < 8:
        need = 8 - b[0]
        b[0] = 8
        for j in sorted(range(1, n_levels), key=lambda j: -b[j]):
            take = min(need, b[j] - 8)
            b[j] -= take
            need -= take
        assert need == 0, (n_features, n_levels, b)
    return b


def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear-resample matrix (pixel-center convention).

    Resizing as two constant matmuls keeps the ORB pyramid on the MXU —
    the same trick as ops/pyramid._down_matrix (XLA's gather-based resize
    lowers to serial TPU gathers)."""
    M = np.zeros((n_out, n_in), np.float32)
    ratio = n_in / n_out
    x = (np.arange(n_out) + 0.5) * ratio - 0.5
    x0 = np.clip(np.floor(x).astype(np.int64), 0, n_in - 1)
    x1 = np.minimum(x0 + 1, n_in - 1)
    t = np.clip(x - x0, 0.0, 1.0).astype(np.float32)
    M[np.arange(n_out), x0] += 1.0 - t
    M[np.arange(n_out), x1] += t
    return M


@partial(jax.jit, static_argnames=("n_features", "backend", "n_levels",
                                   "scale_factor"))
def detect_and_compute(
    img: jnp.ndarray,
    n_features: int = 512,
    fast_thresh: float | jnp.ndarray = 12.0 / 255.0,
    backend: str = "auto",
    n_levels: int = 1,
    scale_factor: float = 1.25,
) -> OrbFeatures:
    """ORB on a [0,1] grayscale image, optionally multi-scale.

    `n_levels` > 1 detects over an image pyramid with per-level downscale
    `scale_factor` (the reference's ``cv::ORB::create()`` is pyramidal —
    8 levels at factor 1.2 by OpenCV default,
    ``/root/reference/src/optimizationStuff.cpp:50``).  The factor stays
    deliberately small: binary descriptors tolerate only ~±25% scale
    mismatch, so dyadic octaves leave a 0.5-octave dead zone exactly
    where distance-changed revisits land (e.g. 1.5x).  Levels are
    produced by bilinear resize expressed as two constant matmuls (MXU
    work, no TPU gathers).  Points are reported in level-0 coordinates
    with the detection level recorded per feature; descriptors are
    computed on the level image, which scales the BRIEF pattern
    implicitly.

    `backend`: "auto" uses the Pallas descriptor kernel on TPU (the jnp
    path's ~620k bilinear samples lower to near-scalar XLA gathers there,
    ~25 ms/frame); "jnp" forces the reference path (CPU / test oracle).
    """
    if n_levels <= 1:
        pts, angle, bits, sign, valid = _level_features(
            img, n_features, fast_thresh, backend
        )
        return OrbFeatures(
            pts=pts, angle=angle, desc_bits=bits, desc_sign=sign,
            valid=valid, octave=jnp.zeros((n_features,), jnp.int32),
        )

    h, w = img.shape
    budgets = _level_budgets(n_features, n_levels, scale_factor)
    parts = []
    for l, budget in enumerate(budgets):
        s = scale_factor**l
        if l == 0:
            lvl_img = img
        else:
            hl, wl = max(int(round(h / s)), 32), max(int(round(w / s)), 32)
            My = jnp.asarray(_resize_matrix(h, hl))
            Mx = jnp.asarray(_resize_matrix(w, wl))
            lvl_img = My @ img @ Mx.T
        pts, angle, bits, sign, valid = _level_features(
            lvl_img, budget, fast_thresh, backend
        )
        # pixel-center mapping back to level 0: x0 = (x_l + 0.5)*s - 0.5
        sy = jnp.float32(h / lvl_img.shape[0])
        sx = jnp.float32(w / lvl_img.shape[1])
        pts0 = jnp.stack(
            [(pts[:, 0] + 0.5) * sx - 0.5, (pts[:, 1] + 0.5) * sy - 0.5],
            axis=1,
        )
        parts.append((
            pts0, angle, bits, sign, valid,
            jnp.full((budget,), l, jnp.int32),
        ))
    return OrbFeatures(
        pts=jnp.concatenate([p[0] for p in parts]),
        angle=jnp.concatenate([p[1] for p in parts]),
        desc_bits=jnp.concatenate([p[2] for p in parts]),
        desc_sign=jnp.concatenate([p[3] for p in parts]),
        valid=jnp.concatenate([p[4] for p in parts]),
        octave=jnp.concatenate([p[5] for p in parts]),
    )


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) bool (inverse of :func:`pack_bits`)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return b.reshape(packed.shape[0], N_BITS).astype(bool)


def sign_of_packed(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) {-1, +1} float (for MXU scoring)."""
    return jnp.where(unpack_bits(packed), 1.0, -1.0).astype(jnp.float32)
