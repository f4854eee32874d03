"""Image pyramids as static-shape jnp ops.

The reference relies on OpenCV's internal pyramid construction inside
``calcOpticalFlowPyrLK`` (``/root/reference/src/tracking.cpp:18,52``).
Here levels are explicit arrays: a 5-tap binomial blur followed by 2x
decimation.

Implementation note: separable filters are written as explicit
shift-and-add (pad + static slices), NOT ``lax.conv`` — XLA's TPU conv
path takes minutes to compile for odd-sized single-channel images
(measured 148s for a 1241x376 frame), while shifted adds compile in
milliseconds and fuse into a handful of VPU ops.
"""

from __future__ import annotations

import jax.numpy as jnp

# 5-tap binomial kernel (1, 4, 6, 4, 1) / 16 — OpenCV pyrDown's kernel.
_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _filter1d(img: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """Apply a symmetric odd-length FIR along `axis` with edge replication."""
    r = len(taps) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="edge")
    n = img.shape[axis]
    out = None
    for i, w in enumerate(taps):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + n)
        term = w * x[tuple(sl)]
        out = term if out is None else out + term
    return out


def _sep_blur(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5x5 binomial blur with edge replication."""
    return _filter1d(_filter1d(img, _K5, 0), _K5, 1)


def _down_matrix(n_in: int, n_out: int, dtype) -> jnp.ndarray:
    """(n_out, n_in) matrix fusing the 5-tap blur with 2x decimation.

    Row i holds the binomial taps at clip(2i + k - 2) — identical math to
    edge-pad + filter + ``[::2]``, but as a constant-folded matmul: the
    minor-dim stride-2 slice lowers to a serial TPU gather (~1.1 ms for a
    KITTI frame), while these two matmuls are ~20 us of MXU work.
    """
    rows = jnp.arange(n_out)
    cols = jnp.arange(n_in)
    M = jnp.zeros((n_out, n_in), dtype)
    for k, w in enumerate(_K5):
        src = jnp.clip(2 * rows + k - 2, 0, n_in - 1)
        M = M + w * (cols[None, :] == src[:, None]).astype(dtype)
    return M


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Blur + 2x decimate (floor semantics on odd sizes)."""
    H, W = img.shape
    A = _down_matrix(H, (H + 1) // 2, img.dtype)  # rows: blur + decimate
    B = _down_matrix(W, (W + 1) // 2, img.dtype)  # cols: blur + decimate
    return A @ img @ B.T


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Return [img, down1, down2, ...] with `levels` entries."""
    out = [img]
    for _ in range(levels - 1):
        out.append(pyr_down(out[-1]))
    return out


def scharr_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) via the 3x3 Scharr operator (OpenCV LK's derivative filter).

    Separable: smooth = (3, 10, 3)/16, diff = (-1, 0, 1)/2.
    """
    smooth = (3.0 / 16.0, 10.0 / 16.0, 3.0 / 16.0)
    diff = (-0.5, 0.0, 0.5)
    ix = _filter1d(_filter1d(img, diff, 1), smooth, 0)
    iy = _filter1d(_filter1d(img, diff, 0), smooth, 1)
    return ix, iy
