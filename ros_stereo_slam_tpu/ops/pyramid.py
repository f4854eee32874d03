"""Image pyramids as static-shape jnp ops.

The reference relies on OpenCV's internal pyramid construction inside
``calcOpticalFlowPyrLK`` (``/root/reference/src/tracking.cpp:18,52``).
Here levels are explicit arrays: a 5-tap binomial blur followed by 2x
decimation, expressed as separable convolutions XLA fuses and vectorizes
on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# 5-tap binomial kernel (1, 4, 6, 4, 1) / 16 — OpenCV pyrDown's kernel.
_K5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], dtype=jnp.float32) / 16.0


def _sep_blur(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5x5 binomial blur with edge replication."""
    pad = 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    x = lax.conv_general_dilated(
        x[None, None, :, :],
        _K5[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = lax.conv_general_dilated(
        x[None, None, :, :],
        _K5[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Blur + 2x decimate (floor semantics on odd sizes)."""
    return _sep_blur(img)[::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Return [img, down1, down2, ...] with `levels` entries."""
    out = [img]
    for _ in range(levels - 1):
        out.append(pyr_down(out[-1]))
    return out


def scharr_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) via the 3x3 Scharr operator (OpenCV LK's derivative filter).

    Separable: smooth = (3, 10, 3)/32, diff = (-1, 0, 1)/2.
    """
    smooth = jnp.asarray([3.0, 10.0, 3.0], dtype=jnp.float32) / 16.0
    diff = jnp.asarray([-1.0, 0.0, 1.0], dtype=jnp.float32) * 0.5

    def conv1d(x, k, axis):
        x = jnp.pad(x, ((1, 1), (0, 0)) if axis == 0 else ((0, 0), (1, 1)), mode="edge")
        kern = k[None, None, :, None] if axis == 0 else k[None, None, None, :]
        return lax.conv_general_dilated(
            x[None, None, :, :], kern, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    ix = conv1d(conv1d(img, diff, axis=1), smooth, axis=0)
    iy = conv1d(conv1d(img, diff, axis=0), smooth, axis=1)
    return ix, iy
