"""Native C++ prefetching loader tests (skipped if no toolchain)."""

import os

import numpy as np
import pytest

from ros_stereo_slam_tpu.data.loader import PrefetchLoader, native_available

try:
    from PIL import Image

    HAVE_PIL = True
except ImportError:  # pragma: no cover
    HAVE_PIL = False

pytestmark = pytest.mark.skipif(
    not (native_available() and HAVE_PIL),
    reason="native loader or PIL unavailable",
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    arrays = []
    for i in range(6):
        arr = (rng.random((64, 96)) * 255).astype(np.uint8)
        p = str(d / f"f{i:03d}.png")
        Image.fromarray(arr, mode="L").save(p)
        paths.append(p)
        arrays.append(arr.astype(np.float32) / 255.0)
    return paths, arrays


def test_native_decode_matches_pil(png_dir):
    paths, arrays = png_dir
    ld = PrefetchLoader(paths, 96, 64, n_threads=2, lookahead=3)
    for i in (0, 3, 5):
        np.testing.assert_allclose(ld.get(i), arrays[i], atol=1e-6)
    ld.close()


def test_native_random_access(png_dir):
    paths, arrays = png_dir
    ld = PrefetchLoader(paths, 96, 64, n_threads=2, lookahead=2)
    for i in (4, 1, 5, 0, 2):
        np.testing.assert_allclose(ld.get(i), arrays[i], atol=1e-6)
    ld.close()


def test_native_missing_file():
    ld = PrefetchLoader(["/nonexistent/x.png"], 96, 64)
    with pytest.raises(IOError):
        ld.get(0)
    ld.close()


def test_native_rgb_png(tmp_path):
    rng = np.random.default_rng(1)
    rgb = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb, mode="RGB").save(p)
    ld = PrefetchLoader([p], 48, 32)
    got = ld.get(0)
    luma = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]) / 255.0
    np.testing.assert_allclose(got, luma, atol=2e-3)
    ld.close()
