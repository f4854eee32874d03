"""Offline HTML map viewer (viz/web.py, reference C16 equivalent)."""

import base64
import re

import numpy as np

from ros_stereo_slam_tpu.viz import web


def test_export_html_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pts[7] = np.nan  # non-finite points must be dropped
    cols = rng.uniform(0, 1, (500, 3))
    poses = np.tile(np.eye(4, dtype=np.float32), (20, 1, 1))
    poses[:, 2, 3] = np.arange(20)
    path = tmp_path / "map.html"
    n = web.export_html(str(path), poses, pts, cols, keyframe_idx=[0, 5, 10])
    assert n == 499
    html = path.read_text()
    assert "<canvas" in html and "__DATA__" not in html
    m = re.search(r'"pts": "([A-Za-z0-9+/=]+)"', html)
    dec = np.frombuffer(base64.b64decode(m.group(1)), np.float32).reshape(-1, 3)
    assert dec.shape[0] == 499
    assert np.isfinite(dec).all()
    m = re.search(r'"nTraj": (\d+)', html)
    assert int(m.group(1)) == 20


def test_export_html_subsamples_and_defaults(tmp_path):
    pts = np.zeros((web._MAX_POINTS + 1000, 3), np.float32)
    poses = np.eye(4, dtype=np.float32)[None]
    path = tmp_path / "m.html"
    n = web.export_html(str(path), poses, pts)  # no colors, no keyframes
    assert n == web._MAX_POINTS
    assert path.stat().st_size > 1000
