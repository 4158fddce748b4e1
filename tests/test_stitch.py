"""Frame-stitching utility (== lsd_slam_viewer main_stitchVideos)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from lsd_slam_tpu.viewer.stitch import stitch_dirs, stitch_grid


def _write_frames(d, n, color):
    os.makedirs(d)
    for i in range(n):
        img = np.full((24, 32, 3), color, np.uint8)
        img[0, 0] = i  # frame marker
        Image.fromarray(img).save(os.path.join(d, f"{i:04d}.png"))


def test_stitch_grid_pads_and_tiles():
    a = np.full((10, 20, 3), 10, np.uint8)
    b = np.full((8, 16, 3), 20, np.uint8)
    g = stitch_grid([a, b, a], cols=2)
    assert g.shape == (20, 40, 3)
    assert g[0, 0, 0] == 10 and g[0, 20, 0] == 20
    assert g[10, 20:].max() == 0  # padded pane


def test_stitch_dirs_truncates_to_shortest(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    _write_frames(d1, 5, 100)
    _write_frames(d2, 3, 200)
    out = str(tmp_path / "out")
    n = stitch_dirs([d1, d2], out, labels=["run a", "run b"])
    assert n == 3
    files = sorted(os.listdir(out))
    assert files == ["00000.png", "00001.png", "00002.png"]
    img = np.asarray(Image.open(os.path.join(out, "00002.png")))
    assert img.shape == (24, 64, 3)
