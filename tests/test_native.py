"""Native host-runtime component tests (graph BFS, notify queue, PLY,
remap) — run against the compiled library when present and the Python
fallbacks otherwise."""

import os
import threading
import time

import numpy as np
import pytest

from lsd_slam_tpu.utils import native


def test_bfs_hops_chain_and_branch():
    # 0-1-2-3 chain plus 1-4
    efrom = np.array([0, 1, 2, 1], np.int32)
    eto = np.array([1, 2, 3, 4], np.int32)
    d = native.bfs_hops(6, efrom, eto, 0)
    assert d.tolist() == [0, 1, 2, 3, 2, -1]


def test_notify_queue_basic():
    q = native.NotifyQueue(capacity=2)
    assert q.push("a") and q.push("b")
    assert not q.push("c")  # drop-on-full (NotifyBuffer.h:94-110)
    assert q.dropped == 1
    assert q.pop(0.1) == "a"
    assert q.pop(0.1) == "b"
    assert q.pop(0.05) is None


def test_notify_queue_cross_thread():
    q = native.NotifyQueue(capacity=8)
    got = []

    def consumer():
        while True:
            item = q.pop(2.0)
            if item == "stop":
                break
            got.append(item)

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(5):
        q.push(i)
        time.sleep(0.005)
    q.push("stop")
    t.join(3.0)
    assert got == [0, 1, 2, 3, 4]


def test_write_ply_binary(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
    rgb = np.random.default_rng(1).integers(0, 255, (1000, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    native.write_ply_binary(path, xyz, rgb)
    raw = open(path, "rb").read()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    assert b"element vertex 1000" in raw[:header_end]
    body = raw[header_end:]
    assert len(body) == 1000 * 15
    # first record round-trips
    x = np.frombuffer(body[:12], np.float32)
    np.testing.assert_allclose(x, xyz[0])
    assert body[12:15] == rgb[0].tobytes()


def test_remap_bilinear_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (40, 60)).astype(np.float32)
    gx, gy = np.meshgrid(np.linspace(1, 58, 30), np.linspace(1, 38, 20))
    rx = (gx + 0.3).astype(np.float32)
    ry = (gy + 0.6).astype(np.float32)
    out = native.remap_bilinear_cpu(img, rx, ry)
    # spot-check against direct bilinear
    for yy in (0, 7, 19):
        for xx in (0, 13, 29):
            fx, fy = rx[yy, xx], ry[yy, xx]
            x0, y0 = int(fx), int(fy)
            wx, wy = fx - x0, fy - y0
            expect = (img[y0, x0] * (1 - wx) * (1 - wy)
                      + img[y0, x0 + 1] * wx * (1 - wy)
                      + img[y0 + 1, x0] * (1 - wx) * wy
                      + img[y0 + 1, x0 + 1] * wx * wy)
            np.testing.assert_allclose(out[yy, xx], expect, rtol=1e-5)


def test_native_library_is_loaded():
    """The compiled library should be present in the repo build."""
    assert native.have_native(), "liblsd_host.so missing — build native/"
