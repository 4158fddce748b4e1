"""ctypes bindings for the native host runtime (native/lsd_host.cpp).

Provides graph BFS, the bounded notify-queue, binary PLY export and CPU
undistortion remap. Every entry point has a pure-Python fallback so the
package works without the compiled library (build: cmake+ninja in native/).
"""

from __future__ import annotations

import ctypes
import os
import threading
from collections import deque
from typing import Optional

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "_native", "liblsd_host.so")
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    lib.lsd_bfs_hops.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int, np.ctypeslib.ndpointer(np.int32)]
    lib.lsd_queue_create.restype = ctypes.c_void_p
    lib.lsd_queue_create.argtypes = [ctypes.c_int]
    lib.lsd_queue_destroy.argtypes = [ctypes.c_void_p]
    lib.lsd_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.lsd_queue_pop.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_uint64)]
    lib.lsd_queue_size.argtypes = [ctypes.c_void_p]
    lib.lsd_queue_dropped.argtypes = [ctypes.c_void_p]
    lib.lsd_queue_dropped.restype = ctypes.c_uint64
    lib.lsd_write_ply.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    lib.lsd_write_ply.restype = ctypes.c_int
    lib.lsd_remap_bilinear.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return lib


def have_native() -> bool:
    return bool(_load())


def bfs_hops(n_nodes: int, efrom: np.ndarray, eto: np.ndarray,
             start: int) -> np.ndarray:
    """Hop distances from start; -1 unreachable."""
    lib = _load()
    efrom = np.ascontiguousarray(efrom, np.int32)
    eto = np.ascontiguousarray(eto, np.int32)
    if lib:
        out = np.empty(n_nodes, np.int32)
        lib.lsd_bfs_hops(n_nodes, len(efrom), efrom, eto, start, out)
        return out
    # fallback
    adj = [[] for _ in range(n_nodes)]
    for a, b in zip(efrom.tolist(), eto.tolist()):
        adj[a].append(b)
        adj[b].append(a)
    dist = np.full(n_nodes, -1, np.int32)
    dist[start] = 0
    dq = deque([start])
    while dq:
        v = dq.popleft()
        for n in adj[v]:
            if dist[n] < 0:
                dist[n] = dist[v] + 1
                dq.append(n)
    return dist


class NotifyQueue:
    """Bounded drop-on-full queue of Python objects with blocking pop
    (== NotifyBuffer<T>, IOWrapper/NotifyBuffer.h). Objects are held in a
    Python-side table; the native queue carries their handles."""

    def __init__(self, capacity: int = 8):
        lib = _load()
        self._lib = lib if lib else None
        self._capacity = capacity
        if self._lib:
            self._h = lib.lsd_queue_create(capacity)
            self._table = {}
            self._next = 1
            self._tlock = threading.Lock()
        else:
            self._dq = deque()
            self._cv = threading.Condition()
            self._dropped = 0

    def push(self, item) -> bool:
        if self._lib:
            with self._tlock:
                hid = self._next
                self._next += 1
                self._table[hid] = item
            if self._lib.lsd_queue_push(self._h, hid):
                return True
            with self._tlock:
                del self._table[hid]
            return False
        with self._cv:
            if len(self._dq) >= self._capacity:
                self._dropped += 1
                return False
            self._dq.append(item)
            self._cv.notify()
            return True

    def pop(self, timeout: float = 1.0):
        if self._lib:
            out = ctypes.c_uint64()
            if self._lib.lsd_queue_pop(self._h, int(timeout * 1000),
                                       ctypes.byref(out)):
                with self._tlock:
                    return self._table.pop(out.value)
            return None
        with self._cv:
            if not self._dq:
                self._cv.wait(timeout)
            if self._dq:
                return self._dq.popleft()
            return None

    def size(self) -> int:
        if self._lib:
            return self._lib.lsd_queue_size(self._h)
        with self._cv:
            return len(self._dq)

    @property
    def dropped(self) -> int:
        if self._lib:
            return int(self._lib.lsd_queue_dropped(self._h))
        return self._dropped

    def __del__(self):
        if getattr(self, "_lib", None) and getattr(self, "_h", None):
            self._lib.lsd_queue_destroy(self._h)


def write_ply_binary(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Fast binary PLY (native) or numpy-structured fallback."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    lib = _load()
    if lib:
        rc = lib.lsd_write_ply(path.encode(), len(xyz), xyz, rgb)
        if rc != 0:
            raise IOError(f"lsd_write_ply failed: {rc}")
        return
    with open(path, "wb") as f:
        f.write((f"ply\nformat binary_little_endian 1.0\n"
                 f"element vertex {len(xyz)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "property uchar red\nproperty uchar green\n"
                 "property uchar blue\nend_header\n").encode())
        rec = np.zeros(len(xyz), dtype=[("xyz", np.float32, 3),
                                        ("rgb", np.uint8, 3)])
        rec["xyz"] = xyz
        rec["rgb"] = rgb
        f.write(rec.tobytes())


def remap_bilinear_cpu(img: np.ndarray, rx: np.ndarray,
                       ry: np.ndarray) -> np.ndarray:
    """CPU undistortion remap (negative map coords -> 0)."""
    img = np.ascontiguousarray(img, np.float32)
    rx = np.ascontiguousarray(rx, np.float32)
    ry = np.ascontiguousarray(ry, np.float32)
    lib = _load()
    if lib:
        out = np.empty_like(rx)
        lib.lsd_remap_bilinear(img, img.shape[0], img.shape[1], rx, ry, out,
                               rx.shape[0], rx.shape[1])
        return out
    h, w = img.shape
    x0 = np.clip(np.floor(rx).astype(np.int32), 0, w - 2)
    y0 = np.clip(np.floor(ry).astype(np.int32), 0, h - 2)
    wx = rx - x0
    wy = ry - y0
    v = (img[y0, x0] * (1 - wx) * (1 - wy) + img[y0, x0 + 1] * wx * (1 - wy)
         + img[y0 + 1, x0] * (1 - wx) * wy + img[y0 + 1, x0 + 1] * wx * wy)
    return np.where((rx < 0) | (ry < 0), 0.0, v).astype(np.float32)
