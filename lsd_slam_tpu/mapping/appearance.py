"""Appearance-based loop-closure retrieval (the FabMap slot).

Replaces the gated openFabMap integration (src/GlobalMapping/FabMap.{h,cpp},
compiled only with HAVE_FABMAP; Star/SURF BoW scored against a pre-trained
Chow-Liu tree). TPU-native design instead of a feature-detector pipeline:

  * every keyframe gets a **tiled gradient descriptor**: a TxT tile grid of
    soft-binned gradient-orientation histograms plus normalized tile mean
    intensities, computed from one pyramid level with one bilinear gather
    and one scatter-add;
  * in-plane rotation invariance is **marginalized, not normalized**: the
    query image is described at R discrete rolls (the sampling grid rotated
    by theta, orientations shifted by theta — a single vmapped program),
    and retrieval takes the max over rolls of ONE (R,D)x(D,N) MXU matmul
    against the stacked canonical keyframe descriptors. A dominant-
    orientation normalization (the SIFT trick) fails on isotropic texture,
    where no stable dominant angle exists; marginalization does not care;
  * best-vs-second-best ratio acceptance is the analog of FabMap's p >= 0.8
    gate (FabMap.cpp:126-204).

Like the reference, this is optional (cfg.system.use_fabmap) and excludes
temporally-adjacent keyframes from matching.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

TILES = 4           # TxT tile grid
ORI_BINS = 8        # orientation histogram bins per tile
N_ROTATIONS = 16    # query roll marginalization steps (22.5 deg apart)


@functools.partial(jax.jit, static_argnames=("tiles", "ori_bins"))
def _descriptor_at(img, gx, gy, theta, tiles: int = TILES,
                   ori_bins: int = ORI_BINS):
    """Tiled descriptor of the image as seen under an in-plane roll of
    -theta: the tile grid samples along axes rotated by theta about the
    image center and gradient orientations are taken relative to theta.

    Returns a unit-norm vector of length tiles*tiles*(ori_bins+1)."""
    h, w = img.shape
    mag = jnp.sqrt(gx * gx + gy * gy)
    cos_a = jnp.where(mag > 1e-6, gx / jnp.maximum(mag, 1e-6), 1.0)
    sin_a = jnp.where(mag > 1e-6, gy / jnp.maximum(mag, 1e-6), 0.0)

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    c, s = jnp.cos(theta), jnp.sin(theta)
    xr = cx + c * (xs - cx) - s * (ys - cy)
    yr = cy + s * (xs - cx) + c * (ys - cy)
    inb = (xr >= 0) & (xr <= w - 1.001) & (yr >= 0) & (yr <= h - 1.001)
    # restrict to the inscribed disc so every rotation sees the same support
    rad2 = ((xs - cx) / min(cx, cy)) ** 2 + ((ys - cy) / min(cx, cy)) ** 2
    inb = inb & (rad2 <= 1.0)
    x0 = jnp.clip(xr.astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(yr.astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(xr - x0, 0.0, 1.0)
    fy = jnp.clip(yr - y0, 0.0, 1.0)

    def bilerp(a):
        a00 = a[y0, x0]
        a01 = a[y0, x0 + 1]
        a10 = a[y0 + 1, x0]
        a11 = a[y0 + 1, x0 + 1]
        return ((1 - fy) * ((1 - fx) * a00 + fx * a01)
                + fy * ((1 - fx) * a10 + fx * a11))

    m = inb.astype(jnp.float32)
    img_r = bilerp(img)
    mag_r = bilerp(mag) * m
    rel = jnp.arctan2(bilerp(sin_a), bilerp(cos_a)) - theta

    # soft-binned orientation histogram per tile, one scatter-add
    ty = jnp.clip((ys * tiles / h).astype(jnp.int32), 0, tiles - 1)
    tx = jnp.clip((xs * tiles / w).astype(jnp.int32), 0, tiles - 1)
    tile = ty * tiles + tx
    b = (rel / (2 * jnp.pi) * ori_bins) % ori_bins
    b0 = jnp.floor(b)
    fb = b - b0
    b0i = b0.astype(jnp.int32) % ori_bins
    b1i = (b0i + 1) % ori_bins
    n_tiles = tiles * tiles
    hist = jnp.zeros((n_tiles * ori_bins,), jnp.float32)
    hist = hist.at[(tile * ori_bins + b0i).reshape(-1)].add(
        (mag_r * (1 - fb)).reshape(-1))
    hist = hist.at[(tile * ori_bins + b1i).reshape(-1)].add(
        (mag_r * fb).reshape(-1))
    hist = hist.reshape(n_tiles, ori_bins)
    hist = hist / jnp.maximum(
        jnp.linalg.norm(hist, axis=1, keepdims=True), 1e-6)

    # normalized tile mean intensities (lighting-invariant layout cue)
    wsum = jnp.zeros((n_tiles,), jnp.float32).at[tile.reshape(-1)].add(
        m.reshape(-1))
    isum = jnp.zeros((n_tiles,), jnp.float32).at[tile.reshape(-1)].add(
        (img_r * m).reshape(-1))
    imean = isum / jnp.maximum(wsum, 1.0)
    imean = imean - jnp.mean(imean)
    imean = imean / jnp.maximum(jnp.linalg.norm(imean), 1e-6)

    d = jnp.concatenate([hist.reshape(-1) / jnp.sqrt(float(n_tiles)),
                         imean])
    return d / jnp.maximum(jnp.linalg.norm(d), 1e-6)


@jax.jit
def _descriptor_rotations(img, gx, gy, thetas):
    """(R, D) query descriptors, one per marginalized roll angle."""
    return jax.vmap(lambda t: _descriptor_at(img, gx, gy, t))(thetas)


@jax.jit
def _score_rotations(queries, descs):
    """Max-over-rolls cosine scores: (R,D)x(N,D) -> (N,)."""
    return jnp.max(jnp.einsum("rd,nd->rn", queries, descs, precision=_HI),
                   axis=0)


@jax.jit
def _append_row(mat, i, desc):
    """Device-side in-place-style append into the padded descriptor
    matrix — no host rebuild, no host->device retransfer of the store."""
    return mat.at[i].set(desc)


@jax.jit
def _query_scores(mat, img, gx, gy, thetas):
    """Fused query: R roll descriptors + ONE (R,D)x(D,N) matmul.
    One dispatch, one (N,) pull."""
    q = jax.vmap(lambda t: _descriptor_at(img, gx, gy, t))(thetas)
    return _score_rotations(q, mat)


class AppearanceIndex:
    """Keyframe descriptor store + rotation-marginalized matmul retrieval.

    Scale design (the reference runs up to ~1000 keyframes,
    README.md:313-314): the descriptor matrix lives ON DEVICE in a
    power-of-two-padded buffer; `add` is one jitted row-set (no O(N*D)
    rebuild), capacity growth is a rare pad-copy, and a query is one fused
    program + one (N,) host pull regardless of N. Temporal exclusion is by
    keyframe INSERTION index (not frame-id spacing, which guesses the
    keyframe cadence)."""

    def __init__(self, accept_score: float = 0.6, ratio: float = 1.08,
                 min_index_gap: int = 5, level: int = 2,
                 n_rotations: int = N_ROTATIONS, initial_capacity: int = 32):
        self.accept_score = accept_score
        self.ratio = ratio
        self.min_index_gap = min_index_gap
        self.level = level
        self._thetas = jnp.asarray(
            np.linspace(0.0, 2 * np.pi, n_rotations, endpoint=False),
            jnp.float32)
        self._ids: List[int] = []
        self._index_of = {}                    # kf_id -> insertion index
        self._capacity = initial_capacity
        self._mat: Optional[jnp.ndarray] = None  # (capacity, D) padded

    def __len__(self) -> int:
        return len(self._ids)

    def compute_descriptor(self, pyr) -> np.ndarray:
        l = self.level
        return np.asarray(_descriptor_at(pyr.images[l], pyr.gx[l],
                                         pyr.gy[l], jnp.float32(0.0)))

    def add(self, kf_id: int, pyr) -> None:
        """== FabMap::compareAndAdd's add half (FabMap.cpp:126-204)."""
        l = self.level
        desc = _descriptor_at(pyr.images[l], pyr.gx[l], pyr.gy[l],
                              jnp.float32(0.0))
        i = len(self._ids)
        if self._mat is None:
            self._mat = jnp.zeros((self._capacity, desc.shape[0]),
                                  jnp.float32)
        if i >= self._capacity:
            self._capacity *= 2
            self._mat = jnp.concatenate(
                [self._mat, jnp.zeros_like(self._mat)], axis=0)
        self._mat = _append_row(self._mat, i, desc)
        self._index_of[kf_id] = i
        self._ids.append(kf_id)

    def query(self, pyr, query_id: int) -> Optional[int]:
        """Best-matching keyframe id, or None if no confident match."""
        n = len(self._ids)
        if n < 2:
            return None
        l = self.level
        scores = np.array(_query_scores(self._mat, pyr.images[l],
                                        pyr.gx[l], pyr.gy[l],
                                        self._thetas))[:n]
        # exclude temporally-near keyframes (appearance matches of the
        # immediate past are not loop closures). For a keyframe IN the
        # index the exclusion is exact by insertion order; for an unknown
        # query frame the window is min_index_gap keyframe intervals, with
        # the interval MEASURED from the index's own id spacing (round 3
        # hard-coded a x8 cadence guess here)
        qi = self._index_of.get(query_id)
        ids = np.asarray(self._ids)
        if qi is not None:
            lo = max(0, qi - self.min_index_gap)
            hi = min(n, qi + self.min_index_gap + 1)
            scores[lo:hi] = -1.0
        else:
            cadence = float(np.median(np.diff(ids))) if n > 1 else 1.0
            window = self.min_index_gap * max(cadence, 1.0)
            scores[np.abs(ids - query_id) < window] = -1.0
        order = np.argsort(scores)[::-1]
        best, second = order[0], (order[1] if len(order) > 1 else order[0])
        if scores[best] < self.accept_score:
            return None
        if scores[second] > 0 and scores[best] < self.ratio * scores[second]:
            return None  # ambiguous place
        return int(self._ids[best])
