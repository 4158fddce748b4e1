"""Bilinear interpolation as masked whole-grid / quad-packed gathers.

Replaces the reference's getInterpolatedElement* family
(util/globalFuncs.h:43-109). Coordinates are pixel-centered like the
reference: integer coordinate == pixel center.

TPU cost model (measured on v5e): a gather costs ~constant per gathered
ROW (plus a weak per-byte term), so the fastest bilinear sample packs the
whole 2x2 footprint of every channel into ONE row ("quad packing") and
does a single row-gather — ~1.6x faster than four per-tap row-gathers and
~6x faster than per-channel scalar gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W) at float coords u (x), v (y); clamped at borders.

    Callers are expected to mask out-of-image samples themselves (the
    clamp only guarantees in-bounds gathers). Uses flat 1-D row gathers —
    materially faster than 2-D advanced indexing on TPU."""
    h, w = img.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    idx = (v0.astype(jnp.int32) * w + u0.astype(jnp.int32)).reshape(-1)
    flat = img.reshape(-1)
    shape = u.shape
    i00 = jnp.take(flat, idx, mode="clip").reshape(shape)
    i01 = jnp.take(flat, idx + 1, mode="clip").reshape(shape)
    i10 = jnp.take(flat, idx + w, mode="clip").reshape(shape)
    i11 = jnp.take(flat, idx + w + 1, mode="clip").reshape(shape)
    return (i00 * (1 - fu) + i01 * fu) * (1 - fv) \
        + (i10 * (1 - fu) + i11 * fu) * fv


def bilinear3(imgs, u, v):
    """Sample three aligned channels (e.g. image, gx, gy) at (u, v).

    Shares the index/weight computation across channels — the analog of the
    reference's packed Vector4f gradient interpolation
    (globalFuncs.h getInterpolatedElement43)."""
    quad = quad_pack(imgs)
    h, w = imgs[0].shape
    (a, b, c), _, _ = quad_sample(quad, h, w, u, v)
    return a, b, c


def quad_pack(channels) -> jnp.ndarray:
    """Pack C channels of an (H, W) image into the (H*W, 4*C) quad layout.

    Row i = (y*W + x) holds the full 2x2 bilinear footprint
    [p00 ch0..chC-1 | p01 ... | p10 ... | p11 ...] where p00 = (y, x),
    p01 = (y, x+1), p10 = (y+1, x), p11 = (y+1, x+1). Built with rolls, so
    the last row/column wrap — callers never address them (coords are
    clamped so u0 <= W-2, v0 <= H-2)."""
    base = jnp.stack(list(channels), axis=-1)  # (H, W, C)
    h, w, c = base.shape
    p01 = jnp.roll(base, -1, axis=1)
    p10 = jnp.roll(base, -1, axis=0)
    p11 = jnp.roll(p10, -1, axis=1)
    return jnp.concatenate([base, p01, p10, p11], axis=-1).reshape(h * w, 4 * c)


def quad_coords(h: int, w: int, u, v):
    """Clamp (u, v), split into (flat row index, fu, fv)."""
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    idx = v0.astype(jnp.int32) * w + u0.astype(jnp.int32)
    return idx, u - u0, v - v0


def quad_sample(quad: jnp.ndarray, h: int, w: int, u, v):
    """Bilinear-sample a quad-packed image with ONE row-gather.

    Returns (channels, raw_rows, (fu, fv)): `channels` is a list of C
    interpolated arrays shaped like u; `raw_rows` the gathered (N, 4*C)
    taps for callers that need per-tap access (e.g. nearest-neighbor depth
    lookup in the Sim3 tracker)."""
    c = quad.shape[1] // 4
    idx, fu, fv = quad_coords(h, w, u, v)
    g = jnp.take(quad, idx.reshape(-1), axis=0, mode="clip")  # (N, 4C)
    w00 = ((1 - fu) * (1 - fv)).reshape(-1)
    w01 = (fu * (1 - fv)).reshape(-1)
    w10 = ((1 - fu) * fv).reshape(-1)
    w11 = (fu * fv).reshape(-1)
    outs = [
        (g[:, k] * w00 + g[:, c + k] * w01
         + g[:, 2 * c + k] * w10 + g[:, 3 * c + k] * w11).reshape(u.shape)
        for k in range(c)
    ]
    return outs, g, (fu, fv)


def patch16_pack(img: jnp.ndarray) -> jnp.ndarray:
    """Pack an (H, W) image into the (H*W, 16) 4x4-patch layout.

    Row i = (y*W + x) holds the 4x4 neighborhood img[y:y+4, x:x+4]
    row-major (lane 4*dy+dx = img[y+dy, x+dx]). One row-gather then serves
    EVERY bilinear sample whose 2x2 footprint lies inside the patch — up to
    3 consecutive epipolar-lattice samples (spacing <= 1 px/axis, span <= 2)
    or 2 stereo-descriptor taps (spacing <= 1.4 px/axis). Gathers cost per
    row on TPU, so this cuts the stereo sweep's gather count ~2.7x vs the
    quad layout (one row per sample). Built with rolls: the last 3 rows /
    columns wrap, but callers clamp the patch base to <= (H-4, W-4) so
    wrapped lanes are never addressed."""
    h, w = img.shape
    chans = []
    for dy in range(4):
        r = jnp.roll(img, -dy, axis=0) if dy else img
        for dx in range(4):
            chans.append(jnp.roll(r, -dx, axis=1) if dx else r)
    return jnp.stack(chans, axis=-1).reshape(h * w, 16)


def patch16_sample(patch: jnp.ndarray, h: int, w: int, us, vs):
    """Bilinear-sample M grouped positions with ONE row-gather per group.

    us/vs: (..., M) float coords; each trailing-axis group must span at
    most 2 px per axis (so all M bilinear footprints share one 4x4 patch).
    Returns interpolated values shaped like us. Exact bilinear — same
    clamping semantics as quad_sample/bilinear."""
    us = jnp.clip(us, 0.0, w - 1.001)
    vs = jnp.clip(vs, 0.0, h - 1.001)
    bx = jnp.clip(jnp.min(us, axis=-1), 0.0, w - 4.0)
    by = jnp.clip(jnp.min(vs, axis=-1), 0.0, h - 4.0)
    bx = jnp.floor(bx).astype(jnp.int32)
    by = jnp.floor(by).astype(jnp.int32)
    idx = by * w + bx
    g = jnp.take(patch, idx.reshape(-1), axis=0, mode="clip")
    g = g.reshape(idx.shape + (16,))                       # (..., 16)
    lx = us - bx[..., None].astype(jnp.float32)            # [0, 3.x)
    ly = vs - by[..., None].astype(jnp.float32)
    u0 = jnp.clip(jnp.floor(lx), 0.0, 2.0)
    v0 = jnp.clip(jnp.floor(ly), 0.0, 2.0)
    fu = lx - u0
    fv = ly - v0
    corner = (v0 * 4.0 + u0)[..., None]                    # (..., M, 1)
    lane = jnp.arange(16, dtype=jnp.float32)
    wrow = ((lane == corner) * ((1 - fu) * (1 - fv))[..., None]
            + (lane == corner + 1.0) * (fu * (1 - fv))[..., None]
            + (lane == corner + 4.0) * ((1 - fu) * fv)[..., None]
            + (lane == corner + 5.0) * (fu * fv)[..., None])
    return jnp.sum(g[..., None, :] * wrow, axis=-1)


def quad_nearest(raw_rows: jnp.ndarray, k: int, c: int, fu, fv):
    """Channel k of the tap nearest to (u, v), from quad_sample's raw rows
    (the reference's rounded-pixel depth lookup, Sim3Tracker.cpp:527-541)."""
    right = (fu > 0.5).reshape(-1)
    down = (fv > 0.5).reshape(-1)
    top = jnp.where(right, raw_rows[:, c + k], raw_rows[:, k])
    bot = jnp.where(right, raw_rows[:, 3 * c + k], raw_rows[:, 2 * c + k])
    return jnp.where(down, bot, top).reshape(fu.shape)
