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


def quad_nearest(raw_rows: jnp.ndarray, k: int, c: int, fu, fv):
    """Channel k of the tap nearest to (u, v), from quad_sample's raw rows
    (the reference's rounded-pixel depth lookup, Sim3Tracker.cpp:527-541)."""
    right = (fu > 0.5).reshape(-1)
    down = (fv > 0.5).reshape(-1)
    top = jnp.where(right, raw_rows[:, c + k], raw_rows[:, k])
    bot = jnp.where(right, raw_rows[:, 3 * c + k], raw_rows[:, 2 * c + k])
    return jnp.where(down, bot, top).reshape(fu.shape)
