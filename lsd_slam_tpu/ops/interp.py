"""Bilinear interpolation as masked whole-grid gathers.

Replaces the reference's getInterpolatedElement* family
(util/globalFuncs.h:43-109). Coordinates are pixel-centered like the
reference: integer coordinate == pixel center.
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
    a, b, c = imgs
    packed = jnp.stack([a, b, c, jnp.zeros_like(a)], axis=-1)
    out = bilinear_packed(packed, u, v)
    return out[..., 0], out[..., 1], out[..., 2]


def pack_channels(a, b, c):
    """Pack three (H, W) channels into the (H, W, 4) layout
    bilinear_packed gathers from (pad channel keeps rows 16-byte)."""
    return jnp.stack([a, b, c, jnp.zeros_like(a)], axis=-1)


def bilinear_packed(packed: jnp.ndarray, u, v) -> jnp.ndarray:
    """Bilinear-sample a packed (H, W, C) image at float coords -> (..., C).

    TPU-critical layout: XLA TPU gathers cost ~constant per gathered ROW,
    so four row-gathers from the flattened (H*W, C) array (all channels per
    row) are ~6x faster than per-channel scalar gathers. Out-of-range
    coords clamp to the border (callers mask)."""
    h, w, ch = packed.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    idx = (v0.astype(jnp.int32) * w + u0.astype(jnp.int32)).reshape(-1)
    flat = packed.reshape(-1, ch)
    p00 = jnp.take(flat, idx, axis=0, mode="clip")
    p01 = jnp.take(flat, idx + 1, axis=0, mode="clip")
    p10 = jnp.take(flat, idx + w, axis=0, mode="clip")
    p11 = jnp.take(flat, idx + w + 1, axis=0, mode="clip")
    shape = u.shape + (ch,)
    return ((p00.reshape(shape) * (1 - fu) + p01.reshape(shape) * fu) * (1 - fv)
            + (p10.reshape(shape) * (1 - fu) + p11.reshape(shape) * fu) * fv)
