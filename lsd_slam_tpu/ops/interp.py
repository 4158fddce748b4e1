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
    clamp only guarantees in-bounds gathers)."""
    h, w = img.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    i00 = img[v0, u0]
    i01 = img[v0, u1]
    i10 = img[v1, u0]
    i11 = img[v1, u1]
    return (
        i00 * (1 - fu) * (1 - fv)
        + i01 * fu * (1 - fv)
        + i10 * (1 - fu) * fv
        + i11 * fu * fv
    )


def bilinear3(imgs, u, v):
    """Sample three aligned channels (e.g. image, gx, gy) at (u, v).

    Shares the index/weight computation across channels — the analog of the
    reference's packed Vector4f gradient interpolation
    (globalFuncs.h getInterpolatedElement43)."""
    a, b, c = imgs
    h, w = a.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv

    def samp(img):
        return (img[v0, u0] * w00 + img[v0, u1] * w01
                + img[v1, u0] * w10 + img[v1, u1] * w11)

    return samp(a), samp(b), samp(c)
