"""Image / gradient / depth pyramids as fixed-shape pytrees.

Semantics parity with the reference (citations into /root/reference):
  * image downsample: 2x2 box average (Frame.cpp:491-630, the SSE loop);
  * gradients: central differences dx = 0.5(I[x+1]-I[x-1]) stored with the
    intensity (Frame.cpp:643-680); valid on the 1-pixel-interior;
  * max-gradient: 3x3 max of |grad| via two separable max passes
    (Frame.cpp:690-767), plus the mappable-pixel count at level 0;
  * inverse-depth downsample: 2x2 inverse-variance-weighted fusion of valid
    (var>0) hypotheses; invalid pixels carry -1 (Frame.cpp:775-877).

TPU-first: everything is whole-image, branch-free (masks instead of the
reference's per-pixel if/else), all levels built in one jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from lsd_slam_tpu.ops.interp import quad_pack


@struct.dataclass
class FramePyramid:
    """Per-level image data. images[l] has shape (H >> l, W >> l), f32.

    gx/gy are zero on the border ring where central differences are
    undefined (the reference never reads them there: trackers clamp to the
    interior and the depth mapper skips a 3-px border)."""

    images: Tuple[jnp.ndarray, ...]
    gx: Tuple[jnp.ndarray, ...]
    gy: Tuple[jnp.ndarray, ...]
    max_grad: Tuple[jnp.ndarray, ...]
    # quad-packed (H*W, 12) [image, gx, gy] x 4 bilinear taps per level:
    # the gather-friendly layout the trackers sample from with a single
    # row-gather (see ops.interp.quad_pack; same idea as the reference's
    # Vector4f gradient array, Frame.cpp:643-680, plus the 2x2 footprint)
    quad: Tuple[jnp.ndarray, ...]
    num_mappable: jnp.ndarray  # scalar: level-0 pixels with max_grad >= thresh


@struct.dataclass
class DepthPyramid:
    """Per-level semi-dense inverse depth. Invalid pixels: ivar <= 0."""

    idepth: Tuple[jnp.ndarray, ...]
    ivar: Tuple[jnp.ndarray, ...]


def num_levels(pyr: FramePyramid) -> int:
    return len(pyr.images)


def _box_down2(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    return img.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _central_gradients(img: jnp.ndarray):
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def _max3(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """3-tap max along an axis (edge-clamped), one smear pass."""
    lo = jnp.concatenate([x.take(jnp.array([0]), axis), x], axis)
    hi = jnp.concatenate([x, x.take(jnp.array([-1]), axis)], axis)
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(lo, 0, n, axis=axis)
    hi = jax.lax.slice_in_dim(hi, 1, n + 1, axis=axis)
    return jnp.maximum(jnp.maximum(lo, x), hi)


@functools.partial(jax.jit, static_argnames=("levels",))
def build_frame(image: jnp.ndarray, levels: int = 5,
                min_abs_grad: float = 5.0) -> FramePyramid:
    """Build the full pyramid for one grayscale image (H, W) float32."""
    image = image.astype(jnp.float32)
    images, gxs, gys, mgs, packs = [], [], [], [], []
    img = image
    num_mappable = jnp.zeros((), jnp.float32)
    for l in range(levels):
        if l > 0:
            img = _box_down2(img)
        gx, gy = _central_gradients(img)
        mag = jnp.sqrt(gx * gx + gy * gy)
        mg = _max3(_max3(mag, 0), 1)
        # zero the border ring: 3x3 smear is undefined there
        # (Frame.cpp computes it on [1, h-2) x [1, w-2) only)
        mask = jnp.zeros_like(mg).at[1:-1, 1:-1].set(1.0)
        mg = mg * mask
        if l == 0:
            num_mappable = jnp.sum((mg >= min_abs_grad).astype(jnp.float32))
        images.append(img)
        gxs.append(gx)
        gys.append(gy)
        mgs.append(mg)
        packs.append(quad_pack((img, gx, gy)))
    return FramePyramid(
        images=tuple(images), gx=tuple(gxs), gy=tuple(gys),
        max_grad=tuple(mgs), quad=tuple(packs), num_mappable=num_mappable,
    )


def _idepth_down2(idepth: jnp.ndarray, ivar: jnp.ndarray):
    """2x2 inverse-variance-weighted fusion (Frame.cpp:806-874)."""
    h, w = idepth.shape
    d = idepth.reshape(h // 2, 2, w // 2, 2)
    v = ivar.reshape(h // 2, 2, w // 2, 2)
    valid = v > 0
    iv = jnp.where(valid, 1.0 / jnp.where(valid, v, 1.0), 0.0)
    ivar_sum = iv.sum(axis=(1, 3))
    id_sum = (iv * jnp.where(valid, d, 0.0)).sum(axis=(1, 3))
    num = valid.sum(axis=(1, 3)).astype(idepth.dtype)
    any_valid = num > 0
    safe = jnp.where(any_valid, ivar_sum, 1.0)
    out_id = jnp.where(any_valid, id_sum / safe, -1.0)
    out_var = jnp.where(any_valid, num / safe, -1.0)
    return out_id, out_var


@functools.partial(jax.jit, static_argnames=("levels",))
def build_depth_pyramid(idepth0: jnp.ndarray, ivar0: jnp.ndarray,
                        levels: int = 5) -> DepthPyramid:
    ids, ivs = [idepth0.astype(jnp.float32)], [ivar0.astype(jnp.float32)]
    for l in range(1, levels):
        i, v = _idepth_down2(ids[-1], ivs[-1])
        ids.append(i)
        ivs.append(v)
    return DepthPyramid(idepth=tuple(ids), ivar=tuple(ivs))
