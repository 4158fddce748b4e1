"""Per-keyframe tracking reference: compacted semi-dense point sets.

Replaces TrackingReference (src/Tracking/TrackingReference.{h,cpp}): the
reference compacts valid semi-dense pixels into variable-length point
lists per level (makePointCloud, TrackingReference.cpp:96-147). The TPU
build does the same compaction — tracker cost is proportional to the
semi-dense point count, not the image area — but into FIXED-budget
buffers (static shapes for XLA) with a validity mask for padding slots.

Truncation under budget overflow is spatially uniform: pixels are visited
in a golden-stride permuted order before the cumsum compaction, so
dropping the tail subsamples the image evenly instead of cutting off the
bottom rows.

Measured on TPU v5e, the compaction (budget ~50% of the grid) plus the
quad-packed single-gather layout cuts the SE3 tracker's level-1 pass
~2.5-3x — gathers are ~87% of pass cost and scale linearly with point
count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lsd_slam_tpu.frames.pyramid import FramePyramid, DepthPyramid
from lsd_slam_tpu.ops.interp import quad_pack

# Fraction of the level grid kept as the point budget, per pyramid level.
# Levels >= 3 are tiny (<= 4800 px at 640x480) — keep the full grid there.
DEFAULT_BUDGET_FRAC = (0.35, 0.5, 0.65, 1.0, 1.0, 1.0, 1.0, 1.0)


@struct.dataclass
class PointSet:
    """Compacted semi-dense points of one pyramid level (all (N,) arrays).

    idx is the flat pixel index y*W + x into the level grid; padding slots
    have valid=False and idx pointing at pixel 0 (never dereferenced
    unmasked). ival/gx/gy are the keyframe intensity and gradients at the
    point (gradients feed the Sim3 tracker's ESM averaging); idp/ivr the
    inverse-depth hypothesis mean/variance."""

    idx: jnp.ndarray
    ival: jnp.ndarray
    gx: jnp.ndarray
    gy: jnp.ndarray
    idp: jnp.ndarray
    ivr: jnp.ndarray
    valid: jnp.ndarray
    n_valid: jnp.ndarray  # scalar f32: number of real (non-padding) points


@struct.dataclass
class TrackingRef:
    """Per-level reference data for direct alignment.

    pts[l] is the compacted set of pixels with ivar > 0 & idepth != 0 on
    the 1-px interior (TrackingReference.cpp:127-135). sim3_quad[l] is the
    (H*W, 20) quad-packed [image, gx, gy, idepth, idepth_var] target layout
    the Sim3 tracker samples with one gather.

    Levels below `min_level` and (when built with with_sim3=False) the
    sim3_quad entries hold None — the reference's makePointCloud is equally
    lazy per level (TrackingReference.cpp:96-147); the per-frame hot path
    only ever consumes levels >= 1, and the Sim3 layouts only matter for
    constraint search between keyframes, so building them per depth refresh
    would waste the mapping budget. Use `add_sim3_quads` to fill them."""

    pts: Tuple[PointSet, ...]
    sim3_quad: Tuple[jnp.ndarray, ...]


@functools.lru_cache(maxsize=None)
def _golden_perm(m: int) -> np.ndarray:
    """Deterministic spatially-uniform visiting order of m flat indices."""
    s = int(round(m * 0.6180339887))
    s = max(s, 1)
    while np.gcd(s, m) != 1:
        s += 1
    return ((np.arange(m, dtype=np.int64) * s) % m).astype(np.int32)


def level_budget(h: int, w: int, level: int,
                 frac: Tuple[float, ...] = DEFAULT_BUDGET_FRAC) -> int:
    m = h * w
    f = frac[level] if level < len(frac) else 1.0
    if f >= 1.0:
        return m
    return min(m, max(256, ((int(m * f) + 255) // 256) * 256))


def compact_points(valid: jnp.ndarray, fields: jnp.ndarray,
                   budget: int) -> Tuple[jnp.ndarray, ...]:
    """Compact flat `fields` (M, C) rows where `valid` (H, W) into a
    (budget, C) buffer. Returns (idx, vals, slot_valid, n_valid)."""
    h, w = valid.shape
    m = h * w
    vflat = valid.reshape(-1)
    if budget >= m:
        slot = jnp.arange(m, dtype=jnp.int32)
        return (slot, fields, vflat,
                jnp.sum(vflat.astype(jnp.float32)))
    perm = jnp.asarray(_golden_perm(m))
    vp = jnp.take(vflat, perm)
    pos = jnp.cumsum(vp.astype(jnp.int32)) - 1
    dest = jnp.where(vp, pos, budget)  # invalid -> OOB, dropped
    idx = jnp.zeros((budget,), jnp.int32).at[dest].set(perm, mode="drop")
    n_valid = jnp.minimum(jnp.sum(vp.astype(jnp.int32)), budget)
    slot_valid = jnp.arange(budget, dtype=jnp.int32) < n_valid
    vals = jnp.take(fields, idx, axis=0)
    return idx, vals, slot_valid, n_valid.astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("budget_frac", "min_level", "with_sim3"))
def make_tracking_ref(pyr: FramePyramid, depth: DepthPyramid,
                      budget_frac: Tuple[float, ...] = DEFAULT_BUDGET_FRAC,
                      min_level: int = 0, with_sim3: bool = True,
                      ) -> TrackingRef:
    """One jitted program: per-level compaction (+ optional Sim3 quad
    packing) — called once per keyframe depth refresh; the hot-path
    trackers then reuse the compacted buffers across all their LM passes.

    min_level/with_sim3 skip layouts nothing on the hot path consumes
    (level 0, Sim3 target layouts): the per-frame refresh drops from
    ~7.2 ms to well under 2 ms on a v5e."""
    pts, squads = [], []
    for l in range(len(pyr.images)):
        if l < min_level:
            pts.append(None)
            squads.append(None)
            continue
        iv = depth.ivar[l]
        idp = depth.idepth[l]
        img = pyr.images[l]
        h, w = img.shape
        interior = jnp.zeros_like(iv, dtype=bool).at[1:-1, 1:-1].set(True)
        valid = (iv > 0) & (idp != 0) & interior

        fields = jnp.stack(
            [img, pyr.gx[l], pyr.gy[l], idp, iv], axis=-1).reshape(-1, 5)
        budget = level_budget(h, w, l, budget_frac)
        idx, vals, slot_valid, n_valid = compact_points(valid, fields, budget)
        pts.append(PointSet(
            idx=idx, ival=vals[:, 0], gx=vals[:, 1], gy=vals[:, 2],
            idp=vals[:, 3], ivr=vals[:, 4], valid=slot_valid,
            n_valid=n_valid))
        squads.append(
            quad_pack((img, pyr.gx[l], pyr.gy[l], idp, iv)) if with_sim3
            else None)

    return TrackingRef(pts=tuple(pts), sim3_quad=tuple(squads))


@functools.partial(jax.jit, static_argnames=("min_level",))
def _sim3_quads(pyr: FramePyramid, depth: DepthPyramid, min_level: int = 1):
    return tuple(
        None if l < min_level
        else quad_pack((pyr.images[l], pyr.gx[l], pyr.gy[l],
                        depth.idepth[l], depth.ivar[l]))
        for l in range(len(pyr.images)))


def add_sim3_quads(ref: TrackingRef, pyr: FramePyramid, depth: DepthPyramid,
                   min_level: int = 1) -> TrackingRef:
    """Fill the Sim3 target layouts on an existing ref (lazily, at
    constraint-search time — only keyframes that actually enter Sim3
    tracking pay for the packing)."""
    return ref.replace(sim3_quad=_sim3_quads(pyr, depth, min_level))
