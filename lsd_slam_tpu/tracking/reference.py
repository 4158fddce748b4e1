"""Per-keyframe tracking reference: fixed-shape masked point grids.

Replaces TrackingReference (src/Tracking/TrackingReference.{h,cpp}): where
the reference compacts valid semi-dense pixels into variable-length point
lists per level (makePointCloud, TrackingReference.cpp:96-147), the TPU
build keeps full (H_l, W_l) grids with a validity mask — the compaction's
control flow is worth more than the wasted FLOPs on a vector machine.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from lsd_slam_tpu.frames.pyramid import FramePyramid, DepthPyramid


@struct.dataclass
class TrackingRef:
    """Per-level reference data for direct alignment.

    valid[l]: ivar > 0 & idepth != 0 & 1-px interior
    (TrackingReference.cpp:127-135)."""

    images: Tuple[jnp.ndarray, ...]
    idepth: Tuple[jnp.ndarray, ...]
    ivar: Tuple[jnp.ndarray, ...]
    valid: Tuple[jnp.ndarray, ...]
    # keyframe gradients (needed by the Sim3 tracker's ESM averaging)
    gx: Tuple[jnp.ndarray, ...]
    gy: Tuple[jnp.ndarray, ...]
    # gather-friendly packed layouts (see FramePyramid.packed):
    # packed[l] = (H, W, 4) [image, gx, gy, 0];
    # depth_packed[l] = (H, W, 2) [idepth, ivar] for the Sim3 tracker's
    # nearest-neighbor depth-residual lookup
    packed: Tuple[jnp.ndarray, ...]
    depth_packed: Tuple[jnp.ndarray, ...]


def make_tracking_ref(pyr: FramePyramid, depth: DepthPyramid) -> TrackingRef:
    valids = []
    for l in range(len(pyr.images)):
        iv = depth.ivar[l]
        idp = depth.idepth[l]
        interior = jnp.zeros_like(iv, dtype=bool).at[1:-1, 1:-1].set(True)
        valids.append((iv > 0) & (idp != 0) & interior)
    import jax.numpy as _jnp

    return TrackingRef(
        images=pyr.images,
        idepth=depth.idepth,
        ivar=depth.ivar,
        valid=tuple(valids),
        gx=pyr.gx,
        gy=pyr.gy,
        packed=pyr.packed,
        depth_packed=tuple(
            _jnp.stack([depth.idepth[l], depth.ivar[l]], axis=-1)
            for l in range(len(pyr.images))),
    )
