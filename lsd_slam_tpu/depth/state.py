"""Per-keyframe depth-hypothesis state as a pytree of (H, W) arrays.

Replaces the AoS DepthMapPixelHypothesis grid
(src/DepthEstimation/DepthMapPixelHypothesis.h:41-60) with SoA arrays —
the natural layout for whole-image vector ops.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DepthMapState:
    valid: jnp.ndarray            # bool  — isValid
    idepth: jnp.ndarray           # f32   — raw filtered inverse depth
    var: jnp.ndarray              # f32   — idepth variance
    idepth_smoothed: jnp.ndarray  # f32   — regularized (-1 until regularized)
    var_smoothed: jnp.ndarray     # f32
    validity: jnp.ndarray         # f32   — validity_counter
    blacklisted: jnp.ndarray      # i32   — starts 0, decremented on failures
    next_min_id: jnp.ndarray      # f32   — nextStereoFrameMinID (frame id gate)

    def canonical(self) -> "DepthMapState":
        """Force every field to its canonical STRONG dtype.

        States built from python-scalar `jnp.where` branches carry
        weak-typed f32 leaves; a jitted consumer traced on a weak-typed
        state then RETRACES when it later receives the strong-typed state
        another program returned (jax cache keys include weak_type). Every
        state-constructing program calls this so all DepthMapState values
        in flight share one trace signature."""
        return DepthMapState(
            valid=self.valid.astype(bool),
            idepth=self.idepth.astype(jnp.float32),
            var=self.var.astype(jnp.float32),
            idepth_smoothed=self.idepth_smoothed.astype(jnp.float32),
            var_smoothed=self.var_smoothed.astype(jnp.float32),
            validity=self.validity.astype(jnp.float32),
            blacklisted=self.blacklisted.astype(jnp.int32),
            next_min_id=self.next_min_id.astype(jnp.float32),
        )

    @staticmethod
    def empty(h: int, w: int) -> "DepthMapState":
        return DepthMapState(
            valid=jnp.zeros((h, w), bool),
            idepth=jnp.zeros((h, w), jnp.float32),
            var=jnp.zeros((h, w), jnp.float32),
            idepth_smoothed=jnp.full((h, w), -1.0, jnp.float32),
            var_smoothed=jnp.full((h, w), -1.0, jnp.float32),
            validity=jnp.zeros((h, w), jnp.float32),
            blacklisted=jnp.zeros((h, w), jnp.int32),
            next_min_id=jnp.zeros((h, w), jnp.float32),
        )
