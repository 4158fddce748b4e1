"""lsd_slam_tpu — a TPU-native direct monocular SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of LSD-SLAM
(tum-vision/lsd_slam, Engel/Schoeps/Cremers ECCV'14): pyramidal SE(3) direct
image alignment, semi-dense per-pixel inverse-depth filtering, Sim(3)
keyframe constraints and continuous Sim(3) pose-graph optimization.

Architecture (TPU-first, not a translation):
  * all dense per-pixel state is fixed-shape arrays with validity masks;
  * hot loops are jitted whole-image ops / Pallas kernels (masked lattices
    replace the reference's per-pixel branching and SSE intrinsics);
  * normal-equation accumulation (LGS6/LGS7) is expressed as matmuls so the
    MXU does the reduction;
  * keyframe / graph bookkeeping is host-side Python + native helpers;
  * multi-chip scaling partitions constraint candidates and pose-graph
    normal equations over a `jax.sharding.Mesh` (see `lsd_slam_tpu.parallel`).

Reference layer map: SURVEY.md section 1; build order: SURVEY.md section 7.
"""

__version__ = "0.1.0"

from lsd_slam_tpu.config import LSDConfig  # noqa: F401
