"""Semi-dense inverse-depth filtering (the mapping back-end).

TPU-native re-design of DepthMap (src/DepthEstimation/DepthMap.{h,cpp}).
All per-pixel hypothesis state lives in fixed-shape (H, W) arrays
(DepthMapState); every sweep (observe / regularize / fill-holes / propagate)
is one jitted whole-image program; the reference's per-pixel branch lattice
(14 stereo outcome codes, EKF fusion cases) becomes where-masks.
"""

from lsd_slam_tpu.depth.state import DepthMapState  # noqa: F401
from lsd_slam_tpu.depth.depth_map import DepthMap  # noqa: F401
