"""Frame pyramid containers and builders.

TPU-native replacement of the reference's Frame lazy pyramid
(lsd_slam_core/src/DataStructures/Frame.{h,cpp}): instead of per-level lazy
build with validity flags and mutexes, the whole pyramid is built eagerly in
one fused jitted program — all levels of image / gradient / max-gradient are
a few fused elementwise passes, far cheaper than the bookkeeping they'd need.
"""

from lsd_slam_tpu.frames.pyramid import (  # noqa: F401
    FramePyramid,
    DepthPyramid,
    build_frame,
    build_depth_pyramid,
    num_levels,
)
