"""Camera models, calibration parsing and undistortion.

TPU-native replacement of the reference's Undistorter layer
(lsd_slam_core/src/util/Undistorter.{h,cpp}): remap tables are built once on
the host (numpy) and undistortion runs as a jitted bilinear gather on device.
"""

from lsd_slam_tpu.camera.model import Camera  # noqa: F401
from lsd_slam_tpu.camera.undistort import (  # noqa: F401
    Undistorter,
    undistorter_for_file,
    undistorter_for_params,
)
