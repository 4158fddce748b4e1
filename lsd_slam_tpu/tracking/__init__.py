"""Direct image-alignment trackers (SE3 odometry, Sim3 constraints)."""

from lsd_slam_tpu.tracking.reference import (  # noqa: F401
    TrackingRef, make_tracking_ref, add_sim3_quads)
from lsd_slam_tpu.tracking.se3_tracker import SE3Tracker, TrackResult  # noqa: F401
