"""Direct image-alignment trackers (SE3 odometry, Sim3 constraints)."""

from lsd_slam_tpu.tracking.reference import TrackingRef, make_tracking_ref  # noqa: F401
from lsd_slam_tpu.tracking.se3_tracker import SE3Tracker, TrackResult  # noqa: F401
