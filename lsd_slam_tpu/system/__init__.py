"""Engine orchestration: poses, keyframes, the SlamSystem state machine."""

from lsd_slam_tpu.system.poses import PoseNode  # noqa: F401
from lsd_slam_tpu.system.keyframe import Keyframe  # noqa: F401
from lsd_slam_tpu.system.slam_system import SlamSystem  # noqa: F401
from lsd_slam_tpu.system.warmup import warmup  # noqa: F401
