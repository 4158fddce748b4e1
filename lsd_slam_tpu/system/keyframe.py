"""Keyframe container: pyramid + exported depth + tracking reference.

Equivalent of the keyframe role of Frame (src/DataStructures/Frame.h) —
the pyramid pytree replaces the lazy buffer machinery, the exported depth
pyramid replaces idepth/idepthVar levels, and the reactivation snapshot
mirrors takeReActivationData (Frame.cpp:107-145).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from lsd_slam_tpu.frames import (FramePyramid, DepthPyramid,
                                 build_depth_pyramid)
from lsd_slam_tpu.tracking import TrackingRef, make_tracking_ref
from lsd_slam_tpu.system.poses import PoseNode


class Keyframe:
    def __init__(self, frame_id: int, timestamp: float, pyr: FramePyramid,
                 pose: PoseNode):
        self.id = frame_id
        self.timestamp = timestamp
        self.pyr = pyr
        self.pose = pose

        self.depth: Optional[DepthPyramid] = None
        self.tracking_ref: Optional[TrackingRef] = None
        self.mean_idepth: float = 1.0
        self.num_points: int = 0

        # stats the depth filter & keyframe selection use
        self.num_frames_tracked_on_this = 0
        self.num_mapped_on_this = 0
        self.num_mapped_on_this_total = 0
        self.idx_in_keyframes = -1

        # re-activation snapshot (idepth/var/validity at level 0)
        self.reactivation: Optional[tuple] = None
        # permaRef: always-resident coarse-level cloud for reloc/kf-search
        self.perma_ref: Optional[TrackingRef] = None
        # failed constraint-tracking memory (Frame::trackingFailed)
        self.tracking_failed: dict = {}
        # initial tracking residual of the frame this KF was created from
        self.initial_tracked_residual = 1.0
        self.edge_error_sum = 1.0
        self.edges_num = 1

    def set_depth(self, idepth0, ivar0, mean_idepth: float, num_points: int,
                  levels: int):
        """== Frame::setDepth + buildIDepthAndIDepthVar: store the exported
        level-0 depth and rebuild the fused pyramid + tracking ref."""
        self.depth = build_depth_pyramid(idepth0, ivar0, levels)
        self.tracking_ref = make_tracking_ref(self.pyr, self.depth)
        self.mean_idepth = float(mean_idepth)
        self.num_points = int(num_points)

    def cam_to_world(self) -> np.ndarray:
        return self.pose.cam_to_world()
