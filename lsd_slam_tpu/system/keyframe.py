"""Keyframe container: pyramid + exported depth + tracking reference,
with device-memory minimization.

Equivalent of the keyframe role of Frame (src/DataStructures/Frame.h) plus
FrameMemory's active-frame management (FrameMemory.cpp:129-166 /
Frame::minimizeInMemory, Frame.cpp:377-395): a minimized keyframe keeps
only compact host (numpy) copies of its level-0 image and depth; pyramids,
packed gather layouts and the tracking reference are dropped from HBM and
lazily rebuilt on next access (the reference's require()/build* flow).
This is what bounds device memory over 1000-keyframe maps.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


class Keyframe:
    def __init__(self, frame_id: int, timestamp: float, pyr,
                 pose, levels: int = 5, min_use_grad: float = 5.0):
        self.id = frame_id
        self.timestamp = timestamp
        self.pose = pose
        self.levels = levels
        self.min_use_grad = min_use_grad

        self._pyr = pyr
        self._depth = None
        self._tracking_ref = None
        self._sim3_ref = None
        self._pending_depth = None  # deferred (idepth0, ivar0) device pair
        # compact host copies (authoritative once minimized)
        self._host_image: Optional[np.ndarray] = None
        self._host_idepth: Optional[np.ndarray] = None
        self._host_ivar: Optional[np.ndarray] = None

        self.mean_idepth: float = 1.0
        self.num_points: int = 0
        self.num_frames_tracked_on_this = 0
        self.num_mapped_on_this = 0
        self.num_mapped_on_this_total = 0
        self.idx_in_keyframes = -1
        self.last_use_counter = 0

        self.reactivation: Optional[tuple] = None  # host numpy triple
        self.tracking_failed: dict = {}
        self.initial_tracked_residual = 1.0
        self.edge_error_sum = 1.0
        self.edges_num = 1

    # ------------------------------------------------------------ access

    @property
    def pyr(self):
        if self._pyr is None:
            self._restore()
        return self._pyr

    @property
    def depth(self):
        if self._pending_depth is not None:
            self._materialize_depth()
        if self._depth is None and self._host_idepth is not None:
            self._restore()
        return self._depth

    @property
    def tracking_ref(self):
        if self._pending_depth is not None:
            self._materialize_depth()
        if self._tracking_ref is None:
            self._restore()
        return self._tracking_ref

    @property
    def sim3_ref(self):
        """tracking_ref with the Sim3 target layouts filled — built lazily
        and cached; only keyframes entering constraint search pay for it."""
        if self._sim3_ref is None:
            from lsd_slam_tpu.tracking import add_sim3_quads
            self._sim3_ref = add_sim3_quads(self.tracking_ref, self.pyr,
                                            self.depth)
        return self._sim3_ref

    @property
    def is_minimized(self) -> bool:
        return self._pyr is None

    # ------------------------------------------------------------ depth

    def set_depth(self, idepth0, ivar0, mean_idepth: float, num_points: int,
                  levels: int, defer: bool = False):
        """== Frame::setDepth + buildIDepthAndIDepthVar.

        defer=True stores the level-0 arrays and materializes the depth
        pyramid / tracking reference lazily on first access: the pipelined
        frame loop refreshes depth EVERY frame but chains the tracking
        reference in-program, so the per-frame rebuild dispatches here
        were pure waste (~6 ms device time per frame) — only keyframe
        switches and constraint search actually read these products."""
        # invalidate any stale host copies; fresh ones are taken lazily at
        # minimize()/checkpoint time so the per-frame depth refresh costs no
        # device->host transfer
        self._host_idepth = None
        self._host_ivar = None
        self._sim3_ref = None
        self.mean_idepth = float(mean_idepth)
        self.num_points = int(num_points)
        if defer:
            self._pending_depth = (idepth0, ivar0, levels)
            self._depth = None
            self._tracking_ref = None
            return
        self._pending_depth = None
        self._build_depth(idepth0, ivar0, levels)

    def _build_depth(self, idepth0, ivar0, levels):
        from lsd_slam_tpu.frames import build_depth_pyramid
        from lsd_slam_tpu.tracking import make_tracking_ref

        self._depth = build_depth_pyramid(jnp.asarray(idepth0),
                                          jnp.asarray(ivar0), levels)
        self._tracking_ref = make_tracking_ref(self.pyr, self._depth,
                                               min_level=1, with_sim3=False)

    def _materialize_depth(self):
        idepth0, ivar0, levels = self._pending_depth
        self._pending_depth = None
        self._build_depth(idepth0, ivar0, levels)

    # ------------------------------------------------------------ memory

    def minimize(self):
        """Drop device pyramids; keep host copies
        (== Frame::minimizeInMemory)."""
        if self._pyr is None:
            return
        self._host_image = np.asarray(self._pyr.images[0])
        if self._pending_depth is not None:
            idepth0, ivar0, _ = self._pending_depth
            self._host_idepth = np.asarray(idepth0)
            self._host_ivar = np.asarray(ivar0)
            self._pending_depth = None
        elif self._depth is not None and self._host_idepth is None:
            self._host_idepth = np.asarray(self._depth.idepth[0])
            self._host_ivar = np.asarray(self._depth.ivar[0])
        if self.reactivation is not None:
            self.reactivation = tuple(np.asarray(a) for a in self.reactivation)
        self._pyr = None
        self._depth = None
        self._tracking_ref = None
        self._sim3_ref = None

    def _restore(self):
        """Rebuild pyramids from host copies (== Frame::require/build*)."""
        from lsd_slam_tpu.frames import build_frame, build_depth_pyramid
        from lsd_slam_tpu.tracking import make_tracking_ref

        if self._pyr is None:
            if self._host_image is None:
                raise RuntimeError(f"keyframe {self.id} has no image data")
            self._pyr = build_frame(jnp.asarray(self._host_image),
                                    self.levels, self.min_use_grad)
        if self._depth is None and self._host_idepth is not None:
            self._depth = build_depth_pyramid(
                jnp.asarray(self._host_idepth), jnp.asarray(self._host_ivar),
                self.levels)
            self._tracking_ref = make_tracking_ref(
                self._pyr, self._depth, min_level=1, with_sim3=False)

    def cam_to_world(self) -> np.ndarray:
        return self.pose.cam_to_world()


class KeyframeMemory:
    """Active-keyframe LRU (== FrameMemory::pruneActiveFrames,
    FrameMemory.cpp:129-166): keyframes beyond the active budget get
    minimized; access through the Keyframe properties restores them."""

    def __init__(self, max_active: int = 30):
        self.max_active = max_active
        self._counter = 0

    def touch(self, kf: Keyframe):
        self._counter += 1
        kf.last_use_counter = self._counter

    def prune(self, keyframes, current_kf: Optional[Keyframe]):
        active = [kf for kf in keyframes
                  if not kf.is_minimized and kf is not current_kf]
        if len(active) <= self.max_active:
            return 0
        active.sort(key=lambda kf: kf.last_use_counter)
        n = 0
        for kf in active[:len(active) - self.max_active]:
            kf.minimize()
            n += 1
        return n
