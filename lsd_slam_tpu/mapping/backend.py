"""SLAM back-end orchestration: constraint search + pose-graph optimization.

Equivalent of the reference's constraint-search and optimization threads
(SlamSystem.cpp:266-381). Sequential mode runs both inline after each new
keyframe for determinism; async mode reproduces the reference's full
4-way overlap — tracking ∥ mapping ∥ constraint search ∥ optimization —
with the constraint worker also re-tracking random old keyframes when
idle (SlamSystem.cpp:275-310). Optimized poses are staged and merged back
on the mapping path (mergeOptimizationOffset, SlamSystem.cpp:176-202).
"""

from __future__ import annotations

from typing import Optional, TYPE_CHECKING

import numpy as np

from lsd_slam_tpu.lie import np_sim3 as nps

if TYPE_CHECKING:
    from lsd_slam_tpu.system.slam_system import SlamSystem, TrackedFrame
    from lsd_slam_tpu.system.keyframe import Keyframe


class MappingBackend:
    """Owns the keyframe graph, constraint tracker and optimizer."""

    def __init__(self, system: "SlamSystem"):
        self.system = system
        self._constraint_searcher = None
        self._graph = None
        self._have_unmerged = False
        self.constraint_thread = None
        self.optimization_thread = None
        if not system.cfg.system.sequential:
            from lsd_slam_tpu.system.async_mapping import (
                ConstraintThread, OptimizationThread)
            self.constraint_thread = ConstraintThread(self)
            self.optimization_thread = OptimizationThread(self)
            self.constraint_thread.start()
            self.optimization_thread.start()

    # lazily build the heavy pieces (Sim3 tracker compile) on first KF
    def _ensure(self):
        if self._graph is None:
            from lsd_slam_tpu.mapping.keyframe_graph import KeyFrameGraph
            self._graph = KeyFrameGraph(self.system)
        return self._graph

    @property
    def graph(self):
        return self._ensure()

    def on_new_keyframe(self, kf: "Keyframe"):
        graph = self._ensure()
        graph.add_keyframe(kf)
        if self.constraint_thread is not None:
            # async: hand the keyframe to the constraint worker
            # (== newKeyFrames queue, SlamSystem.cpp:417-420)
            self.constraint_thread.push(kf)
            return
        n_added = graph.find_constraints_for_new_keyframe(
            kf, force_parent=True)
        # the reference optimizes only when constraints arrived
        # (newConstraintAdded handshake, SlamSystem.cpp:359-381)
        if n_added > 0:
            changed = graph.optimize_slices(
                max_slices=self.system.cfg.system.pgo_max_slices_per_update)
            if changed:
                self._have_unmerged = True

    def signal_new_constraints(self):
        """== newConstraintAdded + signal (SlamSystem.cpp:1570-1579)."""
        if self.optimization_thread is not None:
            self.optimization_thread.signal()

    def wait_until_drained(self, timeout: float = 120.0):
        """Drain the async back-end (constraint queue, then optimizer)."""
        if self.constraint_thread is not None:
            self.constraint_thread.wait_until_drained(timeout)
        if self.optimization_thread is not None:
            self.optimization_thread.wait_until_drained(timeout)

    def stop_threads(self):
        if self.constraint_thread is not None:
            self.constraint_thread.stop()
            self.constraint_thread = None
        if self.optimization_thread is not None:
            self.optimization_thread.stop()
            self.optimization_thread = None

    def merge_optimization_offset(self):
        """Apply staged graph-opt results (SlamSystem.cpp:176-202)."""
        if not self._have_unmerged or self._graph is None:
            return
        if (self.system.cfg.system.defer_pgo_merge
                and not getattr(self, "_finalizing", False)):
            return  # measurement mode: merges land only at finalize
        needs_publish = False
        for kf in list(self.system.keyframes):
            if kf.pose.apply_graph_opt_result():
                needs_publish = True
        if needs_publish:
            self.system.registry.invalidate_all()
            if self.system.output is not None:
                # == publishKeyframeGraph after the merge
                # (SlamSystem.cpp:198-200): poses-only update — viewers
                # re-pose their cached point buffers without re-receiving
                # points (KeyFrameGraphDisplay.cpp:158-208)
                self.system.output.publish_keyframe_graph(
                    self.system.keyframes,
                    self._graph.edges if self._graph is not None else [])
        self._have_unmerged = False

    def refresh_permaref(self, kf):
        """== Frame::setPermaRef at finishCurrentKeyframe."""
        if self._graph is not None:
            self._graph.set_permaref(kf)

    def find_reposition_candidate(self, tracked, max_score: float):
        if self._graph is None:
            return None
        return self._graph.find_reposition_candidate(tracked, max_score)

    def relocalize(self, pyr, frame_id, timestamp):
        if self._graph is None:
            return None
        return self._graph.relocalize(pyr)

    def full_reconstraint_search(self):
        """Re-search constraints for every keyframe
        (== doFullReConstraintTrack, SlamSystem.cpp:332-350)."""
        if self._graph is None:
            return 0
        n = 0
        for kf in list(self.system.keyframes):
            n += self._graph.find_constraints_for_new_keyframe(
                kf, force_parent=False)
        return n

    def finalize(self):
        """Final full optimization (SlamSystem.cpp:225-263)."""
        self._finalizing = True
        self.wait_until_drained()
        self.stop_threads()
        if self._graph is None:
            return
        if self.system.cfg.system.full_reconstraint_on_finalize:
            self.full_reconstraint_search()
            self._graph.optimize_slices()
        self._graph.optimize_final()
        self._have_unmerged = True
        self.merge_optimization_offset()
