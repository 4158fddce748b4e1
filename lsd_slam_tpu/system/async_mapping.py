"""Asynchronous tracking/mapping pipeline.

The reference runs tracking and mapping in separate threads joined by the
unmappedTrackedFrames queue (SlamSystem.cpp:111-117, 206-223; capped at
50/100 entries, SlamSystem.cpp:1023-1027). Sequential (hz=0) mode is the
deterministic default here; this module adds the async configuration:
tracking stays on the latency-critical path while depth-map updates,
keyframe switches and constraint search drain a bounded queue on a worker
thread. Device programs from both threads serialize on the chip, but host
work (pose bookkeeping, graph search, python overhead) overlaps with
device execution — the same latency-hiding the reference gets from
threading.

Consistency model: the mapping thread is the only mutator of depth/keyframe
state; the tracking thread reads `current_keyframe.tracking_ref` via a
single attribute load (atomic in CPython) — the analog of the reference's
depthHasBeenUpdatedFlag handshake (SlamSystem.cpp:905-915).
"""

from __future__ import annotations

import threading
from typing import Optional

from lsd_slam_tpu.utils.native import NotifyQueue


class MappingThread:
    """Drains tracked frames into mapping iterations
    (== mappingThreadLoop, SlamSystem.cpp:206-223)."""

    def __init__(self, system, queue_capacity: int = 50):
        self.system = system
        self.queue = NotifyQueue(queue_capacity)
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._idle = threading.Event()
        self._idle.set()

    def start(self):
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="lsd-mapping")
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=30.0)
            self._thread = None

    def push(self, tracked) -> bool:
        """Queue a tracked frame (drop-on-full like the reference's cap)."""
        ok = self.queue.push(tracked)
        if ok:
            self._idle.clear()
        return ok

    def wait_until_drained(self, timeout: float = 60.0) -> bool:
        """blockUntilMapped (SlamSystem.cpp:1030-1039)."""
        return self._idle.wait(timeout)

    def _loop(self):
        sys = self.system
        while self._running:
            tracked = self.queue.pop(0.05)
            if tracked is None:
                if self.queue.size() == 0:
                    self._idle.set()
                continue
            # drain EVERYTHING queued into ONE mapping iteration — the
            # reference's whole-deque updateKeyframe (SlamSystem.cpp:
            # 542-571): a single multi-ref observe sweep maps the entire
            # batch, which is what lets this thread catch up to
            # free-running tracking instead of falling ever further behind
            batch = [tracked]
            while True:
                nxt = self.queue.pop(0.0)
                if nxt is None:
                    break
                batch.append(nxt)
            sys.stats.bump("mapping_batches")
            sys.stats.high_water("mapping_batch_max", len(batch))
            try:
                sys.do_mapping_iteration_batch(batch)
            finally:
                if self.queue.size() == 0:
                    self._idle.set()


class ConstraintThread:
    """Drains new keyframes into Sim(3) constraint search, and re-tracks
    random old keyframes when idle (== constraintSearchThreadLoop,
    SlamSystem.cpp:266-357): a random pick from the first third of
    keyframesForRetrack is re-searched with force_parent off, appearance
    retrieval off and relaxed closeness 2.0 (SlamSystem.cpp:281-290) —
    this is how the reference keeps densifying the edge set."""

    def __init__(self, backend, queue_capacity: int = 32):
        self.backend = backend
        self.queue = NotifyQueue(queue_capacity)
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._idle = threading.Event()
        self._idle.set()
        # quiesce: pause the idle re-track densifier. The reference's
        # retrack loop retries every 500 ms forever (SlamSystem.cpp:
        # 305-310) on its own CPU core; here each retrack dispatches real
        # device work, so a caller waiting for the back-end to drain (hz=0
        # blocking, finalize, benches) would never see the chip go quiet.
        # "Drained" therefore means quiescent: new keyframes resume the
        # densifier.
        self._quiesce = threading.Event()
        self._failed_to_retrack = 0

    def start(self):
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="lsd-constraints")
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=60.0)
            self._thread = None

    def push(self, kf) -> bool:
        ok = self.queue.push(kf)
        if ok:
            self._idle.clear()
            self._quiesce.clear()
        return ok

    def wait_until_drained(self, timeout: float = 120.0) -> bool:
        self._quiesce.set()
        return self._idle.wait(timeout)

    def _idle_retrack(self) -> bool:
        """One random old-keyframe re-track (SlamSystem.cpp:275-310).
        Returns True when a retrack was attempted and the list is still
        productive (== doneSomething)."""
        import time as _time
        graph = self.backend._graph
        if graph is None:
            return False
        retrack = graph.keyframes_for_retrack
        sys = self.backend.system
        if len(retrack) <= sys.cfg.keyframe.retrack_min_keyframes:
            return False
        idx = graph._rng.randrange(max(len(retrack) // 3, 1))
        kf = retrack.pop(idx)
        retrack.append(kf)
        sys.stats.bump("retrack_attempts")
        t0 = _time.perf_counter()
        found = graph.find_constraints_for_new_keyframe(
            kf, force_parent=False, use_fabmap=False,
            close_candidates_th=2.0)
        sys.stats.high_water("retrack_ms_max",
                            (_time.perf_counter() - t0) * 1000.0)
        if found == 0:
            self._failed_to_retrack += 1
        else:
            self._failed_to_retrack = 0
            sys.stats.bump("retrack_constraints_found", found)
            self.backend.signal_new_constraints()
        return self._failed_to_retrack < len(retrack) - 5

    def _loop(self):
        import time as _time
        while self._running:
            kf = self.queue.pop(0.05)
            if kf is None:
                if self.queue.size() == 0:
                    did_something = False
                    try:
                        if not self._quiesce.is_set():
                            did_something = self._idle_retrack()
                    finally:
                        if self.queue.size() == 0:
                            self._idle.set()
                    # pace the idle densifier: the reference wakes at most
                    # every 500 ms (SlamSystem.cpp:308) AND runs on its own
                    # core — here every retrack dispatches real device work
                    # that would otherwise queue ahead of the tracking
                    # thread's programs, so back-to-back retracks turn into
                    # multi-second tracking stalls on one chip
                    _time.sleep(0.2 if did_something else 0.5)
                continue
            try:
                graph = self.backend._ensure()
                sys = self.backend.system
                t0 = _time.perf_counter()
                n = graph.find_constraints_for_new_keyframe(
                    kf, force_parent=True)
                dt = (_time.perf_counter() - t0) * 1000.0
                sys.stats.bump("constraint_search_ms", dt)
                sys.stats.bump("constraint_searches")
                sys.stats.high_water("constraint_search_ms_max", dt)
                self._failed_to_retrack = 0
                if n > 0:
                    self.backend.signal_new_constraints()
            finally:
                if self.queue.size() == 0:
                    self._idle.set()


class OptimizationThread:
    """Runs pose-graph slices whenever constraints arrive
    (== optimizationThreadLoop, SlamSystem.cpp:359-381): 5-iteration
    slices until no change, results staged for the mapping thread's merge
    (mergeOptimizationOffset)."""

    def __init__(self, backend):
        self.backend = backend
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._wake = threading.Event()
        self._idle = threading.Event()
        self._idle.set()

    def start(self):
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="lsd-optimization")
        self._thread.start()

    def stop(self):
        self._running = False
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=60.0)
            self._thread = None

    def signal(self):
        self._idle.clear()
        self._wake.set()

    def wait_until_drained(self, timeout: float = 120.0) -> bool:
        return self._idle.wait(timeout)

    def _loop(self):
        while self._running:
            # slight chance of missing a signal otherwise -> timed wait,
            # like the reference's 2000 ms timed_wait (SlamSystem.cpp:366)
            fired = self._wake.wait(2.0)
            self._wake.clear()
            graph = self.backend._graph
            if graph is None or graph.pose_graph.n_edges == 0:
                self._idle.set()
                continue
            try:
                changed = graph.optimize_slices()
                if changed:
                    self.backend._have_unmerged = True
            finally:
                if not self._wake.is_set():
                    self._idle.set()
