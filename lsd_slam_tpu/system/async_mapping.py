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
            try:
                sys.latest_tracked = tracked
                sys.do_mapping_iteration()
            finally:
                if self.queue.size() == 0:
                    self._idle.set()
