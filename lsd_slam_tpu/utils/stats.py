"""Runtime observability: event counters + EWMA stage timings.

== RunningStats (settings.h:259-352) and the per-stage EWMA ms/Hz tracking
sprinkled through SlamSystem/DepthMap (SURVEY.md section 5.1). Counters are
plain ints fed from the jitted sweeps' stats dicts; timers wrap host-side
dispatch+block windows.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class RunningStats:
    """Event counters, merged from device stats dicts per iteration."""

    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)

    def add(self, prefix: str, stats: dict):
        for k, v in stats.items():
            self.counters[f"{prefix}_{k}"] += float(v)

    def bump(self, key: str, n: float = 1):
        self.counters[key] += n

    def snapshot(self) -> Dict[str, float]:
        return dict(self.counters)

    def reset(self):
        self.counters.clear()

    def format(self, prefix: str = "") -> str:
        items = sorted(k for k in self.counters if k.startswith(prefix))
        return "; ".join(f"{k}={self.counters[k]:.0f}" for k in items)


def device_sync():
    """Barrier for profiling: a trivial computation enqueued after pending
    work completes only once that work has drained (single-stream order),
    so wall-clock around it measures device time, not dispatch time."""
    import jax.numpy as jnp
    jnp.zeros(()).block_until_ready()


class StageTimers:
    """EWMA wall-clock per stage (SlamSystem.h:115-118, DepthMap.h:87-93:
    ms = 0.9*ms + 0.1*dt).

    By default the timers measure host dispatch windows (cheap, async-
    friendly — like the reference's gettimeofday pairs). With a `sync`
    callable (profiling mode, SystemConfig.profile_sync) every stage exit
    blocks until the device drained, so the numbers are true per-stage
    device cost (SURVEY section 5.1)."""

    def __init__(self, alpha: float = 0.9, sync=None):
        self.alpha = alpha
        self.sync = sync
        self.ms: Dict[str, float] = defaultdict(float)
        self.n: Dict[str, int] = defaultdict(int)

    @contextmanager
    def time(self, stage: str):
        if self.sync is not None:
            self.sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync is not None:
                self.sync()
            dt = (time.perf_counter() - t0) * 1000.0
            if self.n[stage] == 0:
                self.ms[stage] = dt
            else:
                self.ms[stage] = self.alpha * self.ms[stage] \
                    + (1 - self.alpha) * dt
            self.n[stage] += 1

    def summary(self) -> str:
        """One line like the reference's 1-Hz timing printout
        (SlamSystem.cpp:639-649)."""
        return ", ".join(
            f"{k}: {self.ms[k]:.1f}ms ({self.n[k]}x)"
            for k in sorted(self.ms))
