"""Shared jitted-program caches: constructing a second engine must reuse the
first engine's traced programs (the round-3 benchmark spent ~50 s/frame on
re-tracing per-instance jit closures — the caches kill that class of cost).
"""

import time

import numpy as np
import jax.numpy as jnp

from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import LSDConfig
from lsd_slam_tpu.system import SlamSystem, warmup
from lsd_slam_tpu.utils import synth

W, H = 160, 128


def _cam():
    return synth.default_camera(W, H)


def test_programs_shared_across_engine_instances():
    cam = _cam()
    cfg = LSDConfig(width=W, height=H)
    s1 = SlamSystem(cam, cfg, enable_slam=True)
    s2 = SlamSystem(cam, cfg, enable_slam=True)
    # the fused frame step, tracker program and every depth program must be
    # the SAME jitted callable object (same trace cache)
    assert s1._frame_step is s2._frame_step
    assert s1.tracker._fn is s2.tracker._fn
    assert s1.map._observe is s2.map._observe
    assert s1.map._create_kf is s2.map._create_kf
    assert s1.map._finalize is s2.map._finalize


def test_sim3_and_quick_programs_shared():
    from lsd_slam_tpu.tracking.sim3_tracker import Sim3Tracker, \
        get_sim3_program
    from lsd_slam_tpu.tracking.quick_tracker import QuickTracker
    cam = _cam()
    t1, t2 = Sim3Tracker(cam), Sim3Tracker(cam)
    assert (get_sim3_program(cam, t1.cfg, t1.sigma2, 4, 3)
            is get_sim3_program(cam, t2.cfg, t2.sigma2, 4, 3))
    q1, q2 = QuickTracker(cam), QuickTracker(cam)
    assert q1._track1 is q2._track1
    assert q1._trackN is q2._trackN


def test_warmup_makes_fresh_engine_hot():
    """After warmup(), a brand-new SlamSystem must run its first frames
    without tracing the frame path again: the second engine's first frame
    must not be drastically slower than its steady-state frames."""
    cam = _cam()
    cfg = LSDConfig(width=W, height=H)
    info = warmup(cam, cfg, enable_slam=True, n_switches=2)
    assert info["keyframes"] >= 2

    scene = synth.PlaneScene(seed=3)
    from lsd_slam_tpu import lie
    poses = [np.asarray(lie.se3_identity())]
    img0, dep0 = synth.render(scene, cam, jnp.asarray(poses[0]))

    sys_ = SlamSystem(cam, cfg, enable_slam=True)
    sys_.gt_depth_init(np.asarray(img0), np.asarray(dep0), 0, 0.0)
    times = []
    for i in range(1, 5):
        p = np.asarray(lie.se3_exp(jnp.asarray(
            [0.005 * i, 0, 0, 0, 0.001 * i, 0], jnp.float32)))
        img, _ = synth.render(scene, cam, jnp.asarray(p))
        t0 = time.perf_counter()
        sys_.track_frame(img, i, i / 30.0)
        times.append(time.perf_counter() - t0)
    # first frame warm: allow scheduler jitter but not a compile (compiles
    # of the fused step are ~10+ s on this host; steady frames are ~tens of
    # ms). 20x headroom keeps this robust on a noisy 2-vCPU runner.
    assert times[0] < 20 * max(min(times), 1e-3), times
