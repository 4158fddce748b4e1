"""Benchmark: SE(3) tracking frames/s at 640x480 on one chip.

The reference's headline is "real-time" (30 fps input) semi-dense SLAM on a
laptop CPU (README.md:3-4, 235; BASELINE.md). This measures the per-frame
latency-critical path — a full pyramidal SE3 track (levels 4..1, LM, one
device->host pose transfer) on 640x480 — and reports frames/s with
vs_baseline = fps / 30 (the reference's required input rate).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp


def main():
    from lsd_slam_tpu.utils import synth
    from lsd_slam_tpu.frames import build_frame, build_depth_pyramid
    from lsd_slam_tpu.tracking import SE3Tracker, make_tracking_ref
    from lsd_slam_tpu import lie

    W, H = 640, 480
    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=0)
    pose_a = jnp.asarray([1, 0, 0, 0, 0, 0, 0], jnp.float32)
    pose_b = lie.se3_exp(jnp.asarray([0.01, -0.006, 0.008, 0.002, -0.003,
                                      0.001], jnp.float32))
    img_a, dep_a = synth.render(scene, cam, pose_a)
    img_b, _ = synth.render(scene, cam, pose_b)

    idepth = 1.0 / jnp.maximum(dep_a, 1e-6)
    ivar = jnp.full((H, W), 0.001, jnp.float32)
    ref = make_tracking_ref(build_frame(img_a, 5),
                            build_depth_pyramid(idepth, ivar, 5))
    tracker = SE3Tracker(cam)

    pyr_b = build_frame(img_b, 5)
    init = lie.se3_identity()

    # warmup / compile
    res = tracker.track(ref, pyr_b, init)
    res.ref_to_frame.block_until_ready()

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        res = tracker.track(ref, pyr_b, init)
    np.asarray(res.ref_to_frame)  # host transfer like the real pipeline
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "se3_tracking_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
