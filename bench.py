"""Benchmark: end-to-end SLAM frames/s at 640x480 on one chip.

Headline metric = FULL pipeline fps (pyramid build + pyramidal SE3 track +
speculative observe sweep + EKF fuse + keyframe switches with propagate /
regularize / fill-holes + Sim3 constraint search + PGO) over a 300-frame
loop-closing synthetic sequence, sequential (hz=0) mode — the metric the
reference's "real-time semi-dense SLAM" headline is about (README.md:3-4,
235; vs_baseline = fps / 30, the required input rate).

extras carries the supporting evidence:
  * se3_tracking_fps_640x480 — the round-1/2 tracker-only number;
  * per-stage device ms (profile_sync run: track / observe / finalize);
  * host_syncs_per_frame — must be 1.0 on non-switch frames;
  * ate_before_pgo / ate_after_pgo — trajectory error at track time vs
    recomputed through the optimized pose graph (loop closure evidence);
  * keyframes, constraint edges of the run.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "extras"}.
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

W, H = 640, 480
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "300"))


def bench_tracker_only(extras):
    from lsd_slam_tpu.utils import synth
    from lsd_slam_tpu.frames import build_frame, build_depth_pyramid
    from lsd_slam_tpu.tracking import SE3Tracker, make_tracking_ref
    from lsd_slam_tpu import lie

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

    res = tracker.track(ref, pyr_b, init)  # warmup / compile
    res.ref_to_frame.block_until_ready()
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        res = tracker.track(ref, pyr_b, init)
    np.asarray(res.ref_to_frame)
    dt = time.perf_counter() - t0
    extras["se3_tracking_fps_640x480"] = round(n / dt, 2)


def make_loop_images():
    from lsd_slam_tpu.utils import synth

    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=0)
    poses = synth.loop_trajectory(N_FRAMES)
    # render on device; keep frames in HBM (the input pipeline hands the
    # engine device arrays, as a real capture pipeline on TPU would)
    imgs = []
    dep0 = None
    for i in range(N_FRAMES):
        img, dep = synth.render(scene, cam, jnp.asarray(poses[i]))
        imgs.append(img)
        if i == 0:
            dep0 = np.asarray(dep)
    return cam, imgs, dep0, poses


def run_slam(cam, imgs, dep0, gt_poses, profile_sync):
    import dataclasses
    from lsd_slam_tpu.config import LSDConfig
    from lsd_slam_tpu.system import SlamSystem
    from lsd_slam_tpu.utils.evaluate import ate_rmse
    from lsd_slam_tpu.utils.stats import device_sync

    cfg = LSDConfig(width=W, height=H)
    cfg = cfg.replace(system=dataclasses.replace(
        cfg.system, profile_sync=profile_sync))
    sys_ = SlamSystem(cam, cfg, enable_slam=True)
    sys_.gt_depth_init(np.asarray(imgs[0]), dep0, 0, 0.0)
    t0 = time.perf_counter()
    for i in range(1, N_FRAMES):
        sys_.track_frame(imgs[i], i, i / 30.0)
    # make sure all device work drained before stopping the clock
    device_sync()
    dt = time.perf_counter() - t0
    traj = sys_.trajectory_array()
    ate_before = ate_rmse(traj, gt_poses[:len(traj)])
    sys_.finalize()
    return sys_, dt, ate_before


def main():
    extras = {}
    bench_tracker_only(extras)

    cam, imgs, dep0, poses = make_loop_images()

    # warm run: compiles every engine program AND records device-truthful
    # per-stage ms (profile_sync mode)
    sys_warm, _, _ = run_slam(cam, imgs, dep0, poses, profile_sync=True)
    for stage, ms in sorted(sys_warm.timers.ms.items()):
        extras[f"stage_ms_{stage}"] = round(ms, 2)

    # timed run: everything compiled, async dispatch (production mode)
    sys_, dt, ate_before = run_slam(cam, imgs, dep0, poses,
                                    profile_sync=False)
    fps = (N_FRAMES - 1) / dt

    from lsd_slam_tpu.utils.evaluate import ate_rmse
    ate_after = ate_rmse(sys_.optimized_trajectory_array(),
                         poses[:len(sys_.all_frame_poses)])

    frames = sys_.stats.counters.get("frames_tracked", 1)
    extras["host_syncs_per_frame"] = round(
        sys_.stats.counters.get("host_syncs", 0) / max(frames, 1), 3)
    extras["ate_before_pgo"] = round(float(ate_before), 5) \
        if ate_before is not None else None
    extras["ate_after_pgo"] = round(float(ate_after), 5)
    extras["keyframes"] = len(sys_.keyframes)
    extras["constraint_edges"] = (sys_.backend.graph.pose_graph.n_edges
                                  if sys_.backend is not None else 0)
    extras["n_frames"] = N_FRAMES
    extras["devices"] = len(jax.devices())

    print(json.dumps({
        "metric": "e2e_slam_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
