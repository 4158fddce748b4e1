"""Benchmark: end-to-end SLAM frames/s at 640x480 on one chip.

Headline metric = FULL pipeline fps (pyramid build + pyramidal SE3 track +
speculative observe sweep + EKF fuse + keyframe switches with propagate /
regularize / fill-holes + Sim3 constraint search + PGO) over a 300-frame
loop-closing synthetic sequence — the metric the reference's "real-time
semi-dense SLAM" headline is about (README.md:3-4, 235; vs_baseline =
fps / 30, the required input rate).

Measurement design (round 4): every engine program lives in a module-level
cache keyed on (camera, config) — see system/warmup.py — so the warm run
compiles the whole program set ONCE and the timed runs (fresh engine
instances, as production restarts would be) execute fully hot. The timed
numbers contain zero trace/compile:
  * e2e fps both in sequential (hz=0, deterministic) and async (the
    reference's threaded production configuration) modes;
  * worst_frame_ms + p50/p95 per-frame latency of the timed run;
  * kf_switch_ms: median/max wall time of frames that performed a keyframe
    switch (finalize + propagate + constraint search + PGO inline in
    sequential mode; bounded by the worker threads in async mode);
  * per-stage device-truthful ms (profile_sync run) as steady-state
    medians — first-call compile samples are excluded by StageTimers;
  * host_syncs_per_frame — 1.0 on non-switch frames by design;
  * ate_before_pgo / ate_after_pgo — trajectory error at track time vs
    recomputed through the optimized pose graph (loop-closure evidence);
  * keyframes / constraint edges of the run.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

import dataclasses
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
NOISE = float(os.environ.get("BENCH_NOISE", "1.5"))


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
    scene = synth.BenchScene(seed=0)
    poses = synth.bench_trajectory(N_FRAMES)
    # render on device; keep frames in HBM (the input pipeline hands the
    # engine device arrays, as a real capture pipeline on TPU would)
    imgs = []
    dep0 = None
    for i in range(N_FRAMES):
        img, dep = synth.render_realistic(scene, cam, jnp.asarray(poses[i]),
                                          frame_index=i, noise_sigma=NOISE)
        imgs.append(img)
        if i == 0:
            dep0 = np.asarray(dep)
    return cam, imgs, dep0, poses


def base_config(profile_sync=False, sequential=True):
    from lsd_slam_tpu.config import LSDConfig

    cfg = LSDConfig(width=W, height=H)
    return cfg.replace(system=dataclasses.replace(
        cfg.system, profile_sync=profile_sync, sequential=sequential))


def run_slam(cam, imgs, dep0, gt_poses, cfg, enable_slam=True):
    """One full run; returns (system, per-frame wall times, switch flags,
    total wall seconds including queue drain)."""
    from lsd_slam_tpu.system import SlamSystem
    from lsd_slam_tpu.utils.stats import device_sync

    sys_ = SlamSystem(cam, cfg, enable_slam=enable_slam)
    sys_.gt_depth_init(np.asarray(imgs[0]), dep0, 0, 0.0)
    frame_ms = []
    switched = []
    t_start = time.perf_counter()
    kf_id = sys_.current_keyframe.id
    for i in range(1, N_FRAMES):
        t0 = time.perf_counter()
        sys_.track_frame(imgs[i], i, i / 30.0)
        frame_ms.append((time.perf_counter() - t0) * 1000.0)
        new_id = (sys_.current_keyframe.id
                  if sys_.current_keyframe is not None else kf_id)
        switched.append(new_id != kf_id)
        kf_id = new_id
    if sys_.mapping_thread is not None:
        sys_.block_until_mapped(120.0)
        if sys_.backend is not None:
            sys_.backend.wait_until_drained(120.0)
    device_sync()
    total_s = time.perf_counter() - t_start
    return sys_, np.asarray(frame_ms), np.asarray(switched), total_s


def main():
    extras = {}
    bench_tracker_only(extras)

    cam, imgs, dep0, poses = make_loop_images()
    from lsd_slam_tpu.utils.evaluate import ate_rmse

    # ---- warmup: pre-compile the full engine program set (all observe
    # budget buckets, switch path, Sim3 ranges, reloc) into the shared
    # module-level caches — the product API a deployment would call once
    from lsd_slam_tpu.system import warmup
    t0 = time.perf_counter()
    winfo = warmup(cam, base_config(), n_switches=3)
    extras["warmup_s"] = round(time.perf_counter() - t0, 1)

    # ---- warm run: compiles anything the scripted warmup missed AND
    # records device-truthful per-stage steady-state medians
    t0 = time.perf_counter()
    sys_warm, _, _, _ = run_slam(cam, imgs, dep0, poses,
                                 base_config(profile_sync=True))
    extras["warm_run_s"] = round(time.perf_counter() - t0, 1)
    for stage in sorted(sys_warm.timers.n):
        extras[f"stage_ms_{stage}"] = round(sys_warm.timers.median(stage), 2)
    sys_warm.finalize()

    # ---- timed sequential run (hz=0 deterministic mode): fresh engine,
    # fully hot from the shared caches
    sys_seq, fms_seq, sw_seq, total_seq = run_slam(
        cam, imgs, dep0, poses, base_config())
    extras["seq_fps"] = round((N_FRAMES - 1) / total_seq, 2)
    extras["seq_worst_frame_ms"] = round(float(fms_seq.max()), 1)
    if sw_seq.any():
        extras["seq_kf_switch_ms"] = round(
            float(np.median(fms_seq[sw_seq])), 1)
    traj = sys_seq.trajectory_array()
    ate_before = ate_rmse(traj, poses[:len(traj)])
    sys_seq.finalize()
    ate_after = ate_rmse(sys_seq.optimized_trajectory_array(),
                         poses[:len(sys_seq.all_frame_poses)])

    # ---- timed async run (production configuration: tracking || mapping
    # || constraint search || optimization threads). Run TWICE and report
    # the second: the async configuration dispatches program variants the
    # sequential warm run never hits (idle re-track candidate buckets),
    # and those compiles belong to warmup, not to the measurement.
    sys_w2, _, _, _ = run_slam(
        cam, imgs, dep0, poses, base_config(sequential=False))
    sys_w2.finalize()
    sys_a, fms_a, sw_a, total_a = run_slam(
        cam, imgs, dep0, poses, base_config(sequential=False))
    fps = (N_FRAMES - 1) / total_a
    extras["worst_frame_ms"] = round(float(fms_a.max()), 1)
    extras["p50_frame_ms"] = round(float(np.percentile(fms_a, 50)), 2)
    extras["p95_frame_ms"] = round(float(np.percentile(fms_a, 95)), 2)
    if sw_a.any():
        extras["kf_switch_ms"] = round(float(np.median(fms_a[sw_a])), 1)
        extras["kf_switch_max_ms"] = round(float(fms_a[sw_a].max()), 1)
    sys_a.finalize()

    # ---- VO-only drift baseline: the same sequence without the SLAM
    # back-end (no constraints / PGO / re-activation) — the gap between
    # ate_vo and the SLAM ATEs is the measured value of loop closure
    sys_vo, _, _, _ = run_slam(cam, imgs, dep0, poses, base_config(),
                               enable_slam=False)
    traj_vo = sys_vo.trajectory_array()
    extras["ate_vo"] = round(float(ate_rmse(traj_vo,
                                            poses[:len(traj_vo)])), 5)
    sys_vo.finalize()

    frames = sys_seq.stats.counters.get("frames_tracked", 1)
    extras["host_syncs_per_frame"] = round(
        sys_seq.stats.counters.get("host_syncs", 0) / max(frames, 1), 3)
    extras["ate_before_pgo"] = round(float(ate_before), 5) \
        if ate_before is not None else None
    extras["ate_after_pgo"] = round(float(ate_after), 5)
    extras["keyframes"] = len(sys_seq.keyframes)
    extras["constraint_edges"] = (sys_seq.backend.graph.pose_graph.n_edges
                                  if sys_seq.backend is not None else 0)
    extras["n_frames"] = N_FRAMES
    extras["noise_sigma"] = NOISE
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
