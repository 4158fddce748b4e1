"""Benchmark: end-to-end SLAM frames/s at 640x480 on one chip.

Headline metric = FULL pipeline fps (pyramid build + pyramidal SE3 track +
speculative observe sweep + EKF fuse + keyframe switches with propagate /
regularize / fill-holes + Sim3 constraint search + PGO) over a 300-frame
loop-closing synthetic sequence — the metric the reference's "real-time
semi-dense SLAM" headline is about (README.md:3-4, 235; vs_baseline =
fps / 30, the required input rate).

Modes measured (round 5):
  * seq — hz=0 blocking mode: fully deterministic, one host sync per
    frame. The reference's dataset `_hz:=0` semantics.
  * pipelined (PRODUCTION, the headline) — pipeline_lag=3 frames in
    flight with device-side pose chaining and async device->host scalar
    copies; constraint search + PGO on worker threads. This is the
    TPU-native answer to the reference's 4-thread overlap: on a
    remote-attached chip a blocking per-frame sync costs ~25 ms RTT,
    so the lag hides latency the way the reference's mapping-thread
    queue hides mapping cost.
  * threads — the reference-shaped threaded mode (tracking || mapping
    || constraints || optimization), with the round-5 queue batch-drain
    (multi-ref observe) fix; reported in extras.

HEADLINE HONESTY GATE (r4 post-mortem: the committed 11.68 fps headline
came from an async run that never finished a keyframe): the pipelined fps
is only the headline if that run actually built a map — keyframes at least
the sequential run's - 1, constraint edges present, and ATE comparable.
Otherwise the headline falls back to the sequential fps and
extras["headline_mode"] says so.

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
PIPE_LAG = int(os.environ.get("BENCH_PIPE_LAG", "3"))


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


def base_config(profile_sync=False, mode="seq"):
    from lsd_slam_tpu.config import LSDConfig

    cfg = LSDConfig(width=W, height=H)
    sequential = mode in ("seq", "seq_defer")
    lag = PIPE_LAG if mode == "pipelined" else 0
    return cfg.replace(system=dataclasses.replace(
        cfg.system, profile_sync=profile_sync, sequential=sequential,
        pipeline_lag=lag, defer_pgo_merge=(mode == "seq_defer")))


def run_slam(cam, imgs, dep0, gt_poses, cfg, enable_slam=True,
             pace_hz=0.0):
    """One full run; returns (system, per-frame wall times, switch flags,
    total wall seconds including queue drain).

    pace_hz > 0 feeds frames at camera cadence (the threaded reference
    architecture assumes >= 30 fps INPUT, README.md:235 — an unpaced
    free-run is an infinite-fps camera no deployment has); 0 = free-run
    (throughput measurement)."""
    from lsd_slam_tpu.system import SlamSystem
    from lsd_slam_tpu.utils.stats import device_sync

    sys_ = SlamSystem(cam, cfg, enable_slam=enable_slam)
    sys_.gt_depth_init(np.asarray(imgs[0]), dep0, 0, 0.0)
    frame_ms = []
    switched = []
    t_start = time.perf_counter()
    next_t = t_start
    kf_id = sys_.current_keyframe.id
    for i in range(1, N_FRAMES):
        if pace_hz > 0:
            now = time.perf_counter()
            if now < next_t:
                time.sleep(next_t - now)
                now = next_t
            next_t = max(next_t + 1.0 / pace_hz, now)
        t0 = time.perf_counter()
        sys_.track_frame(imgs[i], i, i / 30.0)
        frame_ms.append((time.perf_counter() - t0) * 1000.0)
        new_id = (sys_.current_keyframe.id
                  if sys_.current_keyframe is not None else kf_id)
        switched.append(new_id != kf_id)
        kf_id = new_id
    t_frames = time.perf_counter()
    sys_.block_until_mapped(120.0)
    if sys_.backend is not None:
        sys_.backend.wait_until_drained(120.0)
    device_sync()
    total_s = time.perf_counter() - t_start
    sys_._bench_drain_s = total_s - (t_frames - t_start)
    return sys_, np.asarray(frame_ms), np.asarray(switched), total_s


def run_health(sys_, poses):
    """Map-building health of a finished run (the r4 failure mode was an
    async run reported as the headline with zero keyframes built)."""
    from lsd_slam_tpu.utils.evaluate import ate_rmse

    traj = sys_.trajectory_array() if sys_.trajectory else np.zeros((0, 8))
    ate = ate_rmse(traj, poses[:len(traj)]) if len(traj) > 2 else None
    c = sys_.stats.counters
    edges = (sys_.backend.graph.pose_graph.n_edges
             if sys_.backend is not None and sys_.backend._graph is not None
             else 0)
    return dict(
        keyframes=len(sys_.keyframes),
        edges=int(edges),
        ate=round(float(ate), 5) if ate is not None else None,
        tracked=int(c.get("frames_tracked", 0)),
        tracking_good=bool(sys_.tracking_is_good),
        reinits=int(c.get("reinitialized_after_loss", 0)),
        created=int(c.get("keyframes_created", 0)),
        reactivated=int(c.get("keyframes_reactivated", 0)),
        queue_drops=int(sys_.mapping_thread.queue.dropped
                        if sys_.mapping_thread is not None else 0),
        mapping_batch_max=int(c.get("mapping_batch_max", 0)),
    )


def latency_extras(extras, prefix, fms, sw):
    extras[f"{prefix}_worst_frame_ms"] = round(float(fms.max()), 1)
    extras[f"{prefix}_p50_frame_ms"] = round(float(np.percentile(fms, 50)), 2)
    extras[f"{prefix}_p95_frame_ms"] = round(float(np.percentile(fms, 95)), 2)
    if sw.any():
        extras[f"{prefix}_kf_switch_ms"] = round(
            float(np.median(fms[sw])), 1)
        extras[f"{prefix}_kf_switch_max_ms"] = round(float(fms[sw].max()), 1)


def main():
    extras = {}
    bench_tracker_only(extras)

    cam, imgs, dep0, poses = make_loop_images()
    from lsd_slam_tpu.utils.evaluate import ate_rmse

    # ---- warmup: pre-compile the full engine program set (all observe
    # budget buckets, multi-ref drain buckets, switch path, Sim3 ranges,
    # reloc) into the shared module-level caches — the product API a
    # deployment would call once
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
    seq_fps = (N_FRAMES - 1) / total_seq
    extras["seq_fps"] = round(seq_fps, 2)
    latency_extras(extras, "seq", fms_seq, sw_seq)
    seq_health = run_health(sys_seq, poses)
    sys_seq.finalize()
    extras["seq_ate"] = seq_health["ate"]
    extras["seq_ate_after_final"] = round(float(ate_rmse(
        sys_seq.optimized_trajectory_array(),
        poses[:len(sys_seq.all_frame_poses)])), 5)

    # ---- PGO payoff measurement: constraints accumulate but merges land
    # only at finalize, so the track-time trajectory carries RAW drift and
    # the final optimization's correction is visible. (With continuous
    # merging — the production configuration, like the reference's
    # optimization thread — before/after is near-degenerate because the
    # graph is already converged when the final optimize runs.)
    sys_d, _, _, _ = run_slam(cam, imgs, dep0, poses,
                              base_config(mode="seq_defer"))
    traj_d = sys_d.trajectory_array()
    ate_before = ate_rmse(traj_d, poses[:len(traj_d)])
    sys_d.finalize()
    ate_after = ate_rmse(sys_d.optimized_trajectory_array(),
                         poses[:len(sys_d.all_frame_poses)])
    extras["pgo_defer_keyframes"] = len(sys_d.keyframes)
    if sys_d.backend is not None and sys_d.backend._graph is not None:
        pg = sys_d.backend.graph.pose_graph
        if pg.chi2_initial is not None:
            extras["pgo_chi2_initial"] = round(float(pg.chi2_initial), 1)
            extras["pgo_chi2_final"] = round(float(pg.chi2_final), 1)

    # ---- timed PRODUCTION run: pipelined frame loop + constraint/PGO
    # worker threads. Run TWICE and report the second: the worker threads
    # dispatch program variants (idle re-track candidate buckets) the
    # sequential warm run never hits, and those compiles belong to warmup,
    # not to the measurement.
    sys_p0, _, _, _ = run_slam(cam, imgs, dep0, poses,
                               base_config(mode="pipelined"))
    sys_p0.finalize()
    sys_pipe, fms_p, sw_p, total_p = run_slam(
        cam, imgs, dep0, poses, base_config(mode="pipelined"))
    pipe_fps = (N_FRAMES - 1) / total_p
    extras["pipelined_fps"] = round(pipe_fps, 2)
    extras["pipe_drain_s"] = round(sys_pipe._bench_drain_s, 2)
    for stage in sorted(sys_pipe.timers.n):
        extras[f"pipe_ms_{stage}"] = round(sys_pipe.timers.median(stage), 2)
    extras["pipeline_lag"] = PIPE_LAG
    latency_extras(extras, "pipe", fms_p, sw_p)
    pipe_health = run_health(sys_pipe, poses)
    c = sys_pipe.stats.counters
    if c.get("constraint_searches"):
        extras["pipe_cs_mean_ms"] = round(
            c["constraint_search_ms"] / c["constraint_searches"], 0)
        extras["pipe_cs_max_ms"] = round(c["constraint_search_ms_max"], 0)
    for st in (0, 1, 2):
        if c.get(f"sim3_stage{st}_n"):
            extras[f"pipe_sim3_s{st}_ms"] = round(
                c[f"sim3_stage{st}_ms"] / c[f"sim3_stage{st}_n"], 0)
    sys_pipe.finalize()
    pipe_ate_after = ate_rmse(
        sys_pipe.optimized_trajectory_array(),
        poses[:len(sys_pipe.all_frame_poses)])
    for k, v in pipe_health.items():
        extras[f"pipe_{k}"] = v
    extras["pipe_ate_after_pgo"] = (round(float(pipe_ate_after), 5)
                                    if pipe_ate_after is not None else None)

    # ---- reference-shaped threaded mode (tracking || mapping ||
    # constraints || optimization with queue batch-drain), fed at the
    # reference's 30 fps camera cadence: the claim measured here is
    # "sustains real-time input with a healthy map", reported as achieved
    # fps + drop/health extras
    sys_thr, fms_t, sw_t, total_t = run_slam(
        cam, imgs, dep0, poses, base_config(mode="threads"), pace_hz=30.0)
    extras["threads_fps"] = round((N_FRAMES - 1) / total_t, 2)
    extras["threads_p95_frame_ms"] = round(float(np.percentile(fms_t, 95)),
                                           2)
    thr_health = run_health(sys_thr, poses)
    ct = sys_thr.stats.counters
    for key in ("mapping_batches", "mapping_frames_consumed",
                "mapping_dropped_wrong_parent"):
        extras[f"threads_{key}"] = int(ct.get(key, 0))
    sys_thr.finalize()
    for k, v in thr_health.items():
        extras[f"threads_{k}"] = v

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
    extras["ate_after_pgo"] = round(float(ate_after), 5) \
        if ate_after is not None else None
    extras["keyframes"] = seq_health["keyframes"]
    extras["constraint_edges"] = seq_health["edges"]
    extras["n_frames"] = N_FRAMES
    extras["noise_sigma"] = NOISE
    extras["devices"] = len(jax.devices())

    # ---- HONESTY GATE: the pipelined fps is the headline only if that
    # run actually built a comparable map (r4 post-mortem)
    seq_ate = seq_health["ate"] if seq_health["ate"] is not None else 1e9
    pipe_ok = (
        pipe_health["keyframes"] >= max(2, seq_health["keyframes"] - 1)
        and pipe_health["edges"] > 0
        and pipe_health["tracking_good"]
        and pipe_health["reinits"] == 0
        and pipe_health["ate"] is not None
        and pipe_health["ate"] <= max(2.0 * seq_ate, seq_ate + 0.01))
    if pipe_ok and pipe_fps > seq_fps:
        fps = pipe_fps
        extras["headline_mode"] = "pipelined"
    elif pipe_ok:
        fps = seq_fps
        extras["headline_mode"] = "seq (pipelined healthy but slower)"
    else:
        fps = seq_fps
        extras["headline_mode"] = "seq (pipelined run failed health gate)"

    print(json.dumps({
        "metric": "e2e_slam_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
