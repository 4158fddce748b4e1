"""Keyframe-throughput scaling: back-end work at 1 vs N devices.

Measures the two multi-chip paths the engine dispatches (the constraint
pipeline's sharded candidate quick-track and the edge-sharded distributed
PGO step) on a mesh of 1 vs N devices and writes SCALING.md.

On real multi-chip hardware the mesh axis is TPU chips over ICI; in this
environment it is N virtual CPU devices (XLA_FLAGS
--xla_force_host_platform_device_count), so wall-clock speedups are bounded
by the number of PHYSICAL cores — the honest signal here is that the
sharded programs run correctly at both mesh sizes and that per-device work
(edges/chip, candidates/chip) drops by N. Run:

    python scaling_bench.py            # parent: spawns 1- and N-device runs
    python scaling_bench.py worker K   # one measurement at mesh size K
"""

import json
import os
import subprocess
import sys
import time

N_DEVICES = int(os.environ.get("SCALING_DEVICES", "8"))
N_CANDIDATES = 64
N_VERTICES = 512
N_EDGES = 4096
PGO_ITERS = 10
TRACK_REPEATS = 5


def worker(k: int):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lsd_slam_tpu.parallel import (make_mesh, distributed_pgo_cg_step,
                                       sharded_quick_track)
    from lsd_slam_tpu.tracking.quick_tracker import QuickTracker
    from lsd_slam_tpu.tracking.reference import PointSet, compact_points
    from lsd_slam_tpu.ops.interp import quad_pack
    from lsd_slam_tpu.camera import Camera
    from lsd_slam_tpu.lie import np_sim3 as nps

    assert len(jax.devices()) >= k, (len(jax.devices()), k)
    mesh = make_mesh(k)
    rng = np.random.default_rng(0)
    out = {"devices": k}

    # ---- distributed PGO: the large-graph CG step over sharded edges ----
    poses = np.tile(nps.sim3_identity(), (N_VERTICES, 1)).astype(np.float32)
    poses[:, 4] = rng.normal(0, 0.05, N_VERTICES)
    efrom = rng.integers(0, N_VERTICES - 1, N_EDGES).astype(np.int32)
    eto = ((efrom + 1 + rng.integers(0, 20, N_EDGES))
           % N_VERTICES).astype(np.int32)
    meas_inv = np.tile(nps.sim3_identity(), (N_EDGES, 1)).astype(np.float32)
    info = np.tile(np.eye(7, dtype=np.float32), (N_EDGES, 1, 1))
    deltas = np.full(N_EDGES, 1e6, np.float32)
    fixed = np.zeros(N_VERTICES, bool)
    fixed[0] = True
    step = distributed_pgo_cg_step(mesh, N_VERTICES, max_cg_iters=100)
    args = (jnp.asarray(fixed), jnp.asarray(efrom), jnp.asarray(eto),
            jnp.asarray(meas_inv), jnp.asarray(info), jnp.asarray(deltas),
            jnp.float32(1e-6))
    p = jnp.asarray(poses)
    step(p, *args)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(PGO_ITERS):
        newp, chi2, dmax = step(p, *args)
    newp.block_until_ready()
    dt = time.perf_counter() - t0
    out["pgo_step_ms"] = round(dt / PGO_ITERS * 1000, 2)
    out["pgo_edges_per_device"] = N_EDGES // k

    # ---- sharded candidate quick-track (constraint search / reloc) ----
    width, height = 640, 480
    cam = Camera(fx=0.7 * width, fy=0.7 * width, cx=(width - 1) / 2,
                 cy=(height - 1) / 2, width=width, height=height)
    qt = QuickTracker(cam)
    l = qt.level
    h4, w4 = height >> l, width >> l
    imgs = rng.uniform(0, 255, (N_CANDIDATES, h4, w4)).astype(np.float32)

    def pointset(kk):
        zeros = np.zeros_like(imgs[kk])
        fields = jnp.asarray(np.stack(
            [imgs[kk], zeros, zeros,
             np.full_like(imgs[kk], 0.5), np.full_like(imgs[kk], 0.01)],
            axis=-1).reshape(-1, 5))
        idx, vals, slot_valid, n_valid = compact_points(
            jnp.ones((h4, w4), bool), fields, h4 * w4)
        return PointSet(idx=idx, ival=vals[:, 0], gx=vals[:, 1],
                        gy=vals[:, 2], idp=vals[:, 3], ivr=vals[:, 4],
                        valid=slot_valid, n_valid=n_valid)

    refs = __import__("jax").tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[pointset(kk) for kk in range(N_CANDIDATES)])
    frame_quad = quad_pack((jnp.asarray(imgs[0]),
                            jnp.zeros((h4, w4), jnp.float32),
                            jnp.zeros((h4, w4), jnp.float32)))
    inits = jnp.asarray(np.tile(
        np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (N_CANDIDATES, 1)))
    fn = sharded_quick_track(mesh, qt)
    fn(refs, frame_quad, inits)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(TRACK_REPEATS):
        r = fn(refs, frame_quad, inits)
    r[0].block_until_ready()
    dt = time.perf_counter() - t0
    out["quicktrack_batch_ms"] = round(dt / TRACK_REPEATS * 1000, 2)
    out["candidates_per_device"] = N_CANDIDATES // k

    # ---- dense distributed PGO step (the <=320-vertex engine path) ----
    from lsd_slam_tpu.parallel import distributed_pgo_step
    ND = 128
    dposes = np.tile(nps.sim3_identity(), (ND, 1)).astype(np.float32)
    dposes[:, 4] = rng.normal(0, 0.05, ND)
    NE_D = 1024
    defrom = rng.integers(0, ND - 1, NE_D).astype(np.int32)
    deto = ((defrom + 1 + rng.integers(0, 20, NE_D)) % ND).astype(np.int32)
    dmeas = np.tile(nps.sim3_identity(), (NE_D, 1)).astype(np.float32)
    dinfo = np.tile(np.eye(7, dtype=np.float32), (NE_D, 1, 1))
    ddel = np.full(NE_D, 1e6, np.float32)
    dfixed = np.zeros(ND, bool)
    dfixed[0] = True
    dstep = distributed_pgo_step(mesh, ND)
    dargs = (jnp.asarray(dfixed), jnp.asarray(defrom), jnp.asarray(deto),
             jnp.asarray(dmeas), jnp.asarray(dinfo), jnp.asarray(ddel),
             jnp.float32(1e-6))
    dp = jnp.asarray(dposes)
    dstep(dp, *dargs)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(PGO_ITERS):
        dnewp, _, _ = dstep(dp, *dargs)
    dnewp.block_until_ready()
    out["pgo_dense_step_ms"] = round(
        (time.perf_counter() - t0) / PGO_ITERS * 1000, 2)

    # ---- ENGINE-level: keyframes/s through the live SlamSystem ----
    # (constraint search + PGO run the sharded paths when the mesh has
    # more than one device; 1-device worker runs the single-chip paths)
    import dataclasses as _dc
    from lsd_slam_tpu.config import LSDConfig, KeyframeConfig
    from lsd_slam_tpu.system import SlamSystem
    from lsd_slam_tpu.utils import synth
    from lsd_slam_tpu import lie as _lie

    W2, H2 = 160, 128
    N2 = 36
    cam2 = synth.default_camera(W2, H2)
    scene = synth.PlaneScene(seed=13)
    poses2 = []
    for i in range(N2):
        a = i / (N2 - 1)
        x = 0.55 * np.sin(np.pi * a)
        yaw = 0.06 * np.sin(2 * np.pi * a)
        t = np.asarray(_lie.se3_exp(jnp.asarray(
            [0, 0, 0, 0, yaw, 0], jnp.float32)))
        c2w = np.concatenate([t[0:4], [x, 0.0, 0.015 * np.sin(np.pi * a)]])
        poses2.append(np.asarray(_lie.se3_inverse(jnp.asarray(
            c2w.astype(np.float32)))))
    imgs2, deps2 = [], []
    for i in range(N2):
        im, de = synth.render(scene, cam2, jnp.asarray(poses2[i]))
        imgs2.append(np.asarray(im))
        deps2.append(np.asarray(de))
    cfg2 = LSDConfig(width=W2, height=H2).replace(
        keyframe=KeyframeConfig(kf_dist_weight=25.0, kf_usage_weight=6.0,
                                initialization_phase_count=1,
                                min_num_mapped=2))

    def engine_run():
        backend_s = [0.0]
        s = SlamSystem(cam2, cfg2, enable_slam=True)
        s.gt_depth_init(imgs2[0], deps2[0], 0, 0.0)
        # time the back-end (constraint search + PGO) via wrappers
        orig_on_new = s.backend.on_new_keyframe

        def timed_on_new(kf):
            t0 = time.perf_counter()
            orig_on_new(kf)
            backend_s[0] += time.perf_counter() - t0
        s.backend.on_new_keyframe = timed_on_new
        t0 = time.perf_counter()
        for i in range(1, N2):
            s.track_frame(imgs2[i], i, i / 30.0)
        s.finalize()
        total = time.perf_counter() - t0
        return s, total, backend_s[0]

    engine_run()  # warm: compiles the whole engine set at this mesh size
    s, total, backend_t = engine_run()
    out["engine_frames"] = N2 - 1
    out["engine_keyframes"] = len(s.keyframes)
    out["engine_edges"] = s.backend.graph.pose_graph.n_edges
    out["engine_total_s"] = round(total, 2)
    out["engine_backend_s"] = round(backend_t, 2)
    out["engine_kf_per_s"] = round(
        len(s.keyframes) / max(backend_t, 1e-9), 2)

    print(json.dumps(out))


def main():
    results = []
    for k in (1, N_DEVICES):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{k}").strip()
        env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache_cpu"
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "worker", str(k)],
                           capture_output=True, text=True, env=env,
                           timeout=1800)
        line = [ln for ln in p.stdout.strip().splitlines()
                if ln.startswith("{")]
        if not line:
            raise SystemExit(f"worker {k} failed:\n{p.stderr[-2000:]}")
        results.append(json.loads(line[-1]))

    r1, rn = results
    nd = rn["devices"]
    slower_cg = rn["pgo_step_ms"] / max(r1["pgo_step_ms"], 1e-9)
    slower_dense = (rn["pgo_dense_step_ms"]
                    / max(r1["pgo_dense_step_ms"], 1e-9))
    with open("SCALING.md", "w") as f:
        f.write(
            "# Back-end scaling: 1 vs N devices\n\n"
            f"Measured on {nd} virtual CPU devices "
            "(`--xla_force_host_platform_device_count`) on this host "
            "(2 physical vCPUs). On a TPU pod slice the same programs "
            "shard over chips with collectives riding ICI; this host "
            "cannot show that speedup — an N-way virtual mesh on 2 cores "
            "adds partitioning and collective overhead without adding "
            "compute. The table below is the HONEST record of that: the "
            f"component steps REGRESS when distributed here ({slower_cg:.1f}x "
            f"slower CG step, {slower_dense:.1f}x slower dense step at "
            f"{nd} virtual devices). That measured crossover is exactly "
            "why the engine gates distribution on size "
            "(`PoseGraph.mesh_min_edges`, "
            "`KeyFrameGraph.mesh_min_lanes_per_device`): with the default "
            "gates the live engine takes the single-device paths at these "
            "graph sizes even when a mesh is configured, so the ENGINE "
            "row shows parity — the distributed paths stay correct "
            "(tests force the gates to 0) and per-device work drops by N, "
            "which is what transfers to real chips.\n\n"
            "| metric | 1 device | "
            f"{rn['devices']} devices |\n|---|---|---|\n"
            f"| distributed PGO CG step ({N_VERTICES} vtx, {N_EDGES} "
            f"edges) | {r1['pgo_step_ms']} ms | {rn['pgo_step_ms']} ms |\n"
            f"| distributed PGO dense step (128 vtx, 1024 edges) "
            f"| {r1['pgo_dense_step_ms']} ms "
            f"| {rn['pgo_dense_step_ms']} ms |\n"
            f"| edges per device | {r1['pgo_edges_per_device']} "
            f"| {rn['pgo_edges_per_device']} |\n"
            f"| batched candidate quick-track ({N_CANDIDATES} cands, "
            f"640x480 L4) | {r1['quicktrack_batch_ms']} ms "
            f"| {rn['quicktrack_batch_ms']} ms |\n"
            f"| candidates per device | {r1['candidates_per_device']} "
            f"| {rn['candidates_per_device']} |\n"
            f"| ENGINE keyframe back-end throughput (160x128, "
            f"{r1['engine_frames']} frames) | {r1['engine_kf_per_s']} "
            f"KF/s | {rn['engine_kf_per_s']} KF/s |\n"
            f"| engine keyframes / edges | {r1['engine_keyframes']} / "
            f"{r1['engine_edges']} | {rn['engine_keyframes']} / "
            f"{rn['engine_edges']} |\n"
            f"| engine back-end seconds | {r1['engine_backend_s']} "
            f"| {rn['engine_backend_s']} |\n\n"
            "The ENGINE row runs the full live SlamSystem (tracking + "
            "mapping + constraint search + PGO) on the same synthetic "
            "loop at both mesh sizes; back-end seconds is time inside "
            "on_new_keyframe (candidate search, Sim3 verification, PGO "
            "slices). Because the size gates keep distribution off below "
            "the measured crossover, parity between the ENGINE columns is "
            "the expected-good result on this host — a regression there "
            "would mean the gates failed. Real speedup requires real "
            "chips and graphs past the gate sizes (>= "
            "`mesh_min_edges` = 1024 edges for PGO, >= 4 candidates per "
            "device for quick-track batches).\n")
    print(json.dumps({"results": results}))
    print("wrote SCALING.md")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
