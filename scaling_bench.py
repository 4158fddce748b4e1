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

    print(json.dumps(out))


def main():
    results = []
    for k in (1, N_DEVICES):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{N_DEVICES}").strip()
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
    with open("SCALING.md", "w") as f:
        f.write(
            "# Back-end scaling: 1 vs N devices\n\n"
            f"Measured on {rn['devices']} virtual CPU devices "
            "(`--xla_force_host_platform_device_count`) on this host. "
            "On a TPU pod slice the same programs shard over chips with "
            "psum riding ICI; wall-clock here is bounded by the host's "
            "physical core count, so the honest signals are correctness "
            "at both mesh sizes and the per-device work reduction.\n\n"
            "| metric | 1 device | "
            f"{rn['devices']} devices |\n|---|---|---|\n"
            f"| distributed PGO step ({N_VERTICES} vtx, {N_EDGES} edges) "
            f"| {r1['pgo_step_ms']} ms | {rn['pgo_step_ms']} ms |\n"
            f"| edges per device | {r1['pgo_edges_per_device']} "
            f"| {rn['pgo_edges_per_device']} |\n"
            f"| batched candidate quick-track ({N_CANDIDATES} cands, "
            f"640x480 L4) | {r1['quicktrack_batch_ms']} ms "
            f"| {rn['quicktrack_batch_ms']} ms |\n"
            f"| candidates per device | {r1['candidates_per_device']} "
            f"| {rn['candidates_per_device']} |\n")
    print(json.dumps({"results": results}))
    print("wrote SCALING.md")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
