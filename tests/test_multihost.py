"""Multi-host bring-up: jax.distributed across 2 OS processes.

SURVEY section 7 T6 / 2.11: distributed PGO must run across PROCESS
boundaries (DCN on a real pod), with graph topology exchanged over the
host channel. The test spawns 2 processes of 2 virtual CPU devices each
(gloo collectives — the standard way to exercise pod code without a pod),
optimizes a noisy loop graph on the 4-device global mesh, and checks the
result matches the same optimization run single-process on this test
session's local mesh.
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from tests.multihost_worker import make_graph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _single_process_reference(payload, num_iterations=12):
    from lsd_slam_tpu.parallel.multihost import (HostChannel,
                                                 multihost_pgo_optimize)
    chan = HostChannel(0, 1)
    return multihost_pgo_optimize(chan, payload, num_iterations)


@pytest.mark.slow
def test_two_process_pgo_matches_single_process(tmp_path):
    g = make_graph()
    payload = {k: v for k, v in g.items() if k not in ("n_real_edges", "gt")}

    # reference: same optimization on THIS process's local (8-device) mesh
    ref = _single_process_reference(payload)

    out_path = str(tmp_path / "multi.npy")
    coord_port, chan_port = 47123, 47124
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache_cpu"
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (2)

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(rank), "2", str(coord_port),
         str(chan_port), out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    multi = np.load(out_path)
    assert multi.shape == ref.shape

    # pose-by-pose agreement between the 2-process 4-device run and the
    # single-process run (different mesh sizes, different f32 reduction
    # orders -> tolerance, not bit-equality)
    from lsd_slam_tpu.lie import np_sim3 as nps
    for i in range(multi.shape[0]):
        d = nps.sim3_mul(nps.sim3_inverse(ref[i]), multi[i])
        assert nps.sim3_log_norm(d) < 2e-3, (i, nps.sim3_log_norm(d))

    # and the optimization actually moved toward ground truth
    gt, init = g["gt"], payload["poses"].astype(np.float64)
    def err(poses):
        return max(nps.sim3_log_norm(
            nps.sim3_mul(nps.sim3_inverse(gt[i]), poses[i]))
            for i in range(gt.shape[0]))
    assert err(multi) < 0.25 * err(init), (err(multi), err(init))


@pytest.mark.slow
def test_two_process_engine_matches_single_process(tmp_path):
    """The ENGINE runs multi-host (SURVEY 7 T6): rank 0 drives a full
    SlamSystem whose candidate quick-track fans out across 2 processes
    (keyframe-partitioned permaRef mirror) and whose PGO runs as one SPMD
    program over the 2-process global mesh; rank 1 serves. The resulting
    trajectory must match a single-process run of the same sequence."""
    from tests.multihost_engine_worker import run_engine

    # single-process reference in THIS process
    traj_ref, kf_ref, edges_ref, gt = run_engine(multihost=None)

    worker = os.path.join(REPO, "tests", "multihost_engine_worker.py")
    out_path = str(tmp_path / "engine.npz")
    coord_port, chan_port = 47133, 47134
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache_cpu"
    env.pop("XLA_FLAGS", None)  # workers set their own device count (2)

    procs = [subprocess.Popen(
        [sys.executable, worker, str(rank), "2", str(coord_port),
         str(chan_port), out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    got = np.load(out_path)
    assert int(got["n_kf"]) == kf_ref, (int(got["n_kf"]), kf_ref)
    assert int(got["n_edges"]) == edges_ref, \
        (int(got["n_edges"]), edges_ref)
    traj = got["traj"]
    assert traj.shape == traj_ref.shape
    # track-time trajectories agree tightly (PGO solver differs: SPMD CG
    # vs dense, so allow small numeric slack through the merge path)
    pos_diff = np.linalg.norm(traj[:, 4:7] - traj_ref[:, 4:7], axis=1).max()
    assert pos_diff < 5e-3, pos_diff
