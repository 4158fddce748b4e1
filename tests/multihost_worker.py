"""Worker process for the multi-host (jax.distributed) test.

Launched N times by tests/test_multihost.py, each with its own process_id
and 2 virtual CPU devices; together they form a 2N-device global mesh.
Rank 0 owns the graph (the host's keyframe bookkeeping), broadcasts the
edge topology over the HostChannel (SURVEY 2.11's host RPC), and every
rank runs the same SPMD distributed-PGO program over the global mesh.
"""

import os
import sys

import numpy as np


def make_graph(seed: int = 5, n: int = 24, extra_edges: int = 8,
               pad_to: int = 32):
    """Deterministic noisy loop pose graph (chain + closures), padded with
    zero-information self-loops so E divides any test mesh size."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from lsd_slam_tpu.lie import np_sim3 as nps

    rng = np.random.default_rng(seed)
    # ground truth: a circle-ish trajectory
    gt = []
    for i in range(n):
        a = 2 * np.pi * i / n * 0.5
        t = np.array([np.cos(a) - 1.0, 0.1 * np.sin(2 * a), np.sin(a)])
        tang = np.concatenate([t, [0, a * 0.3, 0], [0.0]])
        gt.append(nps.sim3_exp(tang))
    gt = np.stack(gt)

    # initial estimates: ground truth + noise (except the fixed first)
    poses = gt.copy()
    for i in range(1, n):
        noise = np.concatenate([rng.normal(0, 0.05, 3),
                                rng.normal(0, 0.02, 3),
                                rng.normal(0, 0.01, 1)])
        poses[i] = nps.sim3_mul(nps.sim3_exp(noise), poses[i])

    efrom, eto, meas_inv, infos, deltas = [], [], [], [], []

    def add_edge(i, j):
        # measurement = true j->i transform (second-to-first convention)
        m = nps.sim3_mul(nps.sim3_inverse(gt[i]), gt[j])
        efrom.append(i)
        eto.append(j)
        meas_inv.append(nps.sim3_inverse(m))
        infos.append(np.eye(7))
        deltas.append(1e6)

    for i in range(n - 1):
        add_edge(i, i + 1)
    for _ in range(extra_edges):
        i = int(rng.integers(0, n - 2))
        j = int(rng.integers(i + 1, n))
        add_edge(i, j)
    e = len(efrom)
    while len(efrom) < pad_to:
        efrom.append(0)
        eto.append(0)
        meas_inv.append(nps.sim3_identity())
        infos.append(np.zeros((7, 7)))
        deltas.append(1e6)

    fixed = np.zeros(n, bool)
    fixed[0] = True
    return dict(
        poses=np.asarray(poses, np.float32),
        fixed=fixed,
        efrom=np.asarray(efrom, np.int32),
        eto=np.asarray(eto, np.int32),
        meas_inv=np.asarray(meas_inv, np.float32),
        info=np.asarray(infos, np.float32),
        delta=np.asarray(deltas, np.float32),
        n_real_edges=e,
        gt=gt,
    )


def main():
    rank = int(sys.argv[1])
    world = int(sys.argv[2])
    coord_port = int(sys.argv[3])
    chan_port = int(sys.argv[4])
    out_path = sys.argv[5]

    from lsd_slam_tpu.parallel.multihost import (
        init_multihost, HostChannel, multihost_pgo_optimize)

    init_multihost(f"127.0.0.1:{coord_port}", world, rank,
                   local_device_count=2)
    import jax
    assert jax.process_count() == world, jax.process_count()
    assert jax.device_count() == 2 * world, jax.device_count()

    channel = HostChannel(rank, world, port=chan_port, timeout=120.0)
    payload = None
    if rank == 0:
        payload = make_graph()
        payload = {k: v for k, v in payload.items()
                   if k not in ("n_real_edges", "gt")}
    poses = multihost_pgo_optimize(channel, payload, num_iterations=12)
    if rank == 0:
        np.save(out_path, poses)
    channel.barrier()
    channel.close()
    print(f"rank {rank} done")


if __name__ == "__main__":
    main()
