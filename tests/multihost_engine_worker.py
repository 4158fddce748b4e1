"""Worker process for the multi-host ENGINE test.

Rank 0 runs a full SlamSystem over a deterministic synthetic loop with the
MultihostFrontend attached (candidate quick-track fan-out + SPMD PGO over
the 2-process global mesh); rank 1 serves. Rank 0 writes its track-time
trajectory + keyframe/edge counts for the test to compare against a
single-process run.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H, N = 160, 128, 30


def make_sequence():
    import jax.numpy as jnp
    from lsd_slam_tpu import lie
    from lsd_slam_tpu.utils import synth

    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=13)
    poses, imgs, deps = [], [], []
    for i in range(N):
        a = i / (N - 1)
        x = 0.55 * np.sin(np.pi * a)
        yaw = 0.06 * np.sin(2 * np.pi * a)
        t = np.asarray(lie.se3_exp(jnp.asarray(
            [0, 0, 0, 0, yaw, 0], jnp.float32)))
        c2w = np.concatenate([t[0:4], [x, 0.0, 0.015 * np.sin(np.pi * a)]])
        w2c = np.asarray(lie.se3_inverse(jnp.asarray(
            c2w.astype(np.float32))))
        poses.append(w2c)
        img, dep = synth.render(scene, cam, jnp.asarray(w2c))
        imgs.append(np.asarray(img))
        deps.append(np.asarray(dep))
    return cam, imgs, deps, np.stack(poses)


def engine_config():
    from lsd_slam_tpu.config import LSDConfig, KeyframeConfig

    return LSDConfig(width=W, height=H).replace(
        keyframe=KeyframeConfig(kf_dist_weight=25.0, kf_usage_weight=6.0,
                                initialization_phase_count=1,
                                min_num_mapped=2))


def run_engine(multihost=None):
    from lsd_slam_tpu.system import SlamSystem

    cam, imgs, deps, gt = make_sequence()
    sys_ = SlamSystem(cam, engine_config(), enable_slam=True,
                      multihost=multihost)
    if multihost is not None:
        # force the fan-out / SPMD paths at toy sizes
        multihost.min_candidates = 2
        sys_.backend.graph.pose_graph.multihost_min_edges = 1
    sys_.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys_.track_frame(imgs[i], i, i / 30.0)
    traj = sys_.trajectory_array()
    n_kf = len(sys_.keyframes)
    n_edges = sys_.backend.graph.pose_graph.n_edges
    sys_.finalize()  # stops the frontend / releases the workers
    return traj, n_kf, n_edges, gt


def main():
    rank = int(sys.argv[1])
    world = int(sys.argv[2])
    coord_port = int(sys.argv[3])
    chan_port = int(sys.argv[4])
    out_path = sys.argv[5]

    from lsd_slam_tpu.parallel.multihost import init_multihost, HostChannel
    from lsd_slam_tpu.parallel import multihost_engine

    init_multihost(f"127.0.0.1:{coord_port}", world, rank,
                   local_device_count=2)
    channel = HostChannel(rank, world, port=chan_port, timeout=180.0)

    if rank != 0:
        multihost_engine.serve(channel)
        print(f"rank {rank} done")
        return

    cam, _, _, _ = make_sequence()
    frontend = multihost_engine.MultihostFrontend(channel, cam,
                                                 engine_config())
    traj, n_kf, n_edges, gt = run_engine(frontend)
    np.savez(out_path, traj=traj, n_kf=n_kf, n_edges=n_edges, gt=gt)
    print("rank 0 done")


if __name__ == "__main__":
    main()
