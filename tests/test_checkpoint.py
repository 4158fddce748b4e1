"""Checkpoint/resume: save a running SLAM system, reload, keep tracking."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_slam_tpu.config import LSDConfig, KeyframeConfig
from lsd_slam_tpu.system import SlamSystem
from lsd_slam_tpu.utils import synth
from lsd_slam_tpu.io.checkpoint import save_system, load_system
from lsd_slam_tpu.lie import np_sim3 as nps

W, H = 160, 128
N = 16


@pytest.fixture(scope="module")
def seq():
    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=31)
    poses = synth.orbit_trajectory(N, radius=0.08, fwd=0.012)
    imgs, deps = [], []
    for i in range(N):
        img, dep = synth.render(scene, cam, jnp.asarray(poses[i]))
        imgs.append(np.asarray(img))
        deps.append(np.asarray(dep))
    return cam, np.stack(imgs), np.stack(deps), poses


def test_checkpoint_roundtrip_and_resume(tmp_path, seq):
    cam, imgs, deps, gt = seq
    cfg = LSDConfig(width=W, height=H).replace(
        keyframe=KeyframeConfig(kf_dist_weight=12.0,
                                initialization_phase_count=1,
                                min_num_mapped=2))
    sys1 = SlamSystem(cam, cfg, enable_slam=True)
    sys1.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, 10):
        sys1.track_frame(imgs[i], i, i / 30.0)
    # force at least one finalized keyframe in the store
    if not sys1.keyframes:
        sys1.finish_current_keyframe()
    n_kf = len(sys1.keyframes)
    n_edges = sys1.backend.graph.pose_graph.n_edges
    path = str(tmp_path / "ckpt.npz")
    save_system(path, sys1)

    sys2 = load_system(path, cfg)
    assert len(sys2.keyframes) == n_kf
    assert sys2.backend.graph.pose_graph.n_edges == n_edges
    # poses survive the round trip
    for kf1, kf2 in zip(sys1.keyframes, sys2.keyframes):
        d = nps.sim3_log_norm(nps.sim3_mul(
            nps.sim3_inverse(kf1.pose.cam_to_world()),
            kf2.pose.cam_to_world()))
        assert d < 1e-6, (kf1.id, d)
    assert len(sys2.trajectory) == len(sys1.trajectory)

    # resumed system keeps tracking the remaining frames
    for i in range(10, N):
        sys2.track_frame(imgs[i], i, i / 30.0)
    assert sys2.tracking_is_good
    assert len(sys2.trajectory) > len(sys1.trajectory)
