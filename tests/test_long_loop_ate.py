"""Long loop-closing sequence: accumulated drift must be reduced by the
pose-graph optimization (the loop-closure value proposition, BASELINE.md).

Uses random depth initialization (the dataset mode's bootstrap,
DepthMap::initializeRandomly) so scale/geometry error accumulates on the
way out and the return leg exposes it as loop-closure error."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_slam_tpu.config import LSDConfig, KeyframeConfig
from lsd_slam_tpu.system import SlamSystem
from lsd_slam_tpu.utils import synth
from lsd_slam_tpu.utils.evaluate import ate_rmse

W, H = 160, 128
N = 120


@pytest.mark.slow
def test_loop_closure_reduces_ate():
    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=21)
    poses = synth.loop_trajectory(N, span=0.7, yaw_amp=0.08)
    imgs = []
    for i in range(N):
        img, _ = synth.render(scene, cam, jnp.asarray(poses[i]))
        imgs.append(np.asarray(img))

    cfg = LSDConfig(width=W, height=H).replace(
        keyframe=KeyframeConfig(kf_dist_weight=12.0, kf_usage_weight=3.0,
                                initialization_phase_count=3,
                                min_num_mapped=3))
    sys = SlamSystem(cam, cfg, enable_slam=True, seed=3)
    sys.random_init(imgs[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
    assert sys.tracking_is_good

    traj_before = sys.trajectory_array()
    n_logged = len(traj_before)
    # skip the random-init bootstrap frames: their depth (hence pose) is
    # garbage by construction and identical in both trajectories
    skip = 10
    ate_before = ate_rmse(traj_before[skip:], poses[:n_logged][skip:])
    sys.finalize()
    ate_after = ate_rmse(sys.optimized_trajectory_array()[skip:],
                         poses[:n_logged][skip:])

    graph = sys.backend.graph
    idx = {kf.id: kf.idx_in_keyframes for kf in sys.keyframes}
    nonparent = sum(
        1 for e in graph.edges
        if abs(idx.get(e.first.id, 0) - idx.get(e.second.id, 0)) > 1)
    assert nonparent >= 1, "no loop-closure edge found"
    # the optimized trajectory must not be worse, and when measurable
    # drift exists the loop closure must reduce it
    assert ate_after <= ate_before * 1.05, (ate_before, ate_after)
    if ate_before > 0.01:
        assert ate_after < ate_before, (ate_before, ate_after)
    assert ate_after < 0.08, ate_after
    print(f"ATE before PGO: {ate_before:.5f}, after: {ate_after:.5f}")
