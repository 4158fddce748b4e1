"""End-to-end visual odometry on a synthetic sequence (SURVEY.md section 7
T3 milestone: T1+T2+T3 + host keyframe switcher == VO mode, benchmarkable
for ATE immediately). Deterministic sequential pipeline (hz=0 semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_slam_tpu.config import LSDConfig
from lsd_slam_tpu.system import SlamSystem
from lsd_slam_tpu.utils import synth
from lsd_slam_tpu.utils.evaluate import ate_rmse

W, H = 160, 128
N_FRAMES = 18


@pytest.fixture(scope="module")
def sequence():
    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=7)
    poses = synth.orbit_trajectory(N_FRAMES, radius=0.06, fwd=0.01)
    imgs, deps = [], []
    for i in range(N_FRAMES):
        img, dep = synth.render(scene, cam, jnp.asarray(poses[i]))
        imgs.append(np.asarray(img))
        deps.append(np.asarray(dep))
    return cam, np.stack(imgs), np.stack(deps), poses


def test_vo_gt_init_tracks_sequence(sequence):
    cam, imgs, deps, gt_poses = sequence
    cfg = LSDConfig(width=W, height=H)
    sys = SlamSystem(cam, cfg, enable_slam=False)
    sys.gt_depth_init(imgs[0], deps[0], frame_id=0, timestamp=0.0)
    for i in range(1, N_FRAMES):
        sys.track_frame(imgs[i], i, float(i) / 30.0)
    assert sys.tracking_is_good
    traj = sys.trajectory_array()
    assert traj.shape[0] == N_FRAMES
    err = ate_rmse(traj, gt_poses)
    # scene scale is meters-ish (depths 1.5-4.5); expect sub-cm ATE with GT init
    assert err < 0.01, f"ATE {err}"


def test_vo_creates_keyframes(sequence):
    cam, imgs, deps, gt_poses = sequence
    cfg = LSDConfig(width=W, height=H)
    sys = SlamSystem(cam, cfg, enable_slam=False)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N_FRAMES):
        sys.track_frame(imgs[i], i, float(i) / 30.0)
    sys.finalize()
    # moving ~1cm/frame over 17 frames with this fov should trigger at
    # least one keyframe switch
    assert len(sys.keyframes) >= 1
    kf = sys.current_keyframe
    assert kf.num_points > 0.05 * W * H


def test_vo_depth_improves_with_observations(sequence):
    """The depth filter must actually observe: successful stereo updates
    must happen (guards against silently-failing sweeps), and GT-seeded
    depth must stay accurate."""
    cam, imgs, deps, gt_poses = sequence
    cfg = LSDConfig(width=W, height=H)
    sys = SlamSystem(cam, cfg, enable_slam=False)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, 8):
        sys.track_frame(imgs[i], i, float(i) / 30.0)
    counters = sys.stats.snapshot()
    assert counters.get("observe_updated", 0) > 500, counters
    kf = sys.current_keyframe
    if kf.id == 0:  # still the first KF: compare against its GT depth
        idepth = np.asarray(kf.depth.idepth[0])
        valid = np.asarray(kf.depth.ivar[0]) > 0
        gt_idepth = 1.0 / np.maximum(deps[0], 1e-6)
        rel = np.abs(idepth - gt_idepth) / gt_idepth
        assert valid.mean() > 0.1
        assert np.median(rel[valid]) < 0.05, float(np.median(rel[valid]))


def test_vo_random_init_converges(sequence):
    """Random-init bootstrap: after the initialization phase the system
    should still be tracking (the reference's random init needs a handful
    of frames to lock in, SlamSystem.cpp:857-888)."""
    cam, imgs, deps, gt_poses = sequence
    cfg = LSDConfig(width=W, height=H)
    sys = SlamSystem(cam, cfg, enable_slam=False, seed=3)
    sys.random_init(imgs[0], 0, 0.0)
    for i in range(1, N_FRAMES):
        sys.track_frame(imgs[i], i, float(i) / 30.0)
    # random init on synthetic texture may or may not fully converge in 18
    # frames; minimum bar: the pipeline runs and keeps a depth map alive
    assert sys.current_keyframe is not None
    assert sys.current_keyframe.num_points > 0
