"""Full SLAM end-to-end: keyframe graph, Sim3 constraints, PGO, loop closure
on a synthetic out-and-back trajectory (configs[2] in BASELINE.json)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_slam_tpu import lie
from lsd_slam_tpu.config import LSDConfig, KeyframeConfig
from lsd_slam_tpu.system import SlamSystem
from lsd_slam_tpu.utils import synth
from lsd_slam_tpu.utils.evaluate import ate_rmse

W, H = 160, 128
N = 36


def loop_trajectory(n):
    """Move right and come back — frame 0 and frame n-1 see the same view."""
    poses = []
    for i in range(n):
        a = i / (n - 1)
        x = 0.55 * np.sin(np.pi * a)  # out and back
        yaw = 0.06 * np.sin(2 * np.pi * a)
        t = np.asarray(lie.se3_exp(jnp.asarray(
            [0, 0, 0, 0, yaw, 0], jnp.float32)))
        c2w = np.concatenate([t[0:4], [x, 0.0, 0.015 * np.sin(np.pi * a)]])
        poses.append(np.asarray(lie.se3_inverse(jnp.asarray(
            c2w.astype(np.float32)))))
    return np.stack(poses)


@pytest.fixture(scope="module")
def loop_seq():
    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=13)
    poses = loop_trajectory(N)
    imgs, deps = [], []
    for i in range(N):
        img, dep = synth.render(scene, cam, jnp.asarray(poses[i]))
        imgs.append(np.asarray(img))
        deps.append(np.asarray(dep))
    return cam, np.stack(imgs), np.stack(deps), poses


def slam_config():
    # aggressive keyframe creation + no initialization gating so a short
    # sequence exercises the constraint machinery
    return LSDConfig(width=W, height=H).replace(
        keyframe=KeyframeConfig(kf_dist_weight=25.0, kf_usage_weight=6.0,
                                initialization_phase_count=1,
                                min_num_mapped=2))


def test_slam_builds_graph_and_constraints(loop_seq):
    cam, imgs, deps, gt = loop_seq
    sys = SlamSystem(cam, slam_config(), enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
    sys.finalize()

    assert sys.tracking_is_good
    assert len(sys.keyframes) >= 3, len(sys.keyframes)
    graph = sys.backend.graph
    assert graph.pose_graph.n_vertices == len(sys.keyframes)
    # every non-first keyframe must have at least its parent edge
    assert graph.pose_graph.n_edges >= len(sys.keyframes) - 1
    # trajectory stays accurate after graph optimization
    err = ate_rmse(sys.trajectory_array(), gt)
    assert err < 0.02, err


def test_slam_finds_nonparent_constraint(loop_seq):
    """The return leg should produce at least one close-candidate constraint
    to an earlier (non-parent) keyframe — the loop closure."""
    cam, imgs, deps, gt = loop_seq
    sys = SlamSystem(cam, slam_config(), enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
    sys.finalize()
    graph = sys.backend.graph
    nonparent = 0
    kf_ids = [kf.id for kf in sys.keyframes]
    for e in graph.edges:
        i1 = kf_ids.index(e.first.id) if e.first.id in kf_ids else -1
        i2 = kf_ids.index(e.second.id) if e.second.id in kf_ids else -1
        if i1 >= 0 and i2 >= 0 and abs(i1 - i2) > 1:
            nonparent += 1
    assert nonparent >= 1, [
        (e.first.id, e.second.id) for e in graph.edges]


@pytest.mark.slow
def test_async_slam_four_way_overlap(loop_seq):
    """Async mode with the full 4-way overlap (tracking / mapping /
    constraint search / optimization threads, SlamSystem.cpp:111-117):
    the loop closure must land while tracking keeps running, and the idle
    re-track worker (SlamSystem.cpp:275-310) must densify the edge set
    beyond what arrival-time constraint search produced."""
    import time

    cam, imgs, deps, gt = loop_seq
    cfg = slam_config()
    cfg = cfg.replace(
        system=dataclasses.replace(cfg.system, sequential=False),
        keyframe=dataclasses.replace(cfg.keyframe, retrack_min_keyframes=3))
    sys = SlamSystem(cam, cfg, enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
        sys.block_until_mapped(30.0)
    assert sys.tracking_is_good
    # give the idle re-track worker a window before finalizing
    deadline = time.time() + 20.0
    while (time.time() < deadline
           and sys.stats.counters.get("retrack_attempts", 0) < 2):
        time.sleep(0.2)
    sys.finalize()

    assert sys.stats.counters.get("retrack_attempts", 0) >= 1, \
        dict(sys.stats.counters)
    graph = sys.backend.graph
    # loop closure landed: some accepted edge joins non-adjacent keyframes
    idx = {kf.id: kf.idx_in_keyframes for kf in sys.keyframes}
    nonparent = sum(
        1 for e in graph.edges
        if abs(idx.get(e.first.id, 0) - idx.get(e.second.id, 0)) > 1)
    assert nonparent >= 1, [(e.first.id, e.second.id) for e in graph.edges]
    err = ate_rmse(sys.trajectory_array(), gt)
    assert err < 0.03, err


def test_slam_relocalizes_after_manual_loss(loop_seq):
    """Inject manual tracking loss mid-sequence (the reference's 'l' hotkey,
    settings.cpp:154-157) and verify the batched relocalizer recovers:
    consensus vote + full-track re-verification (Relocalizer.cpp:176-231,
    SlamSystem.cpp:695-737), recovered pose close to ground truth."""
    cam, imgs, deps, gt = loop_seq
    sys = SlamSystem(cam, slam_config(), enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
    assert sys.tracking_is_good
    # lose tracking, then feed frames from the already-mapped return leg
    sys.manual_tracking_loss = True
    sys.track_frame(imgs[N - 1], N, N / 30.0)
    assert not sys.tracking_is_good
    recovered_at = None
    for j, i in enumerate(range(N - 2, N // 2, -1)):
        sys.track_frame(imgs[i], N + 1 + j, (N + 1 + j) / 30.0)
        if sys.tracking_is_good:
            recovered_at = i
            break
    assert recovered_at is not None, "relocalizer never recovered"
    assert sys.stats.counters["relocalized"] >= 1
    # recovered pose must be close to ground truth (gauge fixed by GT init)
    est_c2w = sys.trajectory[-1][2]
    gt_c2w = np.asarray(lie.se3_inverse(jnp.asarray(
        gt[recovered_at], jnp.float32)), np.float64)
    assert np.linalg.norm(est_c2w[4:7] - gt_c2w[4:7]) < 0.05, \
        (est_c2w, gt_c2w)


def test_slam_reactivates_keyframe(loop_seq):
    """Returning to a mapped region must re-activate an old keyframe
    instead of creating a new one (doKFReActivation, SlamSystem.cpp:507-540)
    at least once on the return leg — asserted via the counter bumped by
    load_existing_keyframe."""
    cam, imgs, deps, gt = loop_seq
    # kf_usage_weight at the reference default (3.0): the aggressive value
    # the other tests use inflates the usage term of the reposition score
    # above the acceptance bound, masking reactivation entirely
    cfg = slam_config()
    cfg = cfg.replace(keyframe=dataclasses.replace(cfg.keyframe,
                                                   kf_usage_weight=3.0))
    sys = SlamSystem(cam, cfg, enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
    # retrace the return leg once more: by now the region is fully mapped,
    # so keyframe switches must hit the reposition candidate path
    for j, i in enumerate(range(N - 2, N // 2, -1)):
        sys.track_frame(imgs[i], N + j, (N + j) / 30.0)
    sys.finalize()
    ids = [kf.id for kf in sys.keyframes]
    assert len(set(ids)) == len(ids)
    assert sys.stats.counters["keyframes_reactivated"] >= 1, \
        dict(sys.stats.counters)


def test_promotion_uses_latest_tracked_not_popped(loop_seq):
    """Regression: a keyframe promotion must use the FRESHEST tracked frame
    (latest_tracked, owned by the tracking thread), not the possibly-stale
    frame the mapping worker popped from its queue. The old async path
    wrote sys.latest_tracked from the mapping thread, so under queue lag a
    promotion could pick a frame the tracker had already superseded
    (== the reference promotes latestTrackedFrame, SlamSystem.cpp:783-786)."""
    cam, imgs, deps, gt = loop_seq
    sys = SlamSystem(cam, slam_config(), enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, 8):
        sys.track_frame(imgs[i], i, i / 30.0)
    stale = sys.latest_tracked          # the queue-lagged frame
    sys.track_frame(imgs[8], 8, 8 / 30.0)
    fresh = sys.latest_tracked
    assert fresh is not stale and fresh.id != stale.id
    # simulate the async worker popping `stale` exactly when a promotion
    # fires: the new keyframe must be the fresh frame
    sys.create_new_keyframe = True
    sys.do_mapping_iteration(stale)
    assert sys.current_keyframe.id == fresh.id, (
        sys.current_keyframe.id, stale.id, fresh.id)
    # and latest_tracked was not clobbered by the mapping call
    assert sys.latest_tracked is fresh


def test_pipelined_mode_matches_blocking(loop_seq):
    """pipeline_lag > 0 keeps frames in flight and retires host decisions
    late, but the per-frame device math is the same chained program — the
    trajectory must stay as accurate as blocking mode and the map must
    build the same way (keyframes within one switch of each other)."""
    cam, imgs, deps, gt = loop_seq
    sys_b = SlamSystem(cam, slam_config(), enable_slam=True)
    sys_b.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys_b.track_frame(imgs[i], i, i / 30.0)
    sys_b.finalize()

    cfg = slam_config()
    cfg = cfg.replace(system=dataclasses.replace(cfg.system, pipeline_lag=3))
    sys_p = SlamSystem(cam, cfg, enable_slam=True)
    sys_p.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys_p.track_frame(imgs[i], i, i / 30.0)
    sys_p.finalize()

    assert sys_p.tracking_is_good
    # every frame retired exactly once
    assert len(sys_p.all_frame_poses) == len(sys_b.all_frame_poses)
    err_b = ate_rmse(sys_b.trajectory_array(), gt)
    err_p = ate_rmse(sys_p.trajectory_array(), gt)
    assert err_p < max(2.0 * err_b, 0.02), (err_p, err_b)
    assert abs(len(sys_p.keyframes) - len(sys_b.keyframes)) <= 2, \
        (len(sys_p.keyframes), len(sys_b.keyframes))
    # pipelined mode must still close the loop
    assert sys_p.backend.graph.pose_graph.n_edges >= len(sys_p.keyframes) - 1


def test_pipelined_mode_is_deterministic(loop_seq):
    """Fixed lag => fixed retire schedule => identical trajectories across
    runs (the determinism the reference explicitly lacks, README.md:241)."""
    cam, imgs, deps, gt = loop_seq
    cfg = slam_config()
    cfg = cfg.replace(system=dataclasses.replace(cfg.system, pipeline_lag=2))
    trajs = []
    for _ in range(2):
        s = SlamSystem(cam, cfg, enable_slam=True)
        s.gt_depth_init(imgs[0], deps[0], 0, 0.0)
        for i in range(1, N):
            s.track_frame(imgs[i], i, i / 30.0)
        s.finalize()
        trajs.append(s.trajectory_array())
    assert trajs[0].shape == trajs[1].shape
    assert np.max(np.abs(trajs[0] - trajs[1])) < 1e-12


def test_pipelined_loss_rolls_back_ring(loop_seq):
    """Manual loss while frames are in flight must discard the ring,
    restore the pre-loss depth state, and recover via relocalization."""
    cam, imgs, deps, gt = loop_seq
    cfg = slam_config()
    cfg = cfg.replace(system=dataclasses.replace(cfg.system, pipeline_lag=3))
    sys = SlamSystem(cam, cfg, enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
    assert sys.tracking_is_good
    sys.manual_tracking_loss = True
    for j, i in enumerate(range(N - 2, N // 2, -1)):
        sys.track_frame(imgs[i], N + 1 + j, (N + 1 + j) / 30.0)
        if sys.tracking_is_good:
            break
    assert not sys._ring  # ring cleared by the loss
    assert sys.tracking_is_good, "no recovery after pipelined loss"
    assert sys.stats.counters.get("relocalized", 0) >= 1
