"""Engine-integrated multi-chip execution: the distributed (edge-sharded,
psum-reduced) PGO and the mesh-sharded candidate checks must produce the
same results as the single-device paths — verified at the PoseGraph level
on a padded random graph and end-to-end on a full SLAM session run both
ways on the virtual 8-device CPU mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_slam_tpu import lie
from lsd_slam_tpu.lie import np_sim3 as nps
from lsd_slam_tpu.mapping.pose_graph import PoseGraph
from lsd_slam_tpu.parallel import make_mesh
from lsd_slam_tpu.system import SlamSystem
from lsd_slam_tpu.utils import synth
from lsd_slam_tpu.utils.evaluate import ate_rmse


def _loop_graph(pg: PoseGraph, n: int, rng):
    """Chain + loop-closure edges with noisy vertex inits."""
    gt = []
    for i in range(n):
        c2w = nps.sim3_identity()
        c2w[4] = 0.1 * i
        c2w[5] = 0.03 * np.sin(i * 0.7)
        gt.append(c2w)
    for i in range(n):
        noisy = gt[i].copy()
        if i > 0:
            noisy[4:7] += rng.normal(0, 0.03, 3)
        pg.add_vertex(noisy, fixed=(i == 0))
    info = np.eye(7)

    def add(i, j):
        # second_to_first: x_first^-1 * x_second (insert_constraint semantics)
        meas = nps.sim3_mul(nps.sim3_inverse(gt[i]), gt[j])
        pg.add_edge(i, j, meas, info, 1e6)

    for i in range(n - 1):
        add(i, i + 1)
    for i in range(0, n - 5, 3):
        add(i, i + 5)  # longer-range edges (odd count => padding exercised)
    return gt


def test_posegraph_mesh_matches_single_device():
    """Same graph optimized with the edge-sharded distributed step (incl.
    bucket padding: 17 vertices -> 32, odd edge count -> power-of-two) and
    with the single-device dense path must agree."""
    rng = np.random.default_rng(3)
    pg_single = PoseGraph(mesh=None)
    _loop_graph(pg_single, 17, np.random.default_rng(3))
    pg_mesh = PoseGraph(mesh=make_mesh(8))
    pg_mesh.mesh_min_edges = 0  # force the collective path at toy size
    _loop_graph(pg_mesh, 17, np.random.default_rng(3))

    for _ in range(4):
        pg_single.optimize(5)
        pg_mesh.optimize(5)

    a = np.stack(pg_single.poses)
    b = np.stack(pg_mesh.poses)
    # sign-align quaternions before comparing
    sign = np.where(np.sum(a[:, :4] * b[:, :4], axis=1) < 0, -1.0, 1.0)
    b = b * np.concatenate([np.tile(sign[:, None], (1, 4)),
                            np.ones((len(b), 4))], axis=1)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_posegraph_mesh_reduces_chi2_large_graph():
    """Above dense_threshold the mesh path dispatches the edge-sharded PCG
    step; the graph must still converge toward ground truth."""
    rng = np.random.default_rng(5)
    pg = PoseGraph(mesh=make_mesh(8))
    pg.mesh_min_edges = 0   # force the collective path at toy size
    pg.dense_threshold = 8  # force the CG path without a 320-vertex graph
    gt = _loop_graph(pg, 40, rng)
    before = max(np.linalg.norm(pg.poses[i][4:7] - gt[i][4:7])
                 for i in range(40))
    for _ in range(6):
        pg.optimize(5)
    after = max(np.linalg.norm(pg.poses[i][4:7] - gt[i][4:7])
                for i in range(40))
    assert after < 0.2 * before, (before, after)


W, H, N = 160, 128, 24


def _run_slam(use_mesh: bool):
    from lsd_slam_tpu.config import LSDConfig, KeyframeConfig
    import dataclasses

    cam = synth.default_camera(W, H)
    scene = synth.PlaneScene(seed=7)
    imgs, deps, gts = [], [], []
    for i in range(N):
        a = i / (N - 1)
        x = 0.4 * np.sin(np.pi * a)
        c2w = np.array([1, 0, 0, 0, x, 0, 0.01 * np.sin(np.pi * a)])
        w2c = np.asarray(lie.se3_inverse(jnp.asarray(c2w, jnp.float32)))
        img, dep = synth.render(scene, cam, jnp.asarray(w2c))
        imgs.append(np.asarray(img))
        deps.append(np.asarray(dep))
        gts.append(w2c)
    cfg = LSDConfig(width=W, height=H).replace(
        keyframe=KeyframeConfig(kf_dist_weight=25.0, kf_usage_weight=6.0,
                                initialization_phase_count=1,
                                min_num_mapped=2))
    cfg = cfg.replace(system=dataclasses.replace(cfg.system,
                                                 use_device_mesh=use_mesh))
    sys = SlamSystem(cam, cfg, enable_slam=True)
    sys.gt_depth_init(imgs[0], deps[0], 0, 0.0)
    for i in range(1, N):
        sys.track_frame(imgs[i], i, i / 30.0)
    sys.finalize()
    return sys, np.stack(gts)


@pytest.mark.slow
def test_engine_trajectory_mesh_matches_single():
    """Full SLAM session with the mesh-integrated engine (distributed PGO +
    sharded candidate checks on the 8-device CPU mesh) vs the single-device
    engine: both accurate, and near-identical to each other."""
    sys_mesh, gt = _run_slam(use_mesh=True)
    sys_single, _ = _run_slam(use_mesh=False)
    assert sys_mesh.backend.graph.mesh is not None
    assert sys_single.backend.graph.mesh is None
    assert sys_mesh.backend.graph.pose_graph.n_edges > 0

    traj_mesh = sys_mesh.trajectory_array()
    traj_single = sys_single.trajectory_array()
    err_mesh = ate_rmse(traj_mesh, gt)
    err_single = ate_rmse(traj_single, gt)
    assert err_mesh < 0.02, err_mesh
    assert err_single < 0.02, err_single
    # the two engines must agree with each other tightly
    assert len(traj_mesh) == len(traj_single)
    pos_diff = np.linalg.norm(traj_mesh[:, 4:7] - traj_single[:, 4:7],
                              axis=1).max()
    assert pos_diff < 0.01, pos_diff
