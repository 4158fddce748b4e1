"""Pose-graph optimizer tests: synthetic Sim3 graphs with known solutions
(the role g2o plays in the reference, KeyFrameGraph.cpp:324-336)."""

import numpy as np
import pytest

from lsd_slam_tpu.lie import np_sim3 as nps
from lsd_slam_tpu.mapping.pose_graph import PoseGraph


def make_circle_poses(n, radius=2.0, scale_drift=1.0):
    """Ground-truth camToWorld poses around a circle, optional scale drift."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        # simple pose: rotation about y by a, translation on circle
        q = np.array([np.cos(a / 2), 0, np.sin(a / 2), 0])
        t = np.array([radius * np.sin(a), 0.0, radius * (1 - np.cos(a))])
        s = scale_drift ** i
        poses.append(np.concatenate([q, t, [s]]))
    return poses


def relative(a, b):
    """secondToFirst measurement between camToWorld poses a (first), b."""
    return nps.sim3_mul(nps.sim3_inverse(a), b)


def test_pgo_identity_is_stable():
    gt = make_circle_poses(6)
    g = PoseGraph()
    for i, p in enumerate(gt):
        g.add_vertex(p, fixed=(i == 0))
    info = np.eye(7)
    for i in range(5):
        g.add_edge(i, i + 1, relative(gt[i], gt[i + 1]), info, 1e6)
    change = g.optimize(5)
    assert change < 1e-3
    for i in range(6):
        d = nps.sim3_log_norm(
            nps.sim3_mul(nps.sim3_inverse(g.poses[i]), gt[i]))
        assert d < 1e-3


def test_pgo_corrects_perturbed_chain():
    rng = np.random.default_rng(0)
    gt = make_circle_poses(8)
    g = PoseGraph()
    for i, p in enumerate(gt):
        if i == 0:
            g.add_vertex(p, fixed=True)
        else:
            # perturb initial estimates
            noise = np.concatenate([rng.normal(0, 0.03, 6), [0.0]])
            from lsd_slam_tpu import lie
            import jax.numpy as jnp
            pert = np.asarray(lie.sim3_exp(jnp.asarray(noise, jnp.float32)),
                              np.float64)
            g.add_vertex(nps.sim3_mul(pert, p), fixed=False)
    info = np.eye(7) * 100
    for i in range(7):
        g.add_edge(i, i + 1, relative(gt[i], gt[i + 1]), info, 1e6)
    # loop closure edge 0 -> 7 makes the graph rigid
    g.add_edge(0, 7, relative(gt[0], gt[7]), info, 1e6)
    g.optimize(25)
    for i in range(8):
        d = nps.sim3_log_norm(
            nps.sim3_mul(nps.sim3_inverse(g.poses[i]), gt[i]))
        assert d < 5e-3, (i, d)


def test_pgo_fixes_scale_drift():
    """Monocular scale drift: odometry chain with wrong scale, loop closure
    with the right one — the Sim(3) graph should distribute the error."""
    gt = make_circle_poses(8)
    g = PoseGraph()
    drift = 1.05
    # initial estimates accumulate scale drift
    est = [gt[0]]
    for i in range(1, 8):
        rel = relative(gt[i - 1], gt[i])
        rel_drifted = rel.copy()
        rel_drifted[7] *= drift
        est.append(nps.sim3_mul(est[-1], rel_drifted))
    for i, p in enumerate(est):
        g.add_vertex(p, fixed=(i == 0))
    info = np.eye(7)
    for i in range(7):
        # odometry edges carry the drifted measurements
        g.add_edge(i, i + 1, relative(est[i], est[i + 1]), info, 1e6)
    # strong loop-closure edge with the true relative pose
    g.add_edge(0, 7, relative(gt[0], gt[7]), info * 10000, 1e6)
    g.optimize(30)
    # the scale of the last vertex should move toward the GT value 1.0
    final_scale_err = abs(np.log(g.poses[7][7] / gt[7][7]))
    init_scale_err = abs(np.log(est[7][7] / gt[7][7]))
    assert final_scale_err < 0.3 * init_scale_err, \
        (init_scale_err, final_scale_err)


def test_pgo_huber_downweights_outlier_edge():
    """The Huber kernel must strongly reduce an outlier's influence
    relative to a plain least-squares solve. (A Huber kernel exerts a
    bounded-but-nonzero pull, so residual drift remains — the reference
    rejects outright outliers earlier via reciprocal consistency,
    SlamSystem.cpp:1093-1099, and uses the kernel only as a backstop.)"""

    def run(delta):
        gt = make_circle_poses(6)
        g = PoseGraph()
        for i, p in enumerate(gt):
            g.add_vertex(p, fixed=(i == 0))
        info = np.eye(7) * 100
        for i in range(5):
            g.add_edge(i, i + 1, relative(gt[i], gt[i + 1]), info, 1e6)
        bad = relative(gt[0], gt[5]).copy()
        bad[4:7] += np.array([3.0, -2.0, 1.0])
        g.add_edge(0, 5, bad, info, delta)
        g.optimize(15)
        return max(
            nps.sim3_log_norm(
                nps.sim3_mul(nps.sim3_inverse(g.poses[i]), gt[i]))
            for i in range(6))

    drift_robust = run(delta=0.05)
    drift_plain = run(delta=1e6)
    assert drift_robust < 0.25 * drift_plain, (drift_robust, drift_plain)
    assert drift_plain > 0.4  # sanity: the outlier really does damage


def test_sparse_pcg_matches_dense():
    """The matrix-free PCG path must land on the same optimum as the dense
    solve (same graph, same damping policy)."""
    from lsd_slam_tpu.mapping.sparse_pgo import optimize_sparse

    def build():
        rng = np.random.default_rng(3)
        gt = make_circle_poses(12)
        g = PoseGraph()
        from lsd_slam_tpu import lie
        import jax.numpy as jnp
        for i, p in enumerate(gt):
            if i == 0:
                g.add_vertex(p, fixed=True)
            else:
                noise = np.concatenate([rng.normal(0, 0.02, 6), [0.0]])
                pert = np.asarray(
                    lie.sim3_exp(jnp.asarray(noise, jnp.float32)), np.float64)
                g.add_vertex(nps.sim3_mul(pert, p))
        info = np.eye(7) * 100
        for i in range(11):
            g.add_edge(i, i + 1, relative(gt[i], gt[i + 1]), info, 1e6)
        g.add_edge(0, 11, relative(gt[0], gt[11]), info, 1e6)
        g.add_edge(2, 9, relative(gt[2], gt[9]), info, 1e6)
        return g, gt

    g_dense, gt = build()
    g_sparse, _ = build()
    g_dense.optimize(20)
    optimize_sparse(g_sparse, 20)
    for i in range(12):
        d = nps.sim3_log_norm(
            nps.sim3_mul(nps.sim3_inverse(g_sparse.poses[i]),
                         g_dense.poses[i]))
        assert d < 2e-3, (i, d)
        d_gt = nps.sim3_log_norm(
            nps.sim3_mul(nps.sim3_inverse(g_sparse.poses[i]), gt[i]))
        assert d_gt < 5e-3, (i, d_gt)


def test_large_graph_routes_to_sparse_and_converges():
    """Above dense_threshold, PoseGraph.optimize must switch to PCG and
    still close a long noisy loop (the >300-keyframe regime the dense
    solver would thrash on)."""
    rng = np.random.default_rng(7)
    n = 340
    assert n > PoseGraph.dense_threshold
    gt = make_circle_poses(n)
    from lsd_slam_tpu import lie
    import jax.numpy as jnp
    g = PoseGraph()
    for i, p in enumerate(gt):
        if i == 0:
            g.add_vertex(p, fixed=True)
        else:
            noise = np.concatenate([rng.normal(0, 0.01, 6), [0.0]])
            pert = np.asarray(
                lie.sim3_exp(jnp.asarray(noise, jnp.float32)), np.float64)
            g.add_vertex(nps.sim3_mul(pert, p))
    info = np.eye(7) * 100
    for i in range(n - 1):
        g.add_edge(i, i + 1, relative(gt[i], gt[i + 1]), info, 1e6)
    g.add_edge(0, n - 1, relative(gt[0], gt[n - 1]), info, 1e6)
    for a in range(0, n - 20, 17):  # sprinkle mid-loop closures
        g.add_edge(a, a + 11, relative(gt[a], gt[a + 11]), info, 1e6)
    g.optimize(12)
    errs = [nps.sim3_log_norm(
        nps.sim3_mul(nps.sim3_inverse(g.poses[i]), gt[i]))
        for i in range(n)]
    assert max(errs) < 8e-3, max(errs)
