"""Multi-device tests on the virtual 8-device CPU mesh: the distributed
PGO normal equations must match the single-device assembly exactly, and
sharded candidate tracking must match the unsharded batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsd_slam_tpu.lie import np_sim3 as nps
from lsd_slam_tpu.mapping.pose_graph import PoseGraph, _assemble
from lsd_slam_tpu.parallel import (make_mesh, distributed_pgo_normal_equations,
                                   distributed_pgo_step, sharded_quick_track)


def _random_graph(rng, n_vertices, n_edges):
    poses = np.tile(nps.sim3_identity(), (n_vertices, 1)).astype(np.float32)
    poses[:, 4:7] = rng.normal(0, 0.3, (n_vertices, 3))
    efrom = rng.integers(0, n_vertices, n_edges).astype(np.int32)
    eto = (efrom + 1 + rng.integers(0, n_vertices - 1, n_edges)) % n_vertices
    eto = eto.astype(np.int32)
    meas = np.tile(nps.sim3_identity(), (n_edges, 1)).astype(np.float32)
    meas[:, 4:7] = rng.normal(0, 0.1, (n_edges, 3))
    meas_inv = np.stack([nps.sim3_inverse(m) for m in meas]).astype(np.float32)
    info = np.tile(np.eye(7, dtype=np.float32), (n_edges, 1, 1))
    deltas = np.full(n_edges, 1e6, np.float32)
    return poses, efrom, eto, meas_inv, info, deltas


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_assembly_matches_single_device():
    rng = np.random.default_rng(0)
    n_v, n_e = 10, 24  # divisible by 8
    poses, efrom, eto, meas_inv, info, deltas = _random_graph(rng, n_v, n_e)

    H1, g1, chi1 = _assemble(jnp.asarray(poses), jnp.asarray(efrom),
                             jnp.asarray(eto), jnp.asarray(meas_inv),
                             jnp.asarray(info), jnp.asarray(deltas), n_v)

    mesh = make_mesh(8)
    fn = distributed_pgo_normal_equations(mesh, n_v)
    H2, g2, chi2 = fn(jnp.asarray(poses), jnp.asarray(efrom),
                      jnp.asarray(eto), jnp.asarray(meas_inv),
                      jnp.asarray(info), jnp.asarray(deltas))

    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(chi1)), float(chi2), rtol=1e-4)


def test_distributed_step_reduces_chi2():
    rng = np.random.default_rng(1)
    n_v, n_e = 8, 16
    poses, efrom, eto, meas_inv, info, deltas = _random_graph(rng, n_v, n_e)
    fixed = np.zeros(n_v, bool)
    fixed[0] = True
    mesh = make_mesh(8)
    step = distributed_pgo_step(mesh, n_v)
    p = jnp.asarray(poses)
    chis = []
    for _ in range(6):
        p, chi, _ = step(p, jnp.asarray(fixed), jnp.asarray(efrom),
                         jnp.asarray(eto), jnp.asarray(meas_inv),
                         jnp.asarray(info), jnp.asarray(deltas),
                         jnp.float32(1e-6))
        chis.append(float(chi))
    assert chis[-1] < 0.5 * chis[0], chis


def test_sharded_quick_track_matches_batch():
    from lsd_slam_tpu.tracking.quick_tracker import QuickTracker
    from lsd_slam_tpu.tracking.reference import PointSet, compact_points
    from lsd_slam_tpu.ops.interp import quad_pack
    from lsd_slam_tpu.camera import Camera

    rng = np.random.default_rng(2)
    width, height = 64, 48
    cam = Camera(fx=0.7 * width, fy=0.7 * width, cx=(width - 1) / 2,
                 cy=(height - 1) / 2, width=width, height=height)
    qt = QuickTracker(cam)
    l = qt.level
    h4, w4 = height >> l, width >> l
    n_kf = 8
    imgs = rng.uniform(0, 255, (n_kf, h4, w4)).astype(np.float32)
    idepth = np.full((n_kf, h4, w4), 0.5, np.float32)
    ivar = np.full((n_kf, h4, w4), 0.01, np.float32)
    frame_quad = quad_pack((jnp.asarray(imgs[0]),
                            jnp.zeros((h4, w4), jnp.float32),
                            jnp.zeros((h4, w4), jnp.float32)))
    inits = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (n_kf, 1))

    def pointset(k):
        zeros = np.zeros_like(imgs[k])
        fields = jnp.asarray(np.stack(
            [imgs[k], zeros, zeros, idepth[k], ivar[k]], axis=-1
        ).reshape(-1, 5))
        valid = jnp.ones((h4, w4), bool)
        idx, vals, slot_valid, n_valid = compact_points(valid, fields, h4 * w4)
        return PointSet(idx=idx, ival=vals[:, 0], gx=vals[:, 1],
                        gy=vals[:, 2], idp=vals[:, 3], ivr=vals[:, 4],
                        valid=slot_valid, n_valid=n_valid)

    refs = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[pointset(k) for k in range(n_kf)])
    batch = qt._trackN(refs, frame_quad, jnp.asarray(inits))

    mesh = make_mesh(8)
    fn = sharded_quick_track(mesh, qt)
    out = fn(refs, frame_quad, jnp.asarray(inits))
    np.testing.assert_allclose(np.asarray(batch.ref_to_frame),
                               np.asarray(out[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(batch.tracking_good),
                                  np.asarray(out[1]))


def test_distributed_cg_step_matches_dense_step():
    """The edge-sharded PCG step must agree with the dense distributed
    step (same damped-GN system, different solver) and reduce chi2."""
    from lsd_slam_tpu.parallel import distributed_pgo_cg_step

    rng = np.random.default_rng(4)
    n_v, n_e = 12, 32
    poses, efrom, eto, meas_inv, info, deltas = _random_graph(rng, n_v, n_e)
    fixed = np.zeros(n_v, bool)
    fixed[0] = True
    mesh = make_mesh(8)
    dense_step = distributed_pgo_step(mesh, n_v)
    cg_step = distributed_pgo_cg_step(mesh, n_v, max_cg_iters=400)

    args = (jnp.asarray(fixed), jnp.asarray(efrom), jnp.asarray(eto),
            jnp.asarray(meas_inv), jnp.asarray(info), jnp.asarray(deltas),
            jnp.float32(1e-6))
    p_dense, chi_d, _ = dense_step(jnp.asarray(poses), *args)
    p_cg, chi_c, _ = cg_step(jnp.asarray(poses), *args)
    np.testing.assert_allclose(float(chi_d), float(chi_c), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_dense), np.asarray(p_cg),
                               atol=5e-4)

    # iterate the CG step: chi2 must fall
    p = jnp.asarray(poses)
    chis = []
    for _ in range(6):
        p, chi, _ = cg_step(p, *args)
        chis.append(float(chi))
    assert chis[-1] < 0.5 * chis[0], chis
