"""The Pallas regularize stencil must match the XLA shift lattice exactly
(both evaluate the same 25-tap math; interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lsd_slam_tpu.ops.pallas_stencil import regularize_accumulators
from lsd_slam_tpu.depth.regularize import _regularize_accumulators_xla


def _random_planes(rng, h, w):
    idepth = rng.uniform(0.2, 2.0, (h, w)).astype(np.float32)
    var = rng.uniform(0.001, 0.3, (h, w)).astype(np.float32)
    valid = rng.uniform(size=(h, w)) < 0.6
    validity = rng.uniform(0, 50, (h, w)).astype(np.float32)
    # invalid pixels carry zeros like the real state
    idepth = np.where(valid, idepth, 0.0).astype(np.float32)
    return idepth, var, valid, validity


def test_pallas_matches_xla_lattice():
    rng = np.random.default_rng(0)
    h, w = 48, 64
    idepth, var, valid, validity = _random_planes(rng, h, w)
    reg_dist_var, diff_fac = 0.075, 1.0

    ref = _regularize_accumulators_xla(
        jnp.asarray(idepth), jnp.asarray(var), jnp.asarray(valid),
        jnp.asarray(validity), reg_dist_var, diff_fac)
    out = regularize_accumulators(
        jnp.asarray(idepth), jnp.asarray(var),
        jnp.asarray(valid).astype(jnp.float32), jnp.asarray(validity),
        reg_dist_var, diff_fac, interpret=True)

    names = ["sum_id", "sum_ivar", "val_sum", "n_occ", "n_not_occ"]
    for name, a, b in zip(names, ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_pallas_odd_tile_height():
    # h=40 picks tile_h=40 (single divisor path), w non-multiple of 128
    rng = np.random.default_rng(1)
    h, w = 40, 52
    idepth, var, valid, validity = _random_planes(rng, h, w)
    ref = _regularize_accumulators_xla(
        jnp.asarray(idepth), jnp.asarray(var), jnp.asarray(valid),
        jnp.asarray(validity), 0.01, 1.0)
    out = regularize_accumulators(
        jnp.asarray(idepth), jnp.asarray(var),
        jnp.asarray(valid).astype(jnp.float32), jnp.asarray(validity),
        0.01, 1.0, interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
