"""Device-mesh primitives for multi-chip SLAM.

Design (SURVEY.md section 2.10 P6): keyframes and constraint candidates are
the data-parallel axis; pose-graph normal equations reduce over ICI with
psum. Everything is expressed with `shard_map` over a 1-D mesh so the same
code runs on a real pod slice or on N virtual CPU devices
(--xla_force_host_platform_device_count) for testing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=None):
        kw = {} if check_rep is None else {"check_vma": check_rep}
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, **kw)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from lsd_slam_tpu import lie

_HI = jax.lax.Precision.HIGHEST

AXIS = "kf"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


# ---------------------------------------------------------------------------
# distributed pose-graph normal equations
# ---------------------------------------------------------------------------

def _edge_blocks(poses, efrom, eto, meas_inv, info, huber_delta):
    """Per-edge GN blocks (same math as mapping.pose_graph._assemble)."""
    xf = poses[efrom]
    xt = poses[eto]
    xf_inv = lie.sim3_inverse(xf)
    r = lie.sim3_log(lie.sim3_mul(lie.sim3_mul(xf_inv, xt), meas_inv))
    chi2 = jnp.einsum("ei,eij,ej->e", r, info, r, precision=_HI)
    w = jnp.where(chi2 <= huber_delta * huber_delta, 1.0,
                  huber_delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
    A = lie.sim3_adjoint(xf_inv)
    WI = info * w[:, None, None]
    AtW = jnp.einsum("eji,ejk->eik", A, WI, precision=_HI)
    AtWA = jnp.einsum("eij,ejk->eik", AtW, A, precision=_HI)
    AtWr = jnp.einsum("eij,ej->ei", AtW, r, precision=_HI)
    return AtWA, AtWr, chi2


def distributed_pgo_normal_equations(mesh: Mesh, n_vertices: int):
    """Returns a jitted fn assembling H, g with edges sharded over the mesh.

    Inputs: poses (N, 8) replicated; edge arrays (E, ...) sharded on axis 0
    (E must divide by mesh size — pad with zero-information self-edges).
    Output: H (7N, 7N), g (7N), chi2 sum — fully replicated after psum.
    """

    def local_assemble(poses, efrom, eto, meas_inv, info, huber_delta):
        AtWA, AtWr, chi2 = _edge_blocks(poses, efrom, eto, meas_inv, info,
                                        huber_delta)
        H = jnp.zeros((n_vertices, n_vertices, 7, 7), jnp.float32)
        g = jnp.zeros((n_vertices, 7), jnp.float32)
        H = H.at[efrom, efrom].add(AtWA)
        H = H.at[eto, eto].add(AtWA)
        H = H.at[efrom, eto].add(-AtWA)
        H = H.at[eto, efrom].add(-AtWA)
        g = g.at[efrom].add(-AtWr)
        g = g.at[eto].add(AtWr)
        # the ICI reduction: every chip contributes its edge slice
        H = jax.lax.psum(H, AXIS)
        g = jax.lax.psum(g, AXIS)
        chi2_sum = jax.lax.psum(jnp.sum(chi2), AXIS)
        Hd = H.transpose(0, 2, 1, 3).reshape(n_vertices * 7, n_vertices * 7)
        return Hd, g.reshape(-1), chi2_sum

    fn = shard_map(
        local_assemble, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(fn)


def distributed_pgo_step(mesh: Mesh, n_vertices: int):
    """One damped GN step fully on-device: assemble (sharded) + dense solve
    (replicated) + vertex update. The solve is replicated rather than
    sharded — for the graph sizes where a dense solve is right (<= ~1.5k
    keyframes) the assembly dominates."""
    assemble = distributed_pgo_normal_equations(mesh, n_vertices)

    @jax.jit
    def step(poses, fixed_mask, efrom, eto, meas_inv, info, huber_delta,
             lam):
        H, g, chi2 = assemble(poses, efrom, eto, meas_inv, info, huber_delta)
        n7 = n_vertices * 7
        fixed7 = jnp.repeat(fixed_mask, 7)
        keep = (~fixed7).astype(jnp.float32)
        H = H * keep[:, None] * keep[None, :] + jnp.diag(fixed7.astype(jnp.float32))
        g = g * keep
        H = H + jnp.diag(lam * (jnp.abs(jnp.diag(H)) + 1.0))
        delta = jnp.linalg.solve(H, -g)
        new_poses = lie.sim3_mul(lie.sim3_exp(delta.reshape(n_vertices, 7)),
                                 poses)
        return new_poses, chi2

    return step


# ---------------------------------------------------------------------------
# sharded batched coarse tracking (candidate scoring / relocalization)
# ---------------------------------------------------------------------------

def sharded_quick_track(mesh: Mesh, quick_tracker):
    """Wrap QuickTracker's batched track so the candidate axis shards over
    the mesh: each chip tracks its slice of keyframes against the same
    (replicated) query frame."""

    def local(refs, frame_level, inits):
        res = jax.vmap(quick_tracker._impl, in_axes=(0, None, 0))(
            refs, frame_level, inits)
        return (res.ref_to_frame, res.tracking_good, res.point_usage,
                res.good_count, res.bad_count)

    fn = shard_map(
        local, mesh=mesh,
        # refs is a PointSet pytree of (N, ...) stacked arrays; a single
        # P(AXIS) is a pytree prefix that shards every leaf on axis 0
        in_specs=(P(AXIS), P(), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        # the LM while_loop carries replicated scalars that become varying
        # per-shard; skip the varying-manual-axes check
        check_rep=False,
    )
    return jax.jit(fn)
