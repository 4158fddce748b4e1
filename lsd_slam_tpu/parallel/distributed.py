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


def default_mesh() -> Mesh | None:
    """The engine's mesh: all LOCAL devices when more than one is present
    (a pod slice, or the virtual CPU mesh in tests), else None — callers
    fall back to single-device paths. Local only: under jax.distributed a
    global mesh would require every process to join each program, but the
    engine's sharded batches are per-host work — cross-process programs go
    through parallel/multihost_engine instead."""
    devs = jax.local_devices()
    return Mesh(np.asarray(devs), (AXIS,)) if len(devs) > 1 else None


def pad_to_mesh(n: int, mesh: Mesh | None, minimum: int = 4) -> int:
    """Smallest power-of-two-ish bucket >= n that divides by the mesh size.
    Bucketing keeps the jitted batch programs to a handful of shapes
    instead of recompiling per candidate count."""
    base = max(minimum, mesh.devices.size if mesh is not None else 1)
    b = base
    while b < n:
        b *= 2
    return b


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


@functools.lru_cache(maxsize=None)
def distributed_pgo_normal_equations(mesh: Mesh, n_vertices: int):
    """Returns a jitted fn assembling H, g with edges sharded over the mesh.

    Inputs: poses (N, 8) replicated; edge arrays (E, ...) sharded on axis 0
    (E must divide by mesh size — pad with zero-information self-edges).
    Output: H (7N, 7N), g (7N), chi2 sum — fully replicated.

    Collective design: each chip computes the 7x7 GN blocks for ITS edge
    slice, then the per-edge blocks are all_gather'ed — O(E*49) traffic —
    and every chip assembles the dense H redundantly (cheap scatter-adds).
    Round 3 psum-reduced the assembled (N, N, 7, 7) H instead, which moves
    O(N^2*49) per step and made the 8-device path 2.2x SLOWER than one
    device; for real graphs E << N^2 (E ~ 10N), so gathering blocks is the
    right collective."""

    def local_assemble(poses, efrom, eto, meas_inv, info, huber_delta):
        AtWA, AtWr, chi2 = _edge_blocks(poses, efrom, eto, meas_inv, info,
                                        huber_delta)
        # gather the edge axis back: every chip gets all E blocks
        AtWA = jax.lax.all_gather(AtWA, AXIS, tiled=True)
        AtWr = jax.lax.all_gather(AtWr, AXIS, tiled=True)
        chi2 = jax.lax.all_gather(chi2, AXIS, tiled=True)
        efrom = jax.lax.all_gather(efrom, AXIS, tiled=True)
        eto = jax.lax.all_gather(eto, AXIS, tiled=True)
        H = jnp.zeros((n_vertices, n_vertices, 7, 7), jnp.float32)
        g = jnp.zeros((n_vertices, 7), jnp.float32)
        H = H.at[efrom, efrom].add(AtWA)
        H = H.at[eto, eto].add(AtWA)
        H = H.at[efrom, eto].add(-AtWA)
        H = H.at[eto, efrom].add(-AtWA)
        g = g.at[efrom].add(-AtWr)
        g = g.at[eto].add(AtWr)
        chi2_sum = jnp.sum(chi2)
        Hd = H.transpose(0, 2, 1, 3).reshape(n_vertices * 7, n_vertices * 7)
        return Hd, g.reshape(-1), chi2_sum

    fn = shard_map(
        local_assemble, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
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
        fixed7 = jnp.repeat(fixed_mask, 7)
        keep = (~fixed7).astype(jnp.float32)
        H = H * keep[:, None] * keep[None, :] + jnp.diag(fixed7.astype(jnp.float32))
        g = g * keep
        H = H + jnp.diag(lam * (jnp.abs(jnp.diag(H)) + 1.0))
        delta = jnp.linalg.solve(H, -g)
        new_poses = lie.sim3_mul(lie.sim3_exp(delta.reshape(n_vertices, 7)),
                                 poses)
        # dmax lets the host LM loop reject runaway steps without pulling
        # the whole delta vector
        return new_poses, chi2, jnp.max(jnp.abs(delta))

    return step


@functools.lru_cache(maxsize=None)
def distributed_pgo_cg_step(mesh: Mesh, n_vertices: int,
                            max_cg_iters: int = 250):
    """One damped-GN step solved matrix-free by block-Jacobi PCG with the
    edge set sharded over the mesh — the large-graph companion of
    distributed_pgo_step (which materializes the dense (7N,7N) system).

    Each chip holds an edge slice; every CG matvec is a local
    gather/block-product/scatter over that slice followed by ONE psum of
    the (N, 7) vector — the collective rides ICI and costs O(N), not
    O(N^2). The CG state (x, r, p) stays replicated. See
    mapping/sparse_pgo.py for the single-chip math this distributes.
    """

    def local_step(poses, fixed_mask, efrom, eto, meas_inv, info,
                   huber_delta, lam):
        blocks, AtWr, chi2 = _edge_blocks(poses, efrom, eto, meas_inv, info,
                                          huber_delta)
        keep = (~fixed_mask).astype(jnp.float32)[:, None]

        g = jnp.zeros((n_vertices, 7), jnp.float32)
        g = g.at[efrom].add(-AtWr)
        g = g.at[eto].add(AtWr)
        g = jax.lax.psum(g, AXIS)
        b = -g * keep
        chi2_sum = jax.lax.psum(jnp.sum(chi2), AXIS)

        D = jnp.zeros((n_vertices, 7, 7), jnp.float32)
        D = D.at[efrom].add(blocks)
        D = D.at[eto].add(blocks)
        D = jax.lax.psum(D, AXIS)
        dii = jnp.abs(jnp.diagonal(D, axis1=1, axis2=2))
        damp = lam * (dii + 1.0)
        D = D + jax.vmap(jnp.diag)(damp)
        eye = jnp.broadcast_to(jnp.eye(7, dtype=jnp.float32), D.shape)
        D = jnp.where(fixed_mask[:, None, None], eye, D)
        Dinv = jnp.linalg.inv(D + 1e-9 * eye)

        def matvec(v):
            v = v * keep
            dv = v[efrom] - v[eto]
            t = jnp.einsum("eij,ej->ei", blocks, dv, precision=_HI)
            hv = jnp.zeros_like(v)
            hv = hv.at[efrom].add(t)
            hv = hv.at[eto].add(-t)
            hv = jax.lax.psum(hv, AXIS)        # the ICI reduction per matvec
            return (hv + damp * v) * keep

        def precond(r):
            return jnp.einsum("nij,nj->ni", Dinv, r, precision=_HI) * keep

        x0 = jnp.zeros_like(b)
        z0 = precond(b)
        rz0 = jnp.sum(b * z0)
        bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

        def cond(s):
            x, r, z, p, rz, it = s
            return ((it < max_cg_iters)
                    & (jnp.sqrt(jnp.sum(r * r)) / bnorm > 1e-7))

        def body(s):
            x, r, z, p, rz, it = s
            hp = matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
            x = x + alpha * p
            r = r - alpha * hp
            z = precond(r)
            rz_new = jnp.sum(r * z)
            p = z + rz_new / jnp.maximum(rz, 1e-30) * p
            return (x, r, z, p, rz_new, it + 1)

        delta, _, _, _, _, _ = jax.lax.while_loop(
            cond, body, (x0, b, z0, z0, rz0, jnp.int32(0)))
        new_poses = lie.sim3_mul(lie.sim3_exp(delta), poses)
        return new_poses, chi2_sum, jnp.max(jnp.abs(delta))

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# sharded batched coarse tracking (candidate scoring / relocalization)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sharded_quick_track_cached(mesh, cam, cfg, sigma2, level):
    from lsd_slam_tpu.tracking.quick_tracker import _quick_impl
    impl = functools.partial(_quick_impl, cam, cfg, sigma2, level)

    def local(refs, frame_level, inits):
        res = jax.vmap(impl, in_axes=(0, None, 0))(
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


def sharded_quick_track(mesh: Mesh, quick_tracker):
    """Wrap the quick tracker's batched track so the candidate axis shards
    over the mesh: each chip tracks its slice of keyframes against the same
    (replicated) query frame. Cached process-wide on
    (mesh, camera, config, sigma2, level)."""
    return _sharded_quick_track_cached(
        mesh, quick_tracker.cam, quick_tracker.cfg, quick_tracker.sigma2,
        quick_tracker.level)


@functools.lru_cache(maxsize=None)
def _sharded_quick_track_frames_cached(mesh, cam, cfg, sigma2, level):
    from lsd_slam_tpu.tracking.quick_tracker import _quick_impl
    impl = functools.partial(_quick_impl, cam, cfg, sigma2, level)

    def local(ref_pts, frames, inits):
        res = jax.vmap(impl, in_axes=(None, 0, 0))(
            ref_pts, frames, inits)
        return (res.ref_to_frame, res.tracking_good, res.point_usage,
                res.good_count, res.bad_count)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_quick_track_frames(mesh: Mesh, quick_tracker):
    """The reciprocal direction: ONE reference point set (replicated)
    tracked against a mesh-sharded batch of frame quad layouts — the
    second half of the close-candidate reciprocal SE3 pre-check
    (SlamSystem.cpp:1283-1310) runs one shard of candidates per chip.
    Cached process-wide like `sharded_quick_track`."""
    return _sharded_quick_track_frames_cached(
        mesh, quick_tracker.cam, quick_tracker.cfg, quick_tracker.sigma2,
        quick_tracker.level)
