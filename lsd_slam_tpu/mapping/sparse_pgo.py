"""Sparse Sim(3) pose-graph solver: block-Jacobi preconditioned CG.

The dense path (mapping/pose_graph.py) materializes the (7N, 7N) normal
matrix — right for the reference's operating envelope (~1000 keyframes,
README.md:313-314) only up to a few hundred vertices on accelerator
memory/solve-time budgets. This module is the large-graph path SURVEY §7
T5 calls for ("dense solve for small graphs, sparse/Schur + CG for
large"): the Gauss-Newton system H delta = -g is solved WITHOUT forming H.

TPU-native design:
  * H's only nonzeros are 7x7 blocks on the edge pattern; the matvec
    H v = sum_e B_e (v_i - v_j) scattered back to (i, j) is two gathers,
    one batched 7x7 block product (MXU), and two scatter-adds — O(E)
    memory instead of O(N^2);
  * block-Jacobi preconditioner: the diagonal blocks D_i (plus LM
    damping) inverted as one batched 7x7 solve per CG run;
  * the whole PCG loop is a single lax.while_loop on device — no host
    round-trips; one device->host transfer of delta per GN iteration.

Fixed vertices (gauge freedom) are handled by projection: their residual
/search-direction components are zeroed every iteration and their
preconditioner block is identity, which is algebraically identical to the
dense path's row/col clearing (pose_graph.py).

g2o's CSparse backend (KeyFrameGraph.cpp:65-80) is the reference
equivalent; CG over the edge pattern replaces sparse Cholesky because
scatter/gather + batched small matmuls map to TPU while sparse
factorization does not.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from lsd_slam_tpu import lie

_HI = jax.lax.Precision.HIGHEST


def edge_blocks(poses, efrom, eto, meas_inv, info, huber_delta):
    """Per-edge GN blocks: B_e = J^T W J restricted to the 'to' side
    (J_to = Adj(X_from^-1), J_from = -J_to — g2oTypeSim3Sophus.h:69-85),
    plus the gradient contribution A^T W r and robust chi2."""
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


def _matvec(blocks, efrom, eto, v):
    """H v without materializing H: per-edge B_e (v_from - v_to)
    scattered +to from, -to to. v: (N, 7) -> (N, 7)."""
    dv = v[efrom] - v[eto]                                     # (E, 7)
    t = jnp.einsum("eij,ej->ei", blocks, dv, precision=_HI)    # (E, 7)
    out = jnp.zeros_like(v)
    out = out.at[efrom].add(t)
    out = out.at[eto].add(-t)
    return out


@functools.partial(jax.jit, static_argnames=("n_vertices", "max_iters"))
def pcg_solve(poses, fixed_mask, efrom, eto, meas_inv, info, huber_delta,
              lam, n_vertices: int, max_iters: int, tol: float = 1e-7):
    """One damped-GN right-hand side solved by block-Jacobi PCG.

    Returns (delta (N,7), chi2_sum, cg_iters_used, rel_residual)."""
    blocks, AtWr, chi2 = edge_blocks(poses, efrom, eto, meas_inv, info,
                                     huber_delta)

    keep = (~fixed_mask).astype(jnp.float32)[:, None]          # (N, 1)

    g = jnp.zeros((n_vertices, 7), jnp.float32)
    g = g.at[efrom].add(-AtWr)
    g = g.at[eto].add(AtWr)
    b = -g * keep                                              # rhs

    # diagonal blocks + LM damping (same rule as the dense path)
    D = jnp.zeros((n_vertices, 7, 7), jnp.float32)
    D = D.at[efrom].add(blocks)
    D = D.at[eto].add(blocks)
    dii = jnp.abs(jnp.diagonal(D, axis1=1, axis2=2))
    damp = lam * (dii + 1.0)
    D = D + jax.vmap(jnp.diag)(damp)
    # fixed vertices: identity block (projection keeps them at zero anyway)
    eye = jnp.broadcast_to(jnp.eye(7, dtype=jnp.float32), D.shape)
    D = jnp.where(fixed_mask[:, None, None], eye, D)
    # the damped matvec needs the same diagonal boost
    def matvec(v):
        v = v * keep
        hv = _matvec(blocks, efrom, eto, v) + damp * v
        return hv * keep

    Dinv = jnp.linalg.inv(D + 1e-9 * eye)                      # (N, 7, 7)

    def precond(r):
        return jnp.einsum("nij,nj->ni", Dinv, r, precision=_HI) * keep

    x0 = jnp.zeros_like(b)
    r0 = b                      # x0 = 0
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm = jnp.sqrt(jnp.sum(b * b)) + 1e-30

    def cond(s):
        x, r, z, p, rz, it = s
        return (it < max_iters) & (jnp.sqrt(jnp.sum(r * r)) / bnorm > tol)

    def body(s):
        x, r, z, p, rz, it = s
        hp = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, _, _, _, iters = jax.lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.int32(0)))
    rel = jnp.sqrt(jnp.sum(r * r)) / bnorm
    return x, jnp.sum(chi2), iters, rel


@jax.jit
def apply_update(poses, delta):
    return lie.sim3_mul(lie.sim3_exp(delta), poses)


def optimize_sparse(graph, num_iterations: int, max_cg_iters: int = 250):
    """Drive PCG GN iterations over a host-side PoseGraph container.

    Mirrors PoseGraph.optimize's damping/rollback policy so callers can
    switch solvers purely on size. Returns max |log| vertex change."""
    from lsd_slam_tpu.lie import np_sim3 as nps

    # edge count snapshotted BEFORE vertex count so concurrent appends by
    # the async constraint worker can't produce an edge past the vertex
    # slice (vertices always precede their edges)
    e = graph.n_edges
    n = graph.n_vertices
    if n < 2 or e == 0:
        return 0.0

    poses0 = np.stack(graph.poses[:n]).astype(np.float32)
    efrom = jnp.asarray(np.asarray(graph.e_from[:e], np.int32))
    eto = jnp.asarray(np.asarray(graph.e_to[:e], np.int32))
    meas_inv = jnp.asarray(np.stack(graph.e_meas_inv[:e]), jnp.float32)
    info = jnp.asarray(np.stack(graph.e_info[:e]), jnp.float32)
    deltas = jnp.asarray(np.asarray(graph.e_delta[:e], np.float32))
    fixed = np.asarray(graph.fixed[:n], bool)
    fixed_j = jnp.asarray(fixed)

    poses_j = jnp.asarray(poses0)
    lam = 1e-6
    last_chi2 = None
    for _ in range(num_iterations):
        delta, chi2, iters, rel = pcg_solve(
            poses_j, fixed_j, efrom, eto, meas_inv, info, deltas,
            jnp.float32(lam), n, max_cg_iters)
        total_chi2 = float(chi2)
        dmax = float(jnp.max(jnp.abs(delta)))
        if not np.isfinite(dmax) or dmax > 10.0:
            lam *= 10
            continue
        poses_j = apply_update(poses_j, delta)
        if last_chi2 is not None and total_chi2 > last_chi2 * 1.5:
            lam *= 10
        else:
            lam = max(lam * 0.3, 1e-8)
        last_chi2 = total_chi2
        if dmax < 1e-9:
            break

    new_poses = np.asarray(poses_j, np.float64)
    new_poses[:, 0:4] /= np.linalg.norm(new_poses[:, 0:4], axis=1,
                                        keepdims=True)
    max_change = 0.0
    for i in range(n):
        if not fixed[i]:
            d = nps.sim3_mul(nps.sim3_inverse(graph.poses[i]), new_poses[i])
            max_change = max(max_change, nps.sim3_log_norm(d))
            graph.poses[i] = new_poses[i]
    return float(max_change)
