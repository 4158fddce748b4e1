"""Sim(3) direct alignment between two keyframes with depth.

TPU-native re-design of Sim3Tracker (src/Tracking/Sim3Tracker.{h,cpp}):
photometric residual like SE3 plus an inverse-depth residual
r_d = 1/z_warped - idepth_target(u, v) (calcSim3Buffers,
Sim3Tracker.cpp:414-607, depth part 527-541); ESM-style gradient averaging
with roll-compensated source gradients (Sim3Tracker.cpp:451-507); coupled
Huber over |r_d| sqrt(w_d) + |r_p| sqrt(w_p) (Sim3Tracker.cpp:779-804);
LGS7 = LGS6(photo) + LGS4(depth, dims {2,3,4,6}) (calcSim3LGS,
Sim3Tracker.cpp:992-1047, LGSX.h:422-442); LM over Sim3::exp with the same
accept/reject lattice as the SE3 tracker; outputs the 7x7 Hessian as the
constraint information matrix (lastSim3Hessian, Sim3Tracker.cpp:354-363).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from lsd_slam_tpu import lie
from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import TrackerConfig
from lsd_slam_tpu.ops.interp import quad_sample, quad_nearest
from lsd_slam_tpu.tracking.reference import TrackingRef, PointSet

_HI = jax.lax.Precision.HIGHEST


@struct.dataclass
class Sim3TrackResult:
    ref_to_frame: jnp.ndarray    # Sim3 (8,)
    frame_to_ref: jnp.ndarray    # Sim3 (8,)
    diverged: jnp.ndarray        # bool
    last_residual: jnp.ndarray   # coupled mean residual
    depth_residual: jnp.ndarray
    photo_residual: jnp.ndarray
    point_usage: jnp.ndarray
    hessian: jnp.ndarray         # (7, 7) undivided LGS7 A


def _roll_matrix(rot_unscaled):
    """Rotation aligning the rotated optical axis back to -z, times R —
    used to rotate source gradients into the target frame
    (Sim3Tracker.cpp:451-462)."""
    fwd = jnp.array([0.0, 0.0, -1.0])
    rf = rot_unscaled @ fwd
    # shortest rotation from rf to fwd (half-way quaternion construction)
    d = jnp.dot(rf, fwd)
    axis = jnp.cross(rf, fwd)
    qw = 1.0 + d
    q = jnp.concatenate([jnp.array([qw]), axis])
    # degenerate (rf == -fwd) can't happen for sane constraint candidates
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
    return jnp.matmul(lie.quat_to_matrix(q), rot_unscaled, precision=_HI)


def _sim3_residual_pass(pose, aff_a, aff_b, pts: PointSet, frame_quad,
                        cam: Camera, cfg: TrackerConfig, use_esm: bool):
    """One Sim3 warp + ONE quad row-gather: the (H*W, 20) sim3_quad rows
    carry [image, gx, gy, idepth, idepth_var] x 4 bilinear taps, so the
    photometric sample AND the rounded-pixel depth lookup
    (Sim3Tracker.cpp:527-541) ride the same gather."""
    h, w = cam.height, cam.width
    s = pose[7]
    rot_unscaled = lie.quat_to_matrix(pose[0:4])
    rot = rot_unscaled * s
    t = pose[4:7]

    xs = (pts.idx % w).astype(jnp.float32)
    ys = (pts.idx // w).astype(jnp.float32)
    safe_id = jnp.where(pts.valid, pts.idp, 1.0)
    z_ref = 1.0 / safe_id
    px = (xs - cam.cx) / cam.fx * z_ref
    py = (ys - cam.cy) / cam.fy * z_ref

    wx = rot[0, 0] * px + rot[0, 1] * py + rot[0, 2] * z_ref + t[0]
    wy = rot[1, 0] * px + rot[1, 1] * py + rot[1, 2] * z_ref + t[1]
    wz = rot[2, 0] * px + rot[2, 1] * py + rot[2, 2] * z_ref + t[2]

    safe_wz = jnp.where(wz == 0, 1e-9, wz)
    u = wx / safe_wz * cam.fx + cam.cx
    v = wy / safe_wz * cam.fy + cam.cy
    in_img = (u > 1) & (v > 1) & (u < w - 2) & (v < h - 2) & pts.valid

    (i_new, gxn, gyn, _, _), raw, (fu, fv) = quad_sample(frame_quad, h, w, u, v)

    if use_esm:
        rollm = _roll_matrix(rot_unscaled)
        rgx = rollm[0, 0] * pts.gx + rollm[0, 1] * pts.gy
        rgy = rollm[1, 0] * pts.gx + rollm[1, 1] * pts.gy
        dx = cam.fx * 0.5 * (gxn + rgx)
        dy = cam.fy * 0.5 * (gyn + rgy)
    else:
        dx = cam.fx * gxn
        dy = cam.fy * gyn

    c1 = aff_a * pts.ival + aff_b
    rp = c1 - i_new

    m = in_img.astype(jnp.float32)
    # affine moments: note weight kink at 2.0 (not 5.0 like SE3;
    # Sim3Tracker.cpp:517-523)
    wa = jnp.where(jnp.abs(rp) < 2.0, 1.0,
                   2.0 / jnp.maximum(jnp.abs(rp), 1e-6)) * m
    sxx = jnp.sum(c1 * c1 * wa)
    syy = jnp.sum(i_new * i_new * wa)
    sx = jnp.sum(c1 * wa)
    sy = jnp.sum(i_new * wa)
    sw = jnp.maximum(jnp.sum(wa), 1e-6)
    var_c1 = jnp.maximum(sxx - sx * sx / sw, 1e-6)
    var_c2 = jnp.maximum(syy - sy * sy / sw, 1e-6)
    # composed affine update (see se3_tracker._residual_pass note)
    aff_a_inc = jnp.sqrt(var_c2 / var_c1)
    aff_b_inc = (sy - aff_a_inc * sx) / sw
    aff_a_new = aff_a_inc * aff_a
    aff_b_new = aff_a_inc * aff_b + aff_b_inc

    # depth residual at the rounded target pixel (Sim3Tracker.cpp:527-541):
    # select the nearest of the four already-gathered quad taps
    f_id = quad_nearest(raw, 3, 5, fu, fv)
    f_var = quad_nearest(raw, 4, 5, fu, fv)
    has_depth = in_img & (f_var > 0)
    rd = jnp.where(has_depth, 1.0 / safe_wz - f_id, 0.0)

    usage = jnp.sum(jnp.minimum(z_ref / jnp.where(in_img, safe_wz, 1.0), 1.0) * m)

    buffers = dict(px=wx, py=wy, pz=jnp.where(in_img, wz, 1.0),
                   dx=dx, dy=dy, rp=rp, rd=rd,
                   d=pts.idp, var=pts.ivr, fvar=f_var,
                   mask=in_img, has_depth=has_depth)
    stats = dict(in_count=jnp.sum(m), usage=usage,
                 aff_a_new=aff_a_new, aff_b_new=aff_b_new)
    return buffers, stats


def _sim3_weights(pose, buffers, cfg: TrackerConfig, sigma2: float):
    """Coupled Huber weights (calcSim3WeightsAndResidual,
    Sim3Tracker.cpp:749-840)."""
    t = pose[4:7]
    px, py, pz = buffers["px"], buffers["py"], buffers["pz"]
    d = jnp.where(buffers["mask"], buffers["d"], 1.0)
    rp, rd = buffers["rp"], buffers["rd"]
    m = buffers["mask"].astype(jnp.float32)
    md = buffers["has_depth"].astype(jnp.float32)

    g0 = (t[0] * pz - t[2] * px) / (pz * pz * d)
    g1 = (t[1] * pz - t[2] * py) / (pz * pz * d)
    g2 = (pz - t[2]) / (pz * pz * d)

    s = cfg.var_weight * buffers["var"]
    sv = cfg.var_weight * buffers["fvar"]
    drpdd = buffers["dx"] * g0 + buffers["dy"] * g1
    w_p = 1.0 / (sigma2 + s * drpdd * drpdd)
    w_d = 1.0 / jnp.maximum(sv + g2 * g2 * s, 1e-12)

    wrd = jnp.abs(rd) * jnp.sqrt(w_d)
    wrp = jnp.abs(rp) * jnp.sqrt(w_p)
    w_abs = jnp.where(buffers["has_depth"], wrd + wrp, wrp)
    wh = jnp.where(w_abs < cfg.huber_d, 1.0,
                   cfg.huber_d / jnp.maximum(w_abs, 1e-9))

    weight_p = wh * w_p * m
    weight_d = wh * w_d * md

    sum_d = jnp.sum(weight_d * rd * rd)
    sum_p = jnp.sum(weight_p * rp * rp)
    n_d = jnp.maximum(jnp.sum(md), 1.0)
    n_p = jnp.maximum(jnp.sum(m), 1.0)
    mean = (sum_d + sum_p) / (n_d + n_p)
    return weight_p, weight_d, mean, sum_d / n_d, sum_p / n_p


def _sim3_normal_equations(buffers, weight_p, weight_d):
    """LGS7 = LGS6(photo) + LGS4(depth at dims {2,3,4,6})."""
    px, py, pz = buffers["px"], buffers["py"], buffers["pz"]
    gx, gy = buffers["dx"], buffers["dy"]
    rp, rd = buffers["rp"], buffers["rd"]
    z = 1.0 / pz
    z2 = z * z

    j6 = jnp.stack([
        z * gx,
        z * gy,
        -px * z2 * gx - py * z2 * gy,
        -px * py * z2 * gx - (1.0 + py * py * z2) * gy,
        (1.0 + px * px * z2) * gx + px * py * z2 * gy,
        -py * z * gx + px * z * gy,
    ], axis=-1).reshape(-1, 6)
    j4 = jnp.stack([z2, z2 * py, -z2 * px, z], axis=-1).reshape(-1, 4)

    wp = weight_p.reshape(-1, 1)
    wd = weight_d.reshape(-1, 1)

    A6 = jnp.einsum("ni,nj->ij", j6 * wp, j6, precision=_HI)
    b6 = jnp.einsum("ni,n->i", j6 * wp, rp.reshape(-1), precision=_HI)
    A4 = jnp.einsum("ni,nj->ij", j4 * wd, j4, precision=_HI)
    b4 = jnp.einsum("ni,n->i", j4 * wd, rd.reshape(-1), precision=_HI)

    remap = jnp.array([2, 3, 4, 6])
    A = jnp.zeros((7, 7), jnp.float32).at[:6, :6].set(A6)
    A = A.at[remap[:, None], remap[None, :]].add(A4)
    b = jnp.zeros((7,), jnp.float32).at[:6].set(b6)
    b = b.at[remap].add(b4)
    n = jnp.sum(buffers["mask"]) + jnp.sum(buffers["has_depth"])
    return A, b, jnp.maximum(n, 1).astype(jnp.float32)


def _sim3_impl(cam: Camera, cfg: TrackerConfig, sigma2: float,
               start_level: int, final_level: int, ref: TrackingRef,
               frame: TrackingRef, init_frame_to_ref):
    """Whole coarse-to-fine Sim3 track as one traceable function;
    module-level so `get_sim3_program` can cache one jitted program per
    (camera, config, sigma2, level-range) across tracker instances."""
    pose = lie.sim3_inverse(init_frame_to_ref)
    aff_a = jnp.float32(1.0)
    aff_b = jnp.float32(0.0)
    diverged = jnp.array(False)
    mean_res = jnp.float32(0.0)
    usage = jnp.float32(0.0)

    for l in range(start_level, final_level - 1, -1):
        caml = cam.level(l)
        h, we = caml.height, caml.width
        # Fine-level point striding: levels <= 2 run on every 2nd compacted
        # point. Constraint verification is a statistical estimate — ~19k
        # points at 640x480 L1 carry the same pose information as 38k to
        # well under the acceptance thresholds — and the fine stages
        # dominate the constraint pipeline's device time (the one-chip
        # budget the tracking pipeline shares). The 7x7 information matrix
        # scales by the point count like any sample-size change; relative
        # edge weighting is unaffected.
        stride = 2 if l <= 2 else 1
        pts_l = jax.tree_util.tree_map(
            lambda a: a[::stride] if getattr(a, "ndim", 0) >= 1 else a,
            ref.pts[l]) if stride > 1 else ref.pts[l]
        min_pts = max(0.5 * cfg.min_goodperall_pixel_absmin * h * we
                      / stride, 10.0)

        def res_pass(p, a, b, l=l, caml=caml, pts_l=pts_l):
            return _sim3_residual_pass(
                p, a, b, pts_l, frame.sim3_quad[l], caml, cfg,
                cfg.use_esm_sim3)

        buffers, stats = res_pass(pose, aff_a, aff_b)
        div0 = stats["in_count"] < min_pts
        aff_a, aff_b = stats["aff_a_new"], stats["aff_b_new"]
        wp, wd, last_err, _, _ = _sim3_weights(pose, buffers, cfg,
                                               sigma2)
        A0, g0, n0 = _sim3_normal_equations(buffers, wp, wd)

        state = dict(pose=pose, aff_a=aff_a, aff_b=aff_b, A=A0, g=g0,
                     n=n0, last_err=last_err,
                     lam=jnp.float32(cfg.lambda_initial),
                     iter=jnp.int32(0), inc_try=jnp.int32(0),
                     trials=jnp.int32(0), done=div0, diverged=div0,
                     usage=stats["usage"])

        max_its = cfg.max_iterations[l]
        max_trials = max_its + 4 * cfg.max_lm_rejects

        def cond(st):
            return ((st["iter"] < max_its) & ~st["done"]
                    & (st["trials"] < max_trials))

        def body(st):
            A = st["A"] / st["n"]
            g = st["g"] / st["n"]
            A = A + st["lam"] * jnp.diag(jnp.diag(A))
            inc = jnp.linalg.solve(A + 1e-12 * jnp.eye(7), g)
            inc_sq = jnp.sum(inc * inc)
            blown = ~((inc_sq >= 0) & (inc_sq < 1.0))

            new_pose = lie.sim3_mul(lie.sim3_exp(inc), st["pose"])
            buffers, stats = res_pass(new_pose, st["aff_a"], st["aff_b"])
            div = (stats["in_count"] < min_pts) | blown
            wp, wd, err, _, _ = _sim3_weights(new_pose, buffers, cfg,
                                              sigma2)
            A_new, g_new, n_new = _sim3_normal_equations(buffers, wp, wd)

            accept = (err < st["last_err"]) & ~div
            lam_acc = jnp.where(st["lam"] <= 0.2, 0.0,
                                st["lam"] * cfg.lambda_success_fac)
            lam_rej = jnp.where(
                st["lam"] == 0.0, 0.2,
                st["lam"] * cfg.lambda_fail_fac
                ** (st["inc_try"] + 1).astype(jnp.float32))
            converged = (err / jnp.maximum(st["last_err"], 1e-12)
                         > cfg.convergence_eps)
            step_small = inc_sq < cfg.step_size_min

            sel = lambda a, b: jnp.where(accept, a, b)
            return dict(
                pose=jnp.where(accept, new_pose, st["pose"]),
                aff_a=sel(stats["aff_a_new"], st["aff_a"]),
                aff_b=sel(stats["aff_b_new"], st["aff_b"]),
                A=jnp.where(accept, A_new, st["A"]),
                g=jnp.where(accept, g_new, st["g"]),
                n=sel(n_new, st["n"]),
                last_err=sel(err, st["last_err"]),
                lam=sel(lam_acc, lam_rej),
                iter=st["iter"] + accept.astype(jnp.int32),
                inc_try=sel(jnp.int32(0), st["inc_try"] + 1),
                trials=st["trials"] + 1,
                done=st["done"] | div | (accept & converged)
                     | (~accept & step_small),
                diverged=st["diverged"] | div,
                usage=sel(stats["usage"], st["usage"]),
            )

        out = jax.lax.while_loop(cond, body, state)
        pose = out["pose"]
        aff_a, aff_b = out["aff_a"], out["aff_b"]
        diverged = diverged | out["diverged"]
        mean_res = out["last_err"]
        usage = out["usage"]

    # final Hessian at the converged pose (Sim3Tracker.cpp:354-363);
    # same fine-level stride as the LM passes so the information matrix
    # reflects the points actually used
    l = final_level
    caml = cam.level(l)
    stride = 2 if l <= 2 else 1
    pts_l = jax.tree_util.tree_map(
        lambda a: a[::stride] if getattr(a, "ndim", 0) >= 1 else a,
        ref.pts[l]) if stride > 1 else ref.pts[l]
    buffers, stats = _sim3_residual_pass(
        pose, aff_a, aff_b, pts_l, frame.sim3_quad[l], caml, cfg,
        cfg.use_esm_sim3)
    wp, wd, mean, mean_d, mean_p = _sim3_weights(pose, buffers, cfg,
                                                 sigma2)
    A, _, _ = _sim3_normal_equations(buffers, wp, wd)
    A = 0.5 * (A + A.T)  # exact symmetry despite f32 reduction order
    ref_valid_count = jnp.maximum(ref.pts[l].n_valid / stride, 1.0)

    diverged = diverged | (pose[7] <= 0)
    pose = jnp.where(diverged, lie.sim3_identity(), pose)
    return Sim3TrackResult(
        ref_to_frame=pose,
        frame_to_ref=lie.sim3_inverse(pose),
        diverged=diverged,
        last_residual=mean,
        depth_residual=mean_d,
        photo_residual=mean_p,
        point_usage=stats["usage"] / ref_valid_count,
        hessian=A,
    )

@functools.lru_cache(maxsize=None)
def get_sim3_program(cam: Camera, cfg: TrackerConfig, sigma2: float,
                     start_level: int, final_level: int):
    """Shared program cache: the constraint pipeline uses a fixed set of
    level ranges (SlamSystem.cpp:1140-1202); each is traced exactly once
    per (camera, config) process-wide and AOT-cached across processes."""
    from lsd_slam_tpu.utils.aot_cache import aot_wrap
    fn = jax.jit(functools.partial(_sim3_impl, cam, cfg, float(sigma2),
                                   int(start_level), int(final_level)))
    return aot_wrap("sim3_track", fn,
                    context=repr((cam, cfg, sigma2, start_level,
                                  final_level)))


@functools.lru_cache(maxsize=None)
def get_sim3_batch_programs(cam: Camera, cfg: TrackerConfig, sigma2: float,
                            start_level: int, final_level: int):
    """Batched (vmapped) Sim3 tracking for constraint verification.

    The constraint pipeline checks ~10-15 candidates per new keyframe,
    each requiring reciprocal tracks at 3 level ranges — serially that is
    ~60-90 device dispatches of a deeply-iterative program and ~2.5 s of
    device time per keyframe switch (measured, v5e 640x480), which
    saturates the chip in async mode. One keyframe side is common to all
    candidates, so the batch runs as TWO programs per (range, direction):

      refs_batched:   candidates as the REFERENCE side (stacked PointSets)
                      against the common new keyframe     in_axes (0,N,0)
      frames_batched: candidates as the TARGET side (stacked quad layouts)
                      against the common new keyframe     in_axes (N,0,0)

    The LM while_loops run in batch lockstep (iterate until every lane
    converges) — a few wasted iterations per lane against an ~8x cut in
    dispatches and far better VPU/MXU utilization."""
    from lsd_slam_tpu.utils.aot_cache import aot_wrap
    impl = functools.partial(_sim3_impl, cam, cfg, float(sigma2),
                             int(start_level), int(final_level))
    ctx = repr((cam, cfg, sigma2, start_level, final_level))
    return (aot_wrap("sim3_batch_refs",
                     jax.jit(jax.vmap(impl, in_axes=(0, None, 0))),
                     context=ctx),
            aot_wrap("sim3_batch_frames",
                     jax.jit(jax.vmap(impl, in_axes=(None, 0, 0))),
                     context=ctx))


# flat layout of one lane in the PACKED batched-Sim3 output: on
# remote-attached chips every separate device->host pull pays ~25-45 ms of
# RPC, and the constraint tester reads ~10 fields x 2 directions per stage
# — packed, that is ONE (B, 70) pull per direction (measured: the unpacked
# pulls were ~70% of a warm constraint-search stage's wall time)
SIM3_PACK = dict(ref_to_frame=slice(0, 8), frame_to_ref=slice(8, 16),
                 diverged=16, last_residual=17, depth_residual=18,
                 photo_residual=19, point_usage=20,
                 hessian=slice(21, 70))
SIM3_PACK_LEN = 70


def _pack_result(r: Sim3TrackResult) -> jnp.ndarray:
    return jnp.concatenate([
        r.ref_to_frame, r.frame_to_ref,
        jnp.stack([r.diverged.astype(jnp.float32), r.last_residual,
                   r.depth_residual, r.photo_residual, r.point_usage]),
        r.hessian.reshape(49)])


@functools.lru_cache(maxsize=None)
def get_sim3_batch_packed_programs(cam: Camera, cfg: TrackerConfig,
                                   sigma2: float, start_level: int,
                                   final_level: int):
    """Batched Sim3 programs returning ONE packed (B, 70) array per call
    (layout SIM3_PACK) — the constraint pipeline's single-pull variant."""
    from lsd_slam_tpu.utils.aot_cache import aot_wrap
    impl = functools.partial(_sim3_impl, cam, cfg, float(sigma2),
                             int(start_level), int(final_level))

    def packed_refs(refs, frame, inits):
        return jax.vmap(lambda a, b: _pack_result(impl(a, frame, b)),
                        in_axes=(0, 0))(refs, inits)

    def packed_frames(ref, frames, inits):
        return jax.vmap(lambda a, b: _pack_result(impl(ref, a, b)),
                        in_axes=(0, 0))(frames, inits)

    ctx = repr((cam, cfg, sigma2, start_level, final_level))
    return (aot_wrap("sim3_batchp_refs", jax.jit(packed_refs), context=ctx),
            aot_wrap("sim3_batchp_frames", jax.jit(packed_frames),
                     context=ctx))


class Sim3Tracker:
    """Compiled Sim3 tracker bound to camera + config; per level range the
    jitted program comes from the shared `get_sim3_program` cache."""

    def __init__(self, cam: Camera, cfg: TrackerConfig = TrackerConfig(),
                 sigma2: float = 16.0):
        self.cam = cam
        self.cfg = cfg
        self.sigma2 = float(sigma2)

    def track(self, ref: TrackingRef, frame: TrackingRef, init_frame_to_ref,
              start_level: int, final_level: int) -> Sim3TrackResult:
        fn = get_sim3_program(self.cam, self.cfg, self.sigma2,
                              start_level, final_level)
        return fn(ref, frame, jnp.asarray(init_frame_to_ref, jnp.float32))

    def track_batch(self, refs_stacked, frame: TrackingRef, inits,
                    start_level: int, final_level: int) -> Sim3TrackResult:
        """Batched: stacked candidate refs vs ONE common target frame."""
        fn, _ = get_sim3_batch_programs(self.cam, self.cfg, self.sigma2,
                                        start_level, final_level)
        return fn(refs_stacked, frame, jnp.asarray(inits, jnp.float32))

    def track_batch_packed(self, refs_stacked, frame, inits,
                           start_level: int, final_level: int):
        """track_batch returning the packed (B, 70) device array
        (layout SIM3_PACK) — one pull serves every field."""
        fn, _ = get_sim3_batch_packed_programs(
            self.cam, self.cfg, self.sigma2, start_level, final_level)
        return fn(refs_stacked, frame, jnp.asarray(inits, jnp.float32))

    def track_batch_frames_packed(self, ref, frames_stacked, inits,
                                  start_level: int, final_level: int):
        """track_batch_frames returning the packed (B, 70) device array."""
        _, fn = get_sim3_batch_packed_programs(
            self.cam, self.cfg, self.sigma2, start_level, final_level)
        return fn(ref, frames_stacked, jnp.asarray(inits, jnp.float32))

    def track_batch_frames(self, ref: TrackingRef, frames_stacked, inits,
                           start_level: int, final_level: int
                           ) -> Sim3TrackResult:
        """Batched: ONE common reference vs stacked candidate frames."""
        _, fn = get_sim3_batch_programs(self.cam, self.cfg, self.sigma2,
                                        start_level, final_level)
        return fn(ref, frames_stacked, jnp.asarray(inits, jnp.float32))
