"""SE(3) direct image alignment — the per-frame hot path.

TPU-native re-design of SE3Tracker (src/Tracking/SE3Tracker.{h,cpp}):

  * the reference's compacted SoA buffers + SSE lanes become compacted
    fixed-budget point vectors (PointSet): calcResidualAndBuffers
    (SE3Tracker.cpp:885-1029) is one warp + ONE quad-packed row-gather
    over the point set — gathers are ~87% of pass cost on TPU and scale
    with point count, so the compaction mirrors the reference's
    makePointCloud for the same reason SSE code compacts;
  * variance-weighted Huber weights match calcWeightsAndResidual
    (SE3Tracker.cpp:749-790);
  * the LGS6 normal equations A = sum w J J^T, g = sum w r J (LGSX.h,
    SE3Tracker.cpp:1258-1299) are one (6,N)x(N,6) matmul -> MXU;
  * the nested LM accept/reject loop (SE3Tracker.cpp:343-448) is a single
    device-side lax.while_loop carrying (pose, affine, A, g, lambda, ...),
    so a whole pyramid track is ONE XLA program with ONE host transfer.

Jacobian ordering is [tx ty tz rx ry rz] — identical to the reference's
LGS6 and to lie.se3 tangent [upsilon, omega].
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
from lsd_slam_tpu.frames.pyramid import FramePyramid
from lsd_slam_tpu.ops.interp import quad_sample
from lsd_slam_tpu.tracking.reference import TrackingRef, PointSet

_HI = jax.lax.Precision.HIGHEST


@struct.dataclass
class TrackResult:
    """Everything SlamSystem needs from one track (SE3Tracker.h:65-110)."""

    ref_to_frame: jnp.ndarray      # SE3 (7,)
    frame_to_ref: jnp.ndarray      # SE3 (7,) == inverse (the reference's API)
    diverged: jnp.ndarray          # bool
    tracking_good: jnp.ndarray     # bool
    last_residual: jnp.ndarray     # final variance-normalized mean residual
    point_usage: jnp.ndarray       # overlap metric (SE3Tracker.cpp:990-1018)
    good_count: jnp.ndarray
    bad_count: jnp.ndarray
    affine_a: jnp.ndarray
    affine_b: jnp.ndarray
    good_mask: jnp.ndarray         # (H_min, W_min) bool, ref-pixel isGood
                                   # (== refPixelWasGood, Frame.h:421-449)
    initial_residual: jnp.ndarray  # last_residual / point_usage — the
                                   # depth mapper's trust prior
                                   # (SlamSystem.cpp:571 result->...)
    host_pack: jnp.ndarray         # (23,) every scalar the host loop reads,
                                   # packed so one frame costs ONE
                                   # device->host transfer (see HOST_PACK)


# host_pack layout (index -> field)
HOST_PACK = dict(ref_to_frame=slice(0, 7), frame_to_ref=slice(7, 14),
                 diverged=14, tracking_good=15, last_residual=16,
                 point_usage=17, good_count=18, bad_count=19,
                 affine_a=20, affine_b=21, initial_residual=22)


def _residual_pass(pose, aff_a, aff_b, pts: PointSet, frame_quad,
                   cam: Camera, cfg: TrackerConfig):
    """One warp + gather + residual sweep (== calcResidualAndBuffers)."""
    h, w = cam.height, cam.width
    rot = lie.quat_to_matrix(pose[0:4])
    t = pose[4:7]

    xs = (pts.idx % w).astype(jnp.float32)
    ys = (pts.idx // w).astype(jnp.float32)
    safe_id = jnp.where(pts.valid, pts.idp, 1.0)
    z_ref = 1.0 / safe_id
    px = (xs - cam.cx) / cam.fx * z_ref
    py = (ys - cam.cy) / cam.fy * z_ref
    # warped point W x p = R p + t
    wx = rot[0, 0] * px + rot[0, 1] * py + rot[0, 2] * z_ref + t[0]
    wy = rot[1, 0] * px + rot[1, 1] * py + rot[1, 2] * z_ref + t[1]
    wz = rot[2, 0] * px + rot[2, 1] * py + rot[2, 2] * z_ref + t[2]

    safe_wz = jnp.where(wz == 0, 1e-9, wz)
    u = wx / safe_wz * cam.fx + cam.cx
    v = wy / safe_wz * cam.fy + cam.cy
    in_img = (u > 1) & (v > 1) & (u < w - 2) & (v < h - 2) & pts.valid

    (i_new, gxn, gyn), _, _ = quad_sample(frame_quad, h, w, u, v)

    c1 = aff_a * pts.ival + aff_b
    r = c1 - i_new

    m = in_img.astype(jnp.float32)
    # affine lighting moments (SE3Tracker.cpp:952-961): weight min(1, 5/|r|)
    wa = jnp.where(jnp.abs(r) < 5.0, 1.0, 5.0 / jnp.maximum(jnp.abs(r), 1e-6)) * m
    sxx = jnp.sum(c1 * c1 * wa)
    syy = jnp.sum(i_new * i_new * wa)
    sx = jnp.sum(c1 * wa)
    sy = jnp.sum(i_new * wa)
    sw = jnp.sum(wa)
    var_c1 = jnp.maximum(sxx - sx * sx / sw, 1e-6)
    var_c2 = jnp.maximum(syy - sy * sy / sw, 1e-6)
    # incremental gain/offset mapping c1 -> c2; NOTE deliberate deviation:
    # the reference *replaces* (a, b) with this increment
    # (SE3Tracker.cpp:1023-1024 + 385-389), which oscillates for large
    # lighting changes since c1 already contains the old correction — we
    # compose instead: a <- a_inc*a, b <- a_inc*b + b_inc.
    aff_a_inc = jnp.sqrt(var_c2 / var_c1)
    aff_b_inc = (sy - aff_a_inc * sx) / sw
    aff_a_new = aff_a_inc * aff_a
    aff_b_new = aff_a_inc * aff_b + aff_b_inc

    good = (r * r / (cfg.max_diff_constant
                     + cfg.max_diff_grad_mult * (gxn * gxn + gyn * gyn))) < 1.0

    in_count = jnp.sum(m)
    good_count = jnp.sum(good & in_img)
    bad_count = jnp.sum(~good & in_img)
    usage = jnp.sum(jnp.minimum(z_ref / jnp.where(in_img, safe_wz, 1.0), 1.0) * m)

    buffers = dict(
        px=wx, py=wy, pz=jnp.where(in_img, wz, 1.0),
        dx=cam.fx * gxn, dy=cam.fy * gyn, r=r,
        d=pts.idp, var=pts.ivr, mask=in_img,
    )
    stats = dict(
        in_count=in_count, good_count=good_count, bad_count=bad_count,
        usage=usage, aff_a_new=aff_a_new, aff_b_new=aff_b_new, good=good,
    )
    return buffers, stats


def _weights_pass(pose, buffers, cfg: TrackerConfig, sigma2: float):
    """Variance-weighted Huber weights (== calcWeightsAndResidual)."""
    t = pose[4:7]
    px, py, pz = buffers["px"], buffers["py"], buffers["pz"]
    d = jnp.where(buffers["mask"], buffers["d"], 1.0)
    r = buffers["r"]
    m = buffers["mask"].astype(jnp.float32)

    g0 = (t[0] * pz - t[2] * px) / (pz * pz * d)
    g1 = (t[1] * pz - t[2] * py) / (pz * pz * d)
    drpdd = buffers["dx"] * g0 + buffers["dy"] * g1
    s = cfg.var_weight * buffers["var"]
    w_p = 1.0 / (sigma2 + s * drpdd * drpdd)
    weighted_rp = jnp.abs(r) * jnp.sqrt(w_p)
    hd = cfg.huber_d / 2.0
    wh = jnp.where(weighted_rp < hd, 1.0, hd / jnp.maximum(weighted_rp, 1e-9))
    weight = wh * w_p * m
    err_sum = jnp.sum(weight * r * r)
    error = err_sum / jnp.maximum(jnp.sum(m), 1.0)
    return weight, error


def _normal_equations(buffers, weight):
    """LGS6 accumulate as a matmul (== calculateWarpUpdate + LGSX.h)."""
    px, py, pz = buffers["px"], buffers["py"], buffers["pz"]
    gx, gy, r = buffers["dx"], buffers["dy"], buffers["r"]
    z = 1.0 / pz
    z2 = z * z
    j0 = z * gx
    j1 = z * gy
    j2 = -px * z2 * gx - py * z2 * gy
    j3 = -px * py * z2 * gx - (1.0 + py * py * z2) * gy
    j4 = (1.0 + px * px * z2) * gx + px * py * z2 * gy
    j5 = -py * z * gx + px * z * gy
    J = jnp.stack([j0, j1, j2, j3, j4, j5], axis=-1).reshape(-1, 6)
    wv = weight.reshape(-1, 1)
    n = jnp.maximum(jnp.sum(buffers["mask"]), 1).astype(jnp.float32)
    Jw = J * wv
    A = jnp.einsum("ni,nj->ij", Jw, J, precision=_HI) / n
    g = jnp.einsum("ni,n->i", Jw, r.reshape(-1), precision=_HI) / n
    return A, g


def _track_level(pose, aff_a, aff_b, pts, frame_quad, cam, cfg: TrackerConfig,
                 max_its: int, sigma2: float, use_affine: bool):
    """Full LM minimization on one pyramid level as a lax.while_loop."""
    h, w = cam.height, cam.width
    min_points = cfg.min_goodperall_pixel_absmin * h * w

    def res(pose, a, b):
        return _residual_pass(pose, a, b, pts, frame_quad, cam, cfg)

    buffers, stats = res(pose, aff_a, aff_b)
    diverged0 = stats["in_count"] < min_points
    if use_affine:
        aff_a, aff_b = stats["aff_a_new"], stats["aff_b_new"]
    weight, last_err = _weights_pass(pose, buffers, cfg, sigma2)
    A0, g0 = _normal_equations(buffers, weight)

    state = dict(
        pose=pose, aff_a=aff_a, aff_b=aff_b, A=A0, g=g0,
        last_err=last_err, lam=jnp.float32(cfg.lambda_initial),
        iter=jnp.int32(0), inc_try=jnp.int32(0), trials=jnp.int32(0),
        done=diverged0, diverged=diverged0,
    )

    max_trials = max_its + 4 * cfg.max_lm_rejects

    def cond(s):
        return (s["iter"] < max_its) & (~s["done"]) & (s["trials"] < max_trials)

    def body(s):
        # LM damping: A_ii *= (1 + lambda), off-diagonals untouched
        A = s["A"] + s["lam"] * jnp.diag(jnp.diag(s["A"]))
        inc = jnp.linalg.solve(A + 1e-12 * jnp.eye(6), s["g"])
        new_pose = lie.se3_mul(lie.se3_exp(inc), s["pose"])

        buffers, stats = res(new_pose, s["aff_a"], s["aff_b"])
        diverged = stats["in_count"] < min_points
        weight, err = _weights_pass(new_pose, buffers, cfg, sigma2)
        A_new, g_new = _normal_equations(buffers, weight)

        accept = (err < s["last_err"]) & ~diverged
        inc_sq = jnp.sum(inc * inc)

        # lambda schedule (SE3Tracker.cpp:418-447)
        lam_acc = jnp.where(s["lam"] <= 0.2, 0.0, s["lam"] * cfg.lambda_success_fac)
        lam_rej = jnp.where(
            s["lam"] == 0.0, 0.2,
            s["lam"] * cfg.lambda_fail_fac ** (s["inc_try"] + 1).astype(jnp.float32))

        converged = err / jnp.maximum(s["last_err"], 1e-12) > cfg.convergence_eps
        step_too_small = inc_sq < cfg.step_size_min

        sel = lambda t, f: jnp.where(accept, t, f)
        new_state = dict(
            pose=jnp.where(accept, new_pose, s["pose"]),
            aff_a=sel(stats["aff_a_new"], s["aff_a"]) if use_affine else s["aff_a"],
            aff_b=sel(stats["aff_b_new"], s["aff_b"]) if use_affine else s["aff_b"],
            A=jnp.where(accept, A_new, s["A"]),
            g=jnp.where(accept, g_new, s["g"]),
            last_err=sel(err, s["last_err"]),
            lam=sel(lam_acc, lam_rej),
            iter=s["iter"] + accept.astype(jnp.int32),
            inc_try=sel(jnp.int32(0), s["inc_try"] + 1),
            trials=s["trials"] + 1,
            done=s["done"] | diverged | (accept & converged)
                 | (~accept & step_too_small),
            diverged=s["diverged"] | diverged,
        )
        return new_state

    out = jax.lax.while_loop(cond, body, state)
    return (out["pose"], out["aff_a"], out["aff_b"], out["last_err"],
            out["diverged"])


def _track_impl(cam: Camera, cfg: TrackerConfig, sigma2: float,
                use_affine: bool, ref: TrackingRef, frame: FramePyramid,
                init_frame_to_ref: jnp.ndarray) -> TrackResult:
    """The whole pyramidal track as one traceable function. Module-level
    (not a bound method) so `get_se3_program` can cache ONE jitted program
    per (cam, cfg, sigma2, use_affine) across all SE3Tracker/SlamSystem
    instances — per-instance `jax.jit(self...)` closures would re-trace
    the entire pyramid on every new engine (tens of seconds)."""
    pose = lie.se3_inverse(init_frame_to_ref)  # referenceToFrame
    aff_a = jnp.float32(1.0)
    aff_b = jnp.float32(0.0)
    diverged = jnp.array(False)
    last_err = jnp.float32(0.0)

    for l in range(cfg.max_level, cfg.min_level - 1, -1):
        caml = cam.level(l)
        pose, aff_a, aff_b, last_err, div_l = _track_level(
            pose, aff_a, aff_b, ref.pts[l], frame.quad[l], caml, cfg,
            cfg.max_iterations[l], sigma2, use_affine)
        diverged = diverged | div_l

    # final stats & good-pixel mask at the min level (the reference's
    # trackingWasGood + refPixelWasGood, SE3Tracker.cpp:475-484)
    l = cfg.min_level
    caml = cam.level(l)
    pts = ref.pts[l]
    buffers, stats = _residual_pass(
        pose, aff_a, aff_b, pts, frame.quad[l], caml, cfg)
    _, final_err = _weights_pass(pose, buffers, cfg, sigma2)
    n_pix = caml.width * caml.height
    ref_num = jnp.maximum(pts.n_valid, 1.0)
    good = stats["good_count"].astype(jnp.float32)
    bad = stats["bad_count"].astype(jnp.float32)
    tracking_good = (
        ~diverged
        & (good / n_pix > cfg.min_goodperall_pixel)
        & (good / jnp.maximum(good + bad, 1.0) > cfg.min_goodpergoodbad_pixel)
    )
    point_usage = stats["usage"] / ref_num

    # scatter the per-point good flags back to the level grid; pixels
    # not in the point set default to True (the depth mapper only
    # excludes pixels the tracker actively flagged bad — matching the
    # reference, where refPixelWasGood covers exactly the point cloud)
    good_vec = stats["good"] & buffers["mask"]
    sidx = jnp.where(pts.valid, pts.idx, n_pix)
    good_flat = jnp.ones((n_pix,), bool).at[sidx].set(good_vec, mode="drop")

    pose = jnp.where(diverged, lie.se3_identity(), pose)
    inv_pose = lie.se3_inverse(pose)
    initial_residual = final_err / jnp.maximum(point_usage, 1e-6)
    host_pack = jnp.concatenate([
        pose, inv_pose,
        jnp.stack([diverged.astype(jnp.float32),
                   tracking_good.astype(jnp.float32),
                   final_err, point_usage, good, bad,
                   aff_a, aff_b, initial_residual])])
    return TrackResult(
        ref_to_frame=pose,
        frame_to_ref=inv_pose,
        diverged=diverged,
        tracking_good=tracking_good,
        last_residual=final_err,
        point_usage=point_usage,
        good_count=stats["good_count"],
        bad_count=stats["bad_count"],
        affine_a=aff_a,
        affine_b=aff_b,
        good_mask=good_flat.reshape(caml.height, caml.width),
        initial_residual=initial_residual,
        host_pack=host_pack,
    )


@functools.lru_cache(maxsize=None)
def get_se3_program(cam: Camera, cfg: TrackerConfig, sigma2: float,
                    use_affine: bool):
    """Module-level program cache: ONE traced+compiled pyramidal-track
    program per (camera, config, sigma2, use_affine). Every SE3Tracker —
    and through it every SlamSystem — with the same key shares the same
    jitted callable, so constructing a fresh engine never re-traces.
    AOT-cached: a fresh PROCESS deserializes the compiled executable from
    disk instead of re-tracing/compiling (utils/aot_cache)."""
    from lsd_slam_tpu.utils.aot_cache import aot_wrap
    fn = jax.jit(functools.partial(_track_impl, cam, cfg, float(sigma2),
                                   bool(use_affine)))
    return aot_wrap("se3_track", fn,
                    context=repr((cam, cfg, sigma2, use_affine)))


class SE3Tracker:
    """Compiled pyramidal tracker bound to one camera + config.

    The jitted program covering all pyramid levels (the reference's
    trackFrame, SE3Tracker.cpp:280-487) comes from the shared
    `get_se3_program` cache — instances are cheap handles."""

    def __init__(self, cam: Camera, cfg: TrackerConfig = TrackerConfig(),
                 sigma2: float = 16.0, use_affine: bool = True):
        self.cam = cam
        self.cfg = cfg
        self.sigma2 = float(sigma2)
        self.use_affine = bool(use_affine)
        self._fn = get_se3_program(cam, cfg, self.sigma2, self.use_affine)

    def track(self, ref: TrackingRef, frame: FramePyramid,
              init_frame_to_ref) -> TrackResult:
        """Track `frame` against `ref`. Returns poses both ways; the
        reference's trackFrame returns frameToReference."""
        return self._fn(ref, frame, jnp.asarray(init_frame_to_ref))
