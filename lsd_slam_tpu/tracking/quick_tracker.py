"""Coarse-level "permaRef" quick tracking for KF-search and relocalization.

Equivalent of SE3Tracker::trackFrameOnPermaref / checkPermaRefOverlap
(SE3Tracker.cpp:121-272): a single-level (QUICK_KF_CHECK_LVL=4) LM track
with the quick test-track schedule (maxItsTestTrack=5, eps 0.98,
settings.h:379-382). The reference stores a dedicated always-resident
level-4 point cloud per keyframe (Frame::setPermaRef); here the keyframe's
TrackingRef already holds all levels, so "permaRef" is just level 4 of it.

Also provides the batched variant: one frame against N keyframes at once
(vmapped), replacing the reference's 6-thread relocalizer race
(Relocalizer.cpp:117-121) and the serial candidate loop
(SlamSystem.cpp:1283-1310) with data-parallel device execution.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from flax import struct

from lsd_slam_tpu import lie
from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import TrackerConfig
from lsd_slam_tpu.tracking.se3_tracker import (
    _residual_pass, _weights_pass, _normal_equations)


@struct.dataclass
class QuickTrackResult:
    ref_to_frame: jnp.ndarray
    tracking_good: jnp.ndarray
    diverged: jnp.ndarray
    point_usage: jnp.ndarray
    good_count: jnp.ndarray
    bad_count: jnp.ndarray
    residual: jnp.ndarray


def _overlap_impl(cam, cfg, level, pts, frame_quad, pose):
    caml = cam.level(level)
    _, stats = _residual_pass(pose, 1.0, 0.0, pts, frame_quad, caml, cfg)
    return stats["usage"] / jnp.maximum(pts.n_valid, 1.0)


def _quick_impl(cam, cfg, sigma2, level, ref_pts, frame_level,
                init_ref_to_frame):
    """ref_pts: level-l PointSet; frame_level: level-l quad layout.
    Module-level so `get_quick_programs` can cache the jitted/vmapped
    variants across QuickTracker (and SlamSystem) instances."""
    l = level
    caml = cam.level(l)
    frame_quad = frame_level
    h, w = caml.height, caml.width
    min_points = cfg.min_goodperall_pixel_absmin * h * w

    def res(pose, a, b):
        return _residual_pass(pose, a, b, ref_pts, frame_quad, caml, cfg)

    pose = init_ref_to_frame
    buffers, stats = res(pose, 1.0, 0.0)
    diverged = stats["in_count"] < min_points
    weight, last_err = _weights_pass(pose, buffers, cfg, sigma2)
    A0, g0 = _normal_equations(buffers, weight)

    state = dict(pose=pose, A=A0, g=g0, last_err=last_err,
                 lam=jnp.float32(0.0), iter=jnp.int32(0),
                 trials=jnp.int32(0), done=diverged, diverged=diverged)
    max_its = cfg.max_its_test_track

    def cond(s):
        return (s["iter"] < max_its) & ~s["done"] & (s["trials"] < max_its * 3)

    def body(s):
        A = s["A"] + s["lam"] * jnp.diag(jnp.diag(s["A"]))
        inc = jnp.linalg.solve(A + 1e-12 * jnp.eye(6), s["g"])
        new_pose = lie.se3_mul(lie.se3_exp(inc), s["pose"])
        buffers, stats = res(new_pose, 1.0, 0.0)
        div = stats["in_count"] < min_points
        weight, err = _weights_pass(new_pose, buffers, cfg, sigma2)
        A_new, g_new = _normal_equations(buffers, weight)
        accept = (err < s["last_err"]) & ~div
        converged = (err / jnp.maximum(s["last_err"], 1e-12)
                     > cfg.convergence_eps_test_track)
        step_small = jnp.sum(inc * inc) < cfg.step_size_min_test_track
        sel = lambda a, b: jnp.where(accept, a, b)
        return dict(
            pose=jnp.where(accept, new_pose, s["pose"]),
            A=jnp.where(accept, A_new, s["A"]),
            g=jnp.where(accept, g_new, s["g"]),
            last_err=sel(err, s["last_err"]),
            lam=sel(jnp.maximum(s["lam"] * 0.5, 0.0),
                    jnp.where(s["lam"] == 0, 0.2, s["lam"] * 4.0)),
            iter=s["iter"] + accept.astype(jnp.int32),
            trials=s["trials"] + 1,
            done=s["done"] | div | (accept & converged)
                 | (~accept & step_small),
            diverged=s["diverged"] | div,
        )

    out = jax.lax.while_loop(cond, body, state)
    pose = out["pose"]

    buffers, stats = res(pose, 1.0, 0.0)
    _, final_err = _weights_pass(pose, buffers, cfg, sigma2)
    good = stats["good_count"].astype(jnp.float32)
    bad = stats["bad_count"].astype(jnp.float32)
    n_pix = float(h * w)
    ref_num = jnp.maximum(ref_pts.n_valid, 1.0)
    tracking_good = (~out["diverged"]
                     & (good / n_pix > cfg.min_goodperall_pixel)
                     & (good / jnp.maximum(good + bad, 1.0)
                        > cfg.min_goodpergoodbad_pixel))
    return QuickTrackResult(
        ref_to_frame=pose,
        tracking_good=tracking_good,
        diverged=out["diverged"],
        point_usage=stats["usage"] / ref_num,
        good_count=stats["good_count"],
        bad_count=stats["bad_count"],
        residual=final_err,
    )


import collections

QuickPrograms = collections.namedtuple(
    "QuickPrograms", ["track1", "trackN", "trackN_frames", "overlap"])


@functools.lru_cache(maxsize=None)
def get_quick_programs(cam: Camera, cfg: TrackerConfig, sigma2: float,
                       level: int) -> QuickPrograms:
    """Shared program cache for the quick permaRef tracker: one traced
    single/batched/overlap program set per (camera, config, sigma2, level),
    reused by every QuickTracker instance (constraint search, reloc,
    candidate scoring all share these)."""
    from lsd_slam_tpu.utils.aot_cache import aot_wrap
    impl = functools.partial(_quick_impl, cam, cfg, float(sigma2), int(level))
    ctx = repr((cam, cfg, sigma2, level))
    return QuickPrograms(
        track1=aot_wrap("quick_track1", jax.jit(impl), context=ctx),
        # batched: level-l slices of (stacked) refs vs one frame
        trackN=aot_wrap("quick_trackN",
                        jax.jit(jax.vmap(impl, in_axes=(0, None, 0))),
                        context=ctx),
        # batched the other way: ONE ref vs N stacked frames (the reciprocal
        # direction of the close-candidate pre-check, SlamSystem.cpp:1283-1310)
        trackN_frames=aot_wrap(
            "quick_trackN_frames",
            jax.jit(jax.vmap(impl, in_axes=(None, 0, 0))), context=ctx),
        overlap=aot_wrap("quick_overlap",
                         jax.jit(functools.partial(_overlap_impl, cam, cfg,
                                                   int(level))), context=ctx),
    )


class QuickTracker:
    def __init__(self, cam: Camera, cfg: TrackerConfig = TrackerConfig(),
                 sigma2: float = 16.0):
        self.cam = cam
        self.cfg = cfg
        self.sigma2 = float(sigma2)
        # Resolution-adaptive quick-check level: the reference's constant
        # QUICK_KF_CHECK_LVL=4 (settings.h:101) assumes 640x480 input, where
        # the level-4 image is 40x30. At smaller inputs the same constant
        # collapses the quick check onto a ~10px image whose pose estimates
        # blow past the 0.09-rad reciprocal-consistency gate
        # (SlamSystem.cpp:1307). Pick the level whose width is closest to
        # the reference's 40px operating point instead.
        lvl = int(round(math.log2(max(cam.width, 40) / 40.0)))
        # Floor at 1: keyframe TrackingRefs are built with min_level=1
        # (pts[0] is never compacted — system/keyframe.py:102), so level 1
        # is the finest quick level available; for inputs narrower than
        # ~57 px this is the closest realizable level to the 40 px
        # operating point even though its width is below it.
        self.level = max(1, min(cfg.quick_kf_check_level, lvl))
        progs = get_quick_programs(cam, cfg, self.sigma2, self.level)
        # unbatched impl partial: distributed.sharded_quick_track vmaps this
        self._impl = functools.partial(_quick_impl, cam, cfg, self.sigma2,
                                       self.level)
        self._track1 = progs.track1
        self._trackN = progs.trackN
        self._trackN_frames = progs.trackN_frames
        self._overlap = progs.overlap

    # ------------------------------------------------------------- api


    def _ref_slice(self, ref):
        return ref.pts[self.level]

    def _frame_slice(self, pyr):
        return pyr.quad[self.level]

    def track(self, ref, frame_pyr, init_ref_to_frame) -> QuickTrackResult:
        """== trackFrameOnPermaref; init/result are ref->frame SE3."""
        return self._track1(self._ref_slice(ref), self._frame_slice(frame_pyr),
                            jnp.asarray(init_ref_to_frame, jnp.float32))

    def track_pts(self, ref_pts, frame_quad, init_ref_to_frame
                  ) -> QuickTrackResult:
        """trackFrameOnPermaref on a raw level-l PointSet + quad layout —
        the permaRef-cache path (no keyframe pyramid restore needed)."""
        return self._track1(ref_pts, frame_quad,
                            jnp.asarray(init_ref_to_frame, jnp.float32))

    def check_overlap(self, ref, frame_pyr, ref_to_frame):
        """== checkPermaRefOverlap: pointUsage at a fixed pose
        (SE3Tracker.cpp:121-158)."""
        return self.check_overlap_pts(ref.pts[self.level],
                                      frame_pyr.quad[self.level],
                                      ref_to_frame)

    def check_overlap_pts(self, pts, frame_quad, ref_to_frame):
        """checkPermaRefOverlap on a raw level-l PointSet + quad layout."""
        return float(self._overlap(pts, frame_quad,
                                   jnp.asarray(ref_to_frame, jnp.float32)))

    def track_batch(self, refs_stacked, frame_pyr, init_poses) -> QuickTrackResult:
        """Batched quick track: one frame against N stacked keyframe refs.

        refs_stacked: a PointSet of stacked (N, budget4) level-4 arrays."""
        return self._trackN(refs_stacked, self._frame_slice(frame_pyr),
                            jnp.asarray(init_poses, jnp.float32))

    def track_batch_pts(self, refs_stacked, frame_quad, init_poses
                        ) -> QuickTrackResult:
        """track_batch against a raw quad layout (permaRef-cache path)."""
        return self._trackN(refs_stacked, frame_quad,
                            jnp.asarray(init_poses, jnp.float32))

    def track_batch_frames(self, ref_pts, frames_quads, init_poses
                           ) -> QuickTrackResult:
        """Batched quick track the other way: ONE reference point set
        against N stacked level-l frame quad layouts."""
        return self._trackN_frames(ref_pts, frames_quads,
                                   jnp.asarray(init_poses, jnp.float32))
