"""DepthMap orchestrator: the per-keyframe mapping engine.

Mirrors the reference's DepthMap public API (DepthMap.h:53-84):
update_keyframe / create_keyframe / finalize_keyframe / initialize_randomly /
initialize_from_gt / set_from_existing_kf / invalidate — with all sweeps as
compiled jitted programs over DepthMapState and the host only sequencing
them. The reference's 4-thread row-banding (IndexThreadReduce) is replaced
by whole-grid vectorization.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lsd_slam_tpu import lie
from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import LSDConfig
from lsd_slam_tpu.depth.state import DepthMapState
from lsd_slam_tpu.depth import observe as observe_mod
from lsd_slam_tpu.depth import regularize as reg_mod


import collections


def observe_budget_full(h: int, w: int) -> int:
    """Default (maximum) observe point budget: ~grid/6 rounded to 8192."""
    return max(8192, -(-(h * w) // 6 // 8192) * 8192)


def observe_budget_buckets(h: int, w: int):
    """The static budget sizes the observe program compiles for."""
    full = observe_budget_full(h, w)
    return tuple(b for b in (8192, 16384, 32768) if b < full) + (full,)


def pick_observe_budget(h: int, w: int, last_active) -> int:
    """Smallest bucket covering ~1.2x the previous sweep's eligible count.

    The observe sweep's cost is proportional to its STATIC point budget,
    but the eligible set shrinks drastically once a keyframe's depth
    converges and adaptive frame-skipping (nextStereoFrameMinID) kicks in
    — steady state is typically 4-6x below the fresh-keyframe count.
    The eligible count of the last sweep (stats['active'], already in the
    per-frame host pack) predicts the next one well; headroom plus the
    frame-rotated truncation (observe.py) makes rare overflows harmless.
    """
    buckets = observe_budget_buckets(h, w)
    if last_active is None:
        return buckets[-1]
    need = 1.2 * float(last_active)
    for b in buckets:
        if b >= need:
            return b
    return buckets[-1]


# queue-drain sweep sizes: a batch of K tracked frames pads up to the next
# bucket (replicating the newest frame — never selected); >8 chunks. Two
# buckets at the FULL point budget bound the program count (each K is a
# separate compile); padding waste is a few ms of elementwise prep.
MULTI_REF_BUCKETS = (4, 8)

DepthPrograms = collections.namedtuple(
    "DepthPrograms", ["observe", "observe_multi", "create_kf", "finalize",
                      "init_random", "init_gt", "export",
                      "set_from_existing"])


@functools.lru_cache(maxsize=None)
def get_depth_programs(cam: Camera, cfg: LSDConfig) -> DepthPrograms:
    """Shared program cache: ONE set of traced depth-sweep programs per
    (camera, config), reused by every DepthMap / SlamSystem instance —
    per-instance closures would re-trace the observe/propagate/regularize
    pipelines (the most expensive traces in the engine) on every engine
    construction."""
    dcfg, mcfg = cfg.depth, cfg.mapping
    # tracker good-mask arrives at the tracker's min level and is
    # upsampled on device ((x >> lvl) indexing, DepthMap.cpp:322-329) —
    # it never round-trips through the host
    mask_f = 1 << cfg.tracker.min_level

    def _upsample_mask(small):
        if small.shape == (cfg.height, cfg.width):
            return small
        return jnp.repeat(jnp.repeat(small, mask_f, axis=0),
                          mask_f, axis=1)

    def _export_arrays(state):
        # Frame::setDepth (Frame.cpp:199-243): export smoothed values
        ok = state.valid & (state.idepth_smoothed >= -0.05)
        idepth0 = jnp.where(ok, state.idepth_smoothed, -1.0)
        ivar0 = jnp.where(ok, state.var_smoothed, -1.0)
        num = jnp.maximum(jnp.sum(ok), 1)
        mean_idepth = jnp.sum(
            jnp.where(ok, state.idepth_smoothed, 0.0)) / num
        return idepth0, ivar0, mean_idepth, jnp.sum(ok)

    @functools.partial(jax.jit, static_argnames=("point_budget",))
    def _observe(state, kf_img, kf_gx, kf_gy, kf_max_grad, ref_img,
                 ref_to_kf, ref_id, good_mask, tracking_residual,
                 skip_inc, point_budget=0):
        state, stats = observe_mod.observe(
            state, kf_img, kf_gx, kf_gy, kf_max_grad, ref_img, ref_to_kf,
            ref_id, _upsample_mask(good_mask), tracking_residual,
            skip_inc, cam, dcfg, mcfg, point_budget=point_budget)
        # post-observe sequence (updateKeyframe, DepthMap.cpp:1129-1153):
        # fill holes then regularize(keep), then the depth export fused
        # into the same program (one dispatch per mapping iteration)
        state = reg_mod.fill_holes(state, kf_max_grad, dcfg,
                                   mcfg.min_use_grad)
        state = reg_mod.regularize(state, False, dcfg.val_sum_min_for_keep,
                                   dcfg, mcfg.depth_smoothing_factor)
        state = state.canonical()
        return state, stats, _export_arrays(state)

    @functools.partial(jax.jit, static_argnames=("point_budget",))
    def _observe_multi(state, kf_img, kf_gx, kf_gy, kf_max_grad, ref_stack,
                       ref_to_kf, ref_ids, good_masks, tracking_residuals,
                       skip_inc, point_budget=0):
        # batch-drain sweep: ONE EPL pass maps a whole queue of tracked
        # frames, each pixel stereo-matching against the frame its
        # nextStereoFrameMinID selects (== DepthMap::updateKeyframe with
        # the full unmapped deque, DepthMap.cpp:1072-1101, 302-319)
        gm = jax.vmap(_upsample_mask)(good_masks)
        state, stats = observe_mod.observe_multi(
            state, kf_img, kf_gx, kf_gy, kf_max_grad, ref_stack, ref_to_kf,
            ref_ids, gm, tracking_residuals, skip_inc, cam, dcfg, mcfg,
            point_budget=point_budget)
        state = reg_mod.fill_holes(state, kf_max_grad, dcfg,
                                   mcfg.min_use_grad)
        state = reg_mod.regularize(state, False, dcfg.val_sum_min_for_keep,
                                   dcfg, mcfg.depth_smoothing_factor)
        state = state.canonical()
        return state, stats, _export_arrays(state)

    @functools.partial(jax.jit, static_argnames=("have_good_mask",))
    def _create_kf(state, old_to_new, kf_img, new_img, new_max_grad,
                   good_mask, have_good_mask):
        # createKeyFrame sequence (DepthMap.cpp:1222-1306)
        state = reg_mod.propagate(state, old_to_new, kf_img, new_img,
                                  new_max_grad, _upsample_mask(good_mask),
                                  have_good_mask, cam, dcfg, mcfg)
        state = reg_mod.regularize(state, True, dcfg.val_sum_min_for_keep,
                                   dcfg, mcfg.depth_smoothing_factor)
        state = reg_mod.fill_holes(state, new_max_grad, dcfg,
                                   mcfg.min_use_grad)
        state = reg_mod.regularize(state, False, dcfg.val_sum_min_for_keep,
                                   dcfg, mcfg.depth_smoothing_factor)
        # renormalize mean inverse depth to 1 (DepthMap.cpp:1285-1306)
        m = state.valid.astype(jnp.float32)
        num = jnp.maximum(jnp.sum(m), 1.0)
        mean_id = jnp.sum(jnp.where(state.valid, state.idepth_smoothed,
                                    0.0)) / num
        rescale = 1.0 / jnp.maximum(mean_id, 1e-6)
        r2 = rescale * rescale
        state = state.replace(
            idepth=jnp.where(state.valid, state.idepth * rescale,
                             state.idepth),
            idepth_smoothed=jnp.where(state.valid,
                                      state.idepth_smoothed * rescale,
                                      state.idepth_smoothed),
            var=jnp.where(state.valid, state.var * r2, state.var),
            var_smoothed=jnp.where(state.valid, state.var_smoothed * r2,
                                   state.var_smoothed),
        )
        return state.canonical(), rescale

    @jax.jit
    def _finalize(state, kf_max_grad):
        # finalizeKeyFrame (DepthMap.cpp:1363-1390)
        state = reg_mod.fill_holes(state, kf_max_grad, dcfg,
                                   mcfg.min_use_grad)
        state = reg_mod.regularize(state, False, dcfg.val_sum_min_for_keep,
                                   dcfg, mcfg.depth_smoothing_factor)
        return state.canonical()

    @jax.jit
    def _init_random(key, kf_max_grad):
        h, w = cfg.height, cfg.width
        idepth = jax.random.uniform(key, (h, w), jnp.float32, 0.5, 1.5)
        interior = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
        valid = interior & (kf_max_grad > mcfg.min_use_grad)
        return DepthMapState(
            valid=valid,
            idepth=jnp.where(valid, idepth, 0.0),
            var=jnp.where(valid, dcfg.var_random_init_initial, 0.0),
            # initializeRandomly seeds smoothed values directly
            # (DepthMap.cpp:897-903 uses the 5-arg ctor)
            idepth_smoothed=jnp.where(valid, idepth, -1.0),
            var_smoothed=jnp.where(valid, dcfg.var_random_init_initial,
                                   -1.0),
            validity=jnp.where(valid, 20.0, 0.0),
            blacklisted=jnp.zeros((h, w), jnp.int32),
            next_min_id=jnp.zeros((h, w), jnp.float32),
        ).canonical()

    @jax.jit
    def _init_gt(gt_idepth, kf_max_grad):
        h, w = cfg.height, cfg.width
        interior = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
        valid = interior & (kf_max_grad > mcfg.min_use_grad) & (gt_idepth > 0)
        return DepthMapState(
            valid=valid,
            idepth=jnp.where(valid, gt_idepth, 0.0),
            var=jnp.where(valid, dcfg.var_gt_init_initial, 0.0),
            idepth_smoothed=jnp.where(valid, gt_idepth, -1.0),
            var_smoothed=jnp.where(valid, dcfg.var_gt_init_initial, -1.0),
            validity=jnp.where(valid, 20.0, 0.0),
            blacklisted=jnp.zeros((h, w), jnp.int32),
            next_min_id=jnp.zeros((h, w), jnp.float32),
        ).canonical()

    _export = jax.jit(_export_arrays)

    @jax.jit
    def _set_from_existing(re_idepth, re_var, re_validity):
        # setFromExistingKF (DepthMap.cpp:920-962)
        valid = re_var > 0
        state = DepthMapState(
            valid=valid,
            idepth=jnp.where(valid, re_idepth, 0.0),
            var=jnp.where(valid, re_var, 0.0),
            idepth_smoothed=jnp.full_like(re_idepth, -1.0),
            var_smoothed=jnp.full_like(re_idepth, -1.0),
            validity=jnp.where(valid, re_validity, 0.0),
            blacklisted=jnp.where(
                ~valid & (re_var == -2.0),
                jnp.int32(dcfg.min_blacklist - 1), jnp.int32(0)),
            next_min_id=jnp.zeros_like(re_idepth),
        )
        return reg_mod.regularize(state, False, dcfg.val_sum_min_for_keep,
                                  dcfg, mcfg.depth_smoothing_factor).canonical()


    from lsd_slam_tpu.utils.aot_cache import aot_wrap
    ctx = repr((cam, cfg))
    return DepthPrograms(
        observe=aot_wrap("observe", _observe,
                         static_argnames=("point_budget",), context=ctx),
        observe_multi=aot_wrap("observe_multi", _observe_multi,
                               static_argnames=("point_budget",),
                               context=ctx),
        create_kf=aot_wrap("create_kf", _create_kf,
                           static_argnames=("have_good_mask",), context=ctx),
        finalize=aot_wrap("finalize_kf", _finalize, context=ctx),
        init_random=_init_random, init_gt=_init_gt, export=_export,
        set_from_existing=aot_wrap("set_from_existing", _set_from_existing,
                                   context=ctx))


class DepthMap:
    """Semi-dense depth filter bound to one camera/config.

    All jitted programs come from the shared `get_depth_programs` cache
    (static shapes; traced once process-wide per camera/config)."""

    def __init__(self, cam: Camera, cfg: LSDConfig):
        self.cam = cam
        self.cfg = cfg
        progs = get_depth_programs(cam, cfg.program_key())
        self._observe = progs.observe
        self._observe_multi = progs.observe_multi
        self._create_kf = progs.create_kf
        self._finalize = progs.finalize
        self._init_random = progs.init_random
        self._init_gt = progs.init_gt
        self._export = progs.export
        self._set_from_existing_jit = progs.set_from_existing

        self.state: Optional[DepthMapState] = None
        self._fresh_export = None
        # previous sweep's eligible-pixel count -> next sweep's budget
        # bucket (None = unknown -> full budget). May hold a device scalar
        # (standalone path) resolved lazily at the next pick.
        self.last_active = None
        # reference bookkeeping (SlamSystem increments these)
        self.num_frames_tracked_on_this = 0
        self.num_mapped_on_this = 0

    # ------------------------------------------------------------------ API

    def is_valid(self) -> bool:
        return self.state is not None

    def pick_budget(self) -> int:
        la = self.last_active
        if la is not None and not isinstance(la, float):
            la = float(np.asarray(la))
            self.last_active = la
        return pick_observe_budget(self.cfg.height, self.cfg.width, la)

    def invalidate(self):
        self.state = None
        self._fresh_export = None

    def initialize_randomly(self, kf_max_grad, seed: int = 0):
        self.state = self._init_random(jax.random.PRNGKey(seed),
                                       jnp.asarray(kf_max_grad))
        self.last_active = None
        self.num_frames_tracked_on_this = 0
        self.num_mapped_on_this = 0

    def initialize_from_gt(self, gt_idepth, kf_max_grad):
        self.state = self._init_gt(jnp.asarray(gt_idepth),
                                   jnp.asarray(kf_max_grad))
        self.last_active = None
        self.num_frames_tracked_on_this = 0
        self.num_mapped_on_this = 0

    def set_from_existing_kf(self, re_idepth, re_var, re_validity):
        self.state = self._set_from_existing_jit(
            jnp.asarray(re_idepth), jnp.asarray(re_var),
            jnp.asarray(re_validity))
        self.last_active = None
        self.num_frames_tracked_on_this = 0
        self.num_mapped_on_this = 0

    def update_keyframe(self, kf_pyr, ref_img, ref_to_kf, ref_id: float,
                        good_mask, tracking_residual):
        """One observe sweep with one tracked frame (sequential-mode
        updateKeyframe; DepthMap.cpp:1072-1213).

        ref_to_kf / good_mask / tracking_residual may be device values —
        the sweep dispatches without any host synchronization (the caller
        reads the returned stats dict whenever it syncs). Returns the stats
        dict of device scalars."""
        # adaptive skip increment (DepthMap.cpp:449-452)
        skip_inc = max(
            3.0, self.num_frames_tracked_on_this
            / float(self.num_mapped_on_this + 5))
        self.state, stats, export = self._observe(
            self.state, kf_pyr.images[0], kf_pyr.gx[0], kf_pyr.gy[0],
            kf_pyr.max_grad[0], jnp.asarray(ref_img), jnp.asarray(ref_to_kf),
            jnp.float32(ref_id), jnp.asarray(good_mask),
            jnp.asarray(tracking_residual, jnp.float32),
            jnp.float32(skip_inc), point_budget=self.pick_budget())
        self.last_active = stats["active"]  # device scalar, resolved lazily
        self._fresh_export = export
        self.num_mapped_on_this += 1
        return stats

    def update_keyframe_multi(self, kf_pyr, ref_imgs, ref_to_kfs, ref_ids,
                              good_masks, tracking_residuals):
        """One mapping iteration consuming a QUEUE of tracked frames
        (== updateKeyframe with the whole unmappedTrackedFrames deque,
        SlamSystem.cpp:542-571 / DepthMap.cpp:1072-1101): each pixel picks
        its stereo partner via nextStereoFrameMinID, so a single EPL sweep
        maps every queued frame — this is what lets the async mapping
        thread catch up to free-running tracking.

        Inputs are parallel lists ordered by ascending frame id; all may be
        device values. Batches pad to the next MULTI_REF_BUCKETS size by
        replicating the newest frame (never selected); longer queues chunk
        in groups of the largest bucket. Returns a stats dict of device
        scalars (summed over chunks)."""
        n = len(ref_imgs)
        assert n == len(ref_to_kfs) == len(ref_ids) == len(good_masks) \
            == len(tracking_residuals) and n >= 1
        if n == 1:
            return self.update_keyframe(kf_pyr, ref_imgs[0], ref_to_kfs[0],
                                        ref_ids[0], good_masks[0],
                                        tracking_residuals[0])
        total = None
        kmax = MULTI_REF_BUCKETS[-1]
        for lo in range(0, n, kmax):
            chunk = slice(lo, min(lo + kmax, n))
            imgs = list(ref_imgs[chunk])
            r2ks = [np.asarray(r, np.float32) for r in ref_to_kfs[chunk]]
            ids = [float(i) for i in ref_ids[chunk]]
            gms = list(good_masks[chunk])
            trs = [float(t) for t in tracking_residuals[chunk]]
            k = next(b for b in MULTI_REF_BUCKETS if b >= len(imgs))
            while len(imgs) < k:  # pad: replicate newest (never selected)
                imgs.append(imgs[-1])
                r2ks.append(r2ks[-1])
                ids.append(ids[-1])
                gms.append(gms[-1])
                trs.append(trs[-1])
            skip_inc = max(
                3.0, self.num_frames_tracked_on_this
                / float(self.num_mapped_on_this + 5))
            # multi-ref sweeps always use the FULL budget: a batch maps K
            # frames of eligible pixels at once, and one budget per K keeps
            # the compiled-program count at len(MULTI_REF_BUCKETS)
            self.state, stats, export = self._observe_multi(
                self.state, kf_pyr.images[0], kf_pyr.gx[0], kf_pyr.gy[0],
                kf_pyr.max_grad[0], jnp.stack(imgs),
                jnp.asarray(np.stack(r2ks)),
                jnp.asarray(ids, jnp.float32), jnp.stack(gms),
                jnp.asarray(trs, jnp.float32), jnp.float32(skip_inc),
                point_budget=observe_budget_full(*self.state.idepth.shape))
            self.last_active = stats["active"]
            self._fresh_export = export
            # one frame == one mapping unit (the reference's per-pop
            # iteration count, SlamSystem.cpp:566-581) — a batched sweep
            # consumes chunk-many at once
            self.num_mapped_on_this += chunk.stop - chunk.start
            total = stats if total is None else {
                key: total[key] + stats[key] for key in stats}
        return total

    def snapshot(self):
        """Cheap functional snapshot for speculative mapping dispatch —
        state is immutable arrays, so this is just the references."""
        return (self.state, self._fresh_export, self.num_mapped_on_this,
                self.num_frames_tracked_on_this, self.last_active)

    def restore(self, snap):
        (self.state, self._fresh_export, self.num_mapped_on_this,
         self.num_frames_tracked_on_this, self.last_active) = snap

    def create_keyframe(self, old_to_new, old_kf_img, new_pyr, good_mask,
                        have_good_mask: bool):
        """Propagate into a new keyframe; returns the idepth rescale factor
        the caller must absorb into thisToParent (DepthMap.cpp:1285-1306)."""
        self._fresh_export = None
        self.state, rescale = self._create_kf(
            self.state, jnp.asarray(old_to_new), jnp.asarray(old_kf_img),
            new_pyr.images[0], new_pyr.max_grad[0], jnp.asarray(good_mask),
            have_good_mask=bool(have_good_mask))
        self.num_frames_tracked_on_this = 0
        self.num_mapped_on_this = 0
        self.last_active = None
        return float(rescale)

    def finalize_keyframe(self, kf_max_grad):
        self._fresh_export = None
        self.state = self._finalize(self.state, jnp.asarray(kf_max_grad))

    def fresh_export_device(self) -> Optional[tuple]:
        """Consume the device-side (idepth0, ivar0, mean, num) export fused
        into the last observe, without any host sync."""
        e = self._fresh_export
        self._fresh_export = None
        return e

    def export_depth(self) -> Tuple[jnp.ndarray, jnp.ndarray, float, int]:
        """(idepth0, ivar0, mean_idepth, num_points) for Frame::setDepth.
        Reuses the export fused into the last observe when fresh."""
        if self._fresh_export is not None:
            idepth0, ivar0, mean_id, num = self._fresh_export
            self._fresh_export = None
        else:
            idepth0, ivar0, mean_id, num = self._export(self.state)
        return idepth0, ivar0, float(mean_id), int(num)

    def reactivation_snapshot(self):
        """takeReActivationData equivalent (Frame.cpp:107-145): level-0
        idepth/var/validity arrays for later re-activation."""
        s = self.state
        re_var = jnp.where(
            s.valid, s.var,
            jnp.where(s.blacklisted < 0, -2.0, -1.0))
        return (jnp.where(s.valid, s.idepth, 0.0), re_var,
                jnp.where(s.valid, s.validity, 0.0))
