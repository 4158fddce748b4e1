"""SlamSystem: the engine orchestrator.

Equivalent of SlamSystem (src/SlamSystem.{h,cpp}) re-designed for a
deterministic sequential pipeline (the reference's hz=0 semantics,
SlamSystem.cpp:1030-1039) with optional async mapping later: per frame,
tracking runs as one compiled device program; the mapping iteration
(observe / keyframe switch) runs immediately after (== blockUntilMapped).

Keyframe lifecycle, selection score, tracking-loss detection and the
mapping state machine follow SlamSystem.cpp:739-1040 (see per-method
citations). Sim(3) constraint search + pose-graph optimization hook in via
`lsd_slam_tpu.mapping` when `enable_slam` (SLAM mode).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from lsd_slam_tpu import lie
from lsd_slam_tpu.lie import np_sim3 as nps
from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import LSDConfig
from lsd_slam_tpu.frames import build_frame
from lsd_slam_tpu.depth import DepthMap
from lsd_slam_tpu.depth.observe import OBSERVE_STAT_KEYS
from lsd_slam_tpu.tracking import SE3Tracker
from lsd_slam_tpu.tracking.se3_tracker import HOST_PACK as HP
from lsd_slam_tpu.system.poses import PoseNode, PoseRegistry
from lsd_slam_tpu.system.keyframe import Keyframe, KeyframeMemory
from lsd_slam_tpu.utils.stats import RunningStats, StageTimers


class _InFlight:
    """One dispatched-but-not-retired frame of the pipelined frame loop.

    snapshot is the DepthMap snapshot taken BEFORE this frame's speculative
    observe (None for non-speculative track-only frames); create_flag
    records whether the keyframe-switch flag was already set at dispatch."""

    __slots__ = ("frame_id", "timestamp", "pyr", "res", "export", "pack",
                 "snapshot", "kf", "create_flag", "ref_out")

    def __init__(self, frame_id, timestamp, pyr, res, export, pack,
                 snapshot, kf, create_flag, ref_out=None):
        self.frame_id = frame_id
        self.timestamp = timestamp
        self.pyr = pyr
        self.res = res
        self.export = export
        self.pack = pack
        self.snapshot = snapshot
        self.kf = kf
        self.create_flag = create_flag
        # device TrackingRef rebuilt in-program from this frame's depth:
        # the next dispatch chains on it (fresh-depth tracking at any lag)
        self.ref_out = ref_out


class TrackedFrame:
    """Lightweight record of a tracked (non-key)frame.

    good_mask is the tracker's min-level DEVICE bool grid (refPixelWasGood,
    Frame.h:421-449); it never visits the host — the depth mapper upsamples
    it on device ((x >> lvl) indexing, DepthMap.cpp:322-329)."""

    __slots__ = ("id", "timestamp", "pose", "pyr", "good_mask",
                 "initial_tracked_residual", "point_usage", "parent_kf_id")

    def __init__(self, fid, timestamp, pose, pyr, good_mask,
                 initial_tracked_residual, point_usage, parent_kf_id):
        self.id = fid
        self.timestamp = timestamp
        self.pose = pose
        self.pyr = pyr
        self.good_mask = good_mask
        self.initial_tracked_residual = initial_tracked_residual
        self.point_usage = point_usage
        self.parent_kf_id = parent_kf_id


@functools.lru_cache(maxsize=None)
def _get_stats_pack():
    import jax
    return jax.jit(
        lambda svals: jnp.stack([jnp.asarray(v, jnp.float32) for v in svals]))


@functools.lru_cache(maxsize=None)
def _get_frame_step(cam: Camera, cfg: LSDConfig):
    """The WHOLE per-frame hot path — pyramid build, pyramidal SE3 track,
    speculative observe sweep (+ fill-holes/regularize), depth export and
    the scalar host pack — fused into ONE jitted program. Issuing these as
    separate stage programs costs a dispatch round-trip each on
    remote-attached TPUs; the frame then pays ~8 RTTs instead of one
    dispatch + one blocking scalar pull. (This is the jit-of-jit
    composition of tracker/observe programs — XLA inlines them.)

    Cached at module level keyed on (camera, config): every SlamSystem
    with the same key shares one traced program, so constructing a fresh
    engine (bench runs, resets, multiple sessions) never re-traces."""
    import jax
    from lsd_slam_tpu.tracking.se3_tracker import get_se3_program
    from lsd_slam_tpu.depth.depth_map import get_depth_programs

    levels = cfg.system.pyramid_levels
    ming = cfg.mapping.min_use_grad
    min_track_level = cfg.tracker.min_level
    tracker_fn = get_se3_program(cam, cfg.tracker,
                                 cfg.mapping.camera_pixel_noise2,
                                 cfg.tracker.use_affine_lighting)
    observe_fn = get_depth_programs(cam, cfg).observe

    @functools.partial(jax.jit, static_argnames=("point_budget",))
    def _frame_step(state, ref, kf_pyr, image, init7, extras2,
                    point_budget=0):
        # init7: frame->ref SE3 initial estimate — a HOST value on the
        # first frame after a keyframe change, the previous frame's DEVICE
        # res.frame_to_ref when pipelined (pose chaining without a host
        # round-trip). extras2 = [frame_id, skip_inc].
        from lsd_slam_tpu.frames import build_depth_pyramid
        from lsd_slam_tpu.tracking import make_tracking_ref

        pyr = build_frame(image, levels, ming)
        res = tracker_fn(ref, pyr, init7)
        state2, stats, export = observe_fn(
            state, kf_pyr.images[0], kf_pyr.gx[0], kf_pyr.gy[0],
            kf_pyr.max_grad[0], pyr.images[0],
            res.frame_to_ref, extras2[0], res.good_mask,
            res.initial_residual, extras2[1], point_budget=point_budget)
        # rebuild the keyframe's tracking reference from the JUST-UPDATED
        # depth, in-program: the pipelined chain hands this ref to the
        # next frame's dispatch, so pipelined tracking sees depth exactly
        # as fresh as blocking mode does (a lag-stale ref measurably
        # drifts — 6x ATE at 640x480)
        new_ref = make_tracking_ref(
            kf_pyr, build_depth_pyramid(export[0], export[1], levels),
            min_level=min_track_level, with_sim3=False)
        # pack order is defined ONCE by OBSERVE_STAT_KEYS (the host
        # unpacks with the same tuple); a stat key missing from the
        # observe dict fails loudly at trace time
        pack = jnp.concatenate(
            [res.host_pack,
             jnp.stack([jnp.asarray(stats[k], jnp.float32)
                        for k in OBSERVE_STAT_KEYS]
                       + [jnp.asarray(export[2], jnp.float32),
                          jnp.asarray(export[3], jnp.float32)])])
        return pyr, res, state2, export, pack, new_ref

    from lsd_slam_tpu.utils.aot_cache import aot_wrap
    return aot_wrap("frame_step", _frame_step,
                    static_argnames=("point_budget",),
                    context=repr((cam, cfg)))


class SlamSystem:
    def __init__(self, cam: Camera, cfg: LSDConfig = LSDConfig(),
                 enable_slam: bool = True, seed: int = 0, multihost=None):
        if cam.width != cfg.width or cam.height != cfg.height:
            cfg = cfg.replace(width=cam.width, height=cam.height)
        self.cam = cam
        self.cfg = cfg
        self.enable_slam = enable_slam
        self.seed = seed
        # multi-host frontend (parallel/multihost_engine.MultihostFrontend,
        # rank 0 only): keyframe-partitioned candidate search + SPMD PGO
        # across processes; None on single-host runs
        self.multihost = multihost

        self.tracker = SE3Tracker(cam, cfg.tracker,
                                  sigma2=cfg.mapping.camera_pixel_noise2,
                                  use_affine=cfg.tracker.use_affine_lighting)
        self.map = DepthMap(cam, cfg)
        self._stats_pack_fn = _get_stats_pack()
        # program caches key on the CANONICAL config: toggling runtime
        # switches (profile_sync, sequential, keyframe thresholds) must
        # not recompile the program set
        self._frame_step = _get_frame_step(cam, cfg.program_key())

        # == SlamSystem::setVisualization (SlamSystem.h:84): optional
        # Output3DWrapper the engine publishes keyframes/graph updates to
        self.output = None

        self.registry = PoseRegistry()
        self.keyframes: List[Keyframe] = []   # == keyframesAll
        self.id_to_keyframe = {}
        self.all_frame_poses: List[PoseNode] = []
        self.trajectory: List[tuple] = []     # (timestamp, frame_id, c2w sim3)

        self.current_keyframe: Optional[Keyframe] = None
        self.latest_tracked: Optional[TrackedFrame] = None
        self.create_new_keyframe = False
        self.tracking_is_good = True
        self.manual_tracking_loss = False
        self.last_tracking_closeness_score = 0.0
        self._score_hist = (0.0, 0.0)  # (prev, prev-prev) for the
        # pipelined keyframe-trigger extrapolation

        # tracking diagnostics (SlamSystem.h:115-118)
        self.tracking_last_residual = 0.0
        self.tracking_last_usage = 0.0
        # observability (== RunningStats + EWMA stage timers, SURVEY 5.1/5.5)
        self.stats = RunningStats()
        from lsd_slam_tpu.utils.stats import device_sync
        self.timers = StageTimers(
            sync=device_sync if cfg.system.profile_sync else None)
        # active-keyframe device-memory budget (== FrameMemory LRU;
        # reference keeps maxLoopClosureCandidates+20 active)
        self.frame_memory = KeyframeMemory(
            cfg.keyframe.max_loop_closure_candidates + 20)

        # SLAM back-end (created lazily to keep VO mode light); filled in by
        # lsd_slam_tpu.mapping integration
        self.constraint_search = None
        self.pose_graph = None
        if enable_slam:
            from lsd_slam_tpu.mapping import MappingBackend
            self.backend = MappingBackend(self)
        else:
            self.backend = None

        # pipelined frame loop (device-latency hiding; see track_frame)
        self._lag = max(0, int(cfg.system.pipeline_lag))
        self._ring: List[_InFlight] = []

        # async mapping thread (reference's mapping thread); used when the
        # engine is neither sequential nor pipelined — with pipelining the
        # speculative frame step IS the mapping iteration, so only the
        # constraint/optimization workers run as threads
        self.mapping_thread = None
        if not cfg.system.sequential and self._lag == 0:
            from lsd_slam_tpu.system.async_mapping import MappingThread
            self.mapping_thread = MappingThread(
                self, cfg.mapping.max_unmapped_queue)
            self.mapping_thread.start()

    # ------------------------------------------------------------- helpers

    def set_visualization(self, output) -> None:
        """== SlamSystem::setVisualization: attach an Output3DWrapper; the
        engine then publishes each keyframe at finalize time and graph pose
        updates after optimization merges."""
        self.output = output

    def _new_pose_node(self, frame_id: int) -> PoseNode:
        node = PoseNode(frame_id, self.registry)
        self.all_frame_poses.append(node)
        return node

    def _log_pose(self, ts, fid, node: PoseNode):
        self.trajectory.append((ts, fid, node.cam_to_world().copy()))

    # ------------------------------------------------------------- init

    def random_init(self, image, frame_id: int = 0, timestamp: float = 0.0):
        """== SlamSystem::randomInit (SlamSystem.cpp:857-888)."""
        pyr = build_frame(jnp.asarray(image, jnp.float32),
                          self.cfg.system.pyramid_levels,
                          self.cfg.mapping.min_use_grad)
        node = self._new_pose_node(frame_id)
        kf = Keyframe(frame_id, timestamp, pyr, node,
                      self.cfg.system.pyramid_levels,
                      self.cfg.mapping.min_use_grad)
        self.map.initialize_randomly(pyr.max_grad[0], seed=self.seed)
        self._export_depth_to(kf)
        self._install_keyframe(kf)
        self._log_pose(timestamp, frame_id, node)
        self.tracking_is_good = True

    def gt_depth_init(self, image, depth, frame_id: int = 0,
                      timestamp: float = 0.0):
        """== SlamSystem::gtDepthInit: seed from ground-truth depth."""
        pyr = build_frame(jnp.asarray(image, jnp.float32),
                          self.cfg.system.pyramid_levels,
                          self.cfg.mapping.min_use_grad)
        node = self._new_pose_node(frame_id)
        kf = Keyframe(frame_id, timestamp, pyr, node,
                      self.cfg.system.pyramid_levels,
                      self.cfg.mapping.min_use_grad)
        d = np.asarray(depth, np.float32)
        gt_idepth = np.where(d > 0, 1.0 / np.maximum(d, 1e-6), 0.0)
        self.map.initialize_from_gt(jnp.asarray(gt_idepth), pyr.max_grad[0])
        self._export_depth_to(kf)
        self._install_keyframe(kf)
        self._log_pose(timestamp, frame_id, node)
        self.tracking_is_good = True

    def _install_keyframe(self, kf: Keyframe):
        self.current_keyframe = kf
        self.id_to_keyframe[kf.id] = kf

    def _export_depth_to(self, kf: Keyframe):
        idepth0, ivar0, mean_id, num = self.map.export_depth()
        kf.set_depth(idepth0, ivar0, mean_id, num,
                     self.cfg.system.pyramid_levels)

    # ------------------------------------------------------------- tracking

    def track_frame(self, image, frame_id: int, timestamp: float = 0.0):
        """Track one frame (== trackFrame, SlamSystem.cpp:890-1040).

        The common case (update current keyframe, no switch) runs the
        WHOLE frame — pyramid build, track, observe sweep, export, scalar
        pack — as ONE fused device program. With pipeline_lag == 0 the
        packed host scalars are pulled immediately (hz=0 blocking mode);
        with pipeline_lag > 0 up to that many frames stay in flight, each
        chaining its tracking init from the previous frame's DEVICE pose,
        and host decisions retire lag frames behind — hiding the ~25 ms
        per-sync round-trip a remote-attached chip costs. Tracking loss is
        rare — the functional depth state simply rolls back to the
        snapshot taken before the lost frame's dispatch."""
        if not self.tracking_is_good:
            pyr = build_frame(jnp.asarray(image, jnp.float32),
                              self.cfg.system.pyramid_levels,
                              self.cfg.mapping.min_use_grad)
            if not self.keyframes:
                # Tracking lost before ANY keyframe was finished: there is
                # nothing to relocalize against, so spinning on the
                # relocalizer no-ops forever. The reference discards the
                # young keyframe and retries from scratch
                # (SlamSystem.cpp:804-827); here that means re-initializing
                # from the current frame, anchored at the last tracked pose
                # so the trajectory stays continuous.
                self._reinit_from_frame(pyr, frame_id, timestamp)
            else:
                self._attempt_relocalization(pyr, frame_id, timestamp)
            return None

        kf = self.current_keyframe
        my_create_flag = self.create_new_keyframe
        inline_map = self.cfg.system.sequential or self._lag > 0
        speculate = inline_map and not my_create_flag and self.map.is_valid()

        if speculate:
            fl = self._dispatch_frame(image, frame_id, timestamp)
            self._ring.append(fl)
            node = None
            if len(self._ring) > self._lag:
                node = self._retire_frame(self._ring.pop(0))
            # a retire that set the keyframe flag or lost tracking ends the
            # speculation run: drain so the switch/reloc sees every frame
            if self._ring and (self.create_new_keyframe
                               or not self.tracking_is_good):
                self._drain_ring()
            return node.cam_to_world() if node is not None else None

        # --- non-speculative path: keyframe-switch frame, thread-async
        # tracking, or no depth state yet ---
        self._drain_ring()
        last_node = self.all_frame_poses[-1]
        init_f2r = nps.se3_from_sim3(
            nps.sim3_mul(nps.sim3_inverse(kf.pose.cam_to_world()),
                         last_node.cam_to_world()))
        pyr = build_frame(jnp.asarray(image, jnp.float32),
                          self.cfg.system.pyramid_levels,
                          self.cfg.mapping.min_use_grad)
        with self.timers.time("track"):
            res = self.tracker.track(kf.tracking_ref, pyr,
                                     jnp.asarray(init_f2r, jnp.float32))
        fl = _InFlight(frame_id, timestamp, pyr, res, None, res.host_pack,
                       None, kf, my_create_flag)
        node = self._retire_frame(fl)
        if node is None:
            return None
        if inline_map:
            with self.timers.time("switch" if my_create_flag
                                  else "map_inline"):
                self.do_mapping_iteration()
        else:
            self.mapping_thread.push(self.latest_tracked)
        return node.cam_to_world()

    def _dispatch_frame(self, image, frame_id: int,
                        timestamp: float) -> "_InFlight":
        """Dispatch the fused speculative frame step; no host sync."""
        kf = self.current_keyframe
        if self.backend is not None:
            self.backend.merge_optimization_offset()
        snap = self.map.snapshot()
        kf.num_frames_tracked_on_this += 1
        self.map.num_frames_tracked_on_this = kf.num_frames_tracked_on_this
        # adaptive skip increment (DepthMap.cpp:449-452)
        skip_inc = max(3.0, self.map.num_frames_tracked_on_this
                       / float(self.map.num_mapped_on_this + 5))
        if self._ring and self._ring[-1].kf is kf:
            # pose + reference chaining: the previous frame's DEVICE
            # frame->ref is this frame's init (SlamSystem.cpp:922-925
            # computes exactly this product on the host), and its
            # in-program tracking-ref rebuild is this frame's reference —
            # pipelined tracking sees depth exactly as fresh as blocking
            # mode, with no host round-trip
            init7 = self._ring[-1].res.frame_to_ref
            ref_in = self._ring[-1].ref_out
        else:
            last_node = self.all_frame_poses[-1]
            init7 = np.asarray(nps.se3_from_sim3(
                nps.sim3_mul(nps.sim3_inverse(kf.pose.cam_to_world()),
                             last_node.cam_to_world())), np.float32)
            ref_in = kf.tracking_ref
        extras2 = np.asarray([frame_id, skip_inc], np.float32)
        with self.timers.time("frame_step"):
            pyr, res, new_state, export_dev, pack, ref_out = \
                self._frame_step(
                    self.map.state, ref_in, kf.pyr,
                    jnp.asarray(image, jnp.float32), init7, extras2,
                    point_budget=self.map.pick_budget())
        self.map.state = new_state
        self.map._fresh_export = None
        self.map.num_mapped_on_this += 1
        try:
            # start the device->host copy NOW; by retire time (lag frames
            # later) it has landed and the pull costs ~0.2 ms instead of a
            # ~25 ms blocking sync
            pack.copy_to_host_async()
        except (AttributeError, RuntimeError):  # pragma: no cover
            pass
        return _InFlight(frame_id, timestamp, pyr, res, export_dev, pack,
                         snap, kf, False, ref_out)

    def _retire_frame(self, fl: "_InFlight"):
        """Pull one frame's packed scalars and run every host decision:
        loss handling, pose bookkeeping, keyframe selection, observe
        commit. Returns the frame's PoseNode, or None when lost."""
        kf = fl.kf
        speculative = fl.snapshot is not None
        with self.timers.time("retire_pull"):
            host = np.asarray(fl.pack, np.float64)  # THE per-frame host sync
        self.stats.bump("host_syncs")
        diverged = bool(host[HP["diverged"]])
        tracking_good = bool(host[HP["tracking_good"]])
        point_usage = float(host[HP["point_usage"]])

        self.stats.bump("frames_tracked")
        self.tracking_last_residual = float(host[HP["last_residual"]])
        self.tracking_last_usage = point_usage

        lost = (self.manual_tracking_loss or diverged
                or (len(self.keyframes)
                    > self.cfg.keyframe.initialization_phase_count
                    and not tracking_good))
        if lost:
            if speculative:
                # roll back to the depth state before THIS frame's observe;
                # everything still in flight chained onto it and is
                # discarded wholesale
                self.map.restore(fl.snapshot)
                kf.num_frames_tracked_on_this -= 1 + len(self._ring)
                self._ring.clear()
            self.tracking_is_good = False
            self.create_new_keyframe = False
            self.manual_tracking_loss = False
            return None

        # pose bookkeeping
        frame_to_ref = host[HP["frame_to_ref"]]
        node = self._new_pose_node(fl.frame_id)
        node.this_to_parent = nps.sim3_from_se3(frame_to_ref, 1.0)
        node.parent = kf.pose
        self.registry.invalidate_all()
        self._log_pose(fl.timestamp, fl.frame_id, node)

        if not speculative:
            kf.num_frames_tracked_on_this += 1
            self.map.num_frames_tracked_on_this = \
                kf.num_frames_tracked_on_this

        tracked = TrackedFrame(
            fl.frame_id, fl.timestamp, node, fl.pyr, fl.res.good_mask,
            float(host[HP["initial_residual"]]), point_usage, kf.id)
        self.latest_tracked = tracked

        # keyframe selection (SlamSystem.cpp:997-1020)
        if (not fl.create_flag and not self.create_new_keyframe
                and kf.num_mapped_on_this_total
                > self.cfg.keyframe.min_num_mapped):
            ref_to_frame = host[HP["ref_to_frame"]]
            dist = ref_to_frame[4:7] * kf.mean_idepth
            n_kf = len(self.keyframes)
            min_val = min(0.2 + n_kf * 0.8
                          / self.cfg.keyframe.initialization_phase_count, 1.0)
            if n_kf < self.cfg.keyframe.initialization_phase_count:
                min_val *= 0.7
            score = self._ref_frame_score(float(dist @ dist), point_usage)
            prev, prev2 = self._score_hist
            self._score_hist = (score, prev)
            self.last_tracking_closeness_score = score
            # Pipelined compensation: this decision runs pipeline_lag
            # frames after the frame it describes, so an exact-threshold
            # trigger delays EVERY keyframe switch by lag frames — and the
            # extra frames land at the LARGEST baseline from the keyframe,
            # where per-frame drift is worst (measured: ~2.5x faster drift
            # at 640x480, lag 3; the score grows superlinearly — quadratic
            # distance term — so first-order extrapolation still left +lag
            # frames). Second-order extrapolation of the score history
            # fires the flag when the TRIGGER frame crosses, not when we
            # hear about it.
            d1 = max(score - prev, 0.0)
            d2 = max(score - 2.0 * prev + prev2, 0.0)
            lead = self._lag * d1 + 0.5 * self._lag * self._lag * d2
            if score + lead > min_val:
                self.create_new_keyframe = True

        if speculative:
            # commit the speculative observe
            n_stats = len(OBSERVE_STAT_KEYS)
            n_track = len(host) - n_stats - 2
            svals = host[n_track:n_track + n_stats]
            self.stats.add("observe", dict(zip(OBSERVE_STAT_KEYS, svals)))
            # the eligible count steers the next sweep's budget bucket
            self.map.last_active = float(
                svals[OBSERVE_STAT_KEYS.index("active")])
            kf.num_mapped_on_this += 1
            kf.num_mapped_on_this_total += 1
            # defer when pipelined: the chained in-program ref rebuild
            # already serves the next dispatch, so the depth pyramid /
            # tracking-ref products materialize lazily at the next switch
            # or constraint access instead of costing ~6 ms device per
            # frame here
            kf.set_depth(fl.export[0], fl.export[1], float(host[-2]),
                         int(host[-1]), self.cfg.system.pyramid_levels,
                         defer=self._lag > 0)
        return node

    def _drain_ring(self):
        """Retire every in-flight frame (pipeline barrier)."""
        while self._ring:
            self._retire_frame(self._ring.pop(0))

    def _ref_frame_score(self, dist_sq: float, usage: float) -> float:
        kcfg = self.cfg.keyframe
        return (dist_sq * kcfg.kf_dist_weight ** 2
                + (1 - usage) ** 2 * kcfg.kf_usage_weight ** 2)

    # ------------------------------------------------------------- mapping

    def do_mapping_iteration(self, tracked: Optional[TrackedFrame] = None):
        """== doMappingIteration (SlamSystem.cpp:739-830) for ONE frame.

        `tracked` is the frame to map (the popped queue entry in async
        mode); sequential callers omit it and the latest tracked frame is
        used."""
        return self.do_mapping_iteration_batch(
            [tracked] if tracked is not None else None)

    def do_mapping_iteration_batch(
            self, batch: Optional[List[TrackedFrame]] = None):
        """doMappingIteration consuming a DRAINED QUEUE of tracked frames
        (SlamSystem.cpp:739-830 + the full-deque drain of updateKeyframe,
        SlamSystem.cpp:542-571): frames tracked on a different parent are
        dropped, the rest map in one multi-ref observe sweep. A pending
        keyframe promotion uses the NEWEST drained frame — under mapping
        lag `latest_tracked` belongs to the tracking thread and may be
        fresher than anything the mapping thread has consumed."""
        if self.current_keyframe is None:
            return False
        if self.backend is not None:
            self.backend.merge_optimization_offset()
        if not self.tracking_is_good:
            return False

        kf = self.current_keyframe
        if batch is None:
            frames = [self.latest_tracked] if self.latest_tracked is not None \
                else []
        else:
            frames = [t for t in batch if t is not None]
        good = [t for t in frames if t.parent_kf_id == kf.id]
        if len(frames) != len(good):
            # == the wrong-parent drop at the queue head
            # (SlamSystem.cpp:548-556)
            self.stats.bump("mapping_dropped_wrong_parent",
                            len(frames) - len(good))

        if self.create_new_keyframe:
            # promote the FRESHEST frame tracked on this keyframe — the
            # reference promotes latestTrackedFrame (SlamSystem.cpp:783-786);
            # under queue lag the newest drained frame is the fallback so a
            # promotion is always possible (r4 VERDICT missing #1b)
            promote = self.latest_tracked
            if promote is None or promote.parent_kf_id != kf.id:
                promote = good[-1] if good else None
            if promote is None:
                return False
            self.finish_current_keyframe()
            self.change_keyframe(no_create=False, force=True, max_score=1.0,
                                 tracked=promote)
        elif good:
            self.update_keyframe_batch(good)
        return True

    def update_keyframe(self, tracked: Optional[TrackedFrame] = None):
        """Map one tracked frame into the current KF
        (== SlamSystem::updateKeyframe, SlamSystem.cpp:542-615)."""
        if tracked is None:
            tracked = self.latest_tracked
        kf = self.current_keyframe
        if tracked is None or tracked.parent_kf_id != kf.id:
            return False
        return self.update_keyframe_batch([tracked])

    def update_keyframe_batch(self, frames: List[TrackedFrame]):
        """Map a drained queue of tracked frames (all with the current KF
        as parent, ascending id) in ONE multi-ref observe sweep — the
        reference's whole-deque updateKeyframe (SlamSystem.cpp:542-571,
        DepthMap.cpp:1072-1101)."""
        kf = self.current_keyframe
        if not frames:
            return False
        frames = sorted(frames, key=lambda t: t.id)
        with self.timers.time("map_observe"):
            obs_stats = self.map.update_keyframe_multi(
                kf.pyr,
                [t.pyr.images[0] for t in frames],
                [nps.se3_from_sim3(t.pose.this_to_parent) for t in frames],
                [float(t.id) for t in frames],
                [t.good_mask for t in frames],
                [t.initial_tracked_residual for t in frames])
        svals = np.asarray(self._stats_pack_fn(  # one pull for all counters
            tuple(obs_stats[k] for k in OBSERVE_STAT_KEYS)))
        self.stats.add("observe", dict(zip(OBSERVE_STAT_KEYS, svals)))
        self.stats.bump("mapping_iterations")
        self.stats.bump("mapping_frames_consumed", len(frames))
        # count frames, not sweeps: keyframe gating compares these against
        # per-frame thresholds (MIN_NUM_MAPPED, SlamSystem.cpp:996-1020)
        kf.num_mapped_on_this += len(frames)
        kf.num_mapped_on_this_total += len(frames)
        self._export_depth_to(kf)
        return True

    def finish_current_keyframe(self):
        """== finishCurrentKeyframe (SlamSystem.cpp:395-427)."""
        kf = self.current_keyframe
        with self.timers.time("finalize_kf"):
            self.map.finalize_keyframe(kf.pyr.max_grad[0])
        self._export_depth_to(kf)
        kf.reactivation = self.map.reactivation_snapshot()
        if self.backend is not None:
            # == setPermaRef on every finish (SlamSystem.cpp:404-405), so a
            # re-finished (reactivated) keyframe refreshes its level-4 cloud
            self.backend.refresh_permaref(kf)
        if kf.idx_in_keyframes < 0:
            kf.idx_in_keyframes = len(self.keyframes)
            self.keyframes.append(kf)
            if self.enable_slam and self.backend is not None:
                self.backend.on_new_keyframe(kf)
        self.frame_memory.touch(kf)
        n_min = self.frame_memory.prune(self.keyframes, self.current_keyframe)
        if n_min:
            self.stats.bump("keyframes_minimized", n_min)
        if self.output is not None:
            # == publishKeyframe on finish (SlamSystem.cpp:412-414): the
            # dense buffers go out ONCE per finalize; later graph updates
            # re-send only poses (README.md:310-324)
            self.output.publish_keyframe(kf)

    def change_keyframe(self, no_create: bool, force: bool, max_score: float,
                        tracked: Optional[TrackedFrame] = None):
        """== changeKeyframe (SlamSystem.cpp:507-540): re-activate a close
        existing KF if possible, else promote the given tracked frame
        (defaults to the latest)."""
        if tracked is None:
            tracked = self.latest_tracked
        candidate = None
        if (self.cfg.keyframe.do_kf_reactivation and self.enable_slam
                and self.backend is not None):
            candidate = self.backend.find_reposition_candidate(
                tracked, max_score)
        if candidate is not None:
            self.load_existing_keyframe(candidate)
        elif force:
            if no_create:
                self.tracking_is_good = False
            else:
                self.create_new_current_keyframe(tracked)
        self.create_new_keyframe = False
        # fresh keyframe, fresh score history (a stale pre-switch slope
        # would spuriously re-trigger through the extrapolated lead)
        self._score_hist = (0.0, 0.0)

    def create_new_current_keyframe(self, tracked: TrackedFrame):
        """== createNewCurrentKeyframe (SlamSystem.cpp:458-490)."""
        old_kf = self.current_keyframe
        # oldToNew = inverse of (new frame -> old KF)
        frame_to_kf = nps.se3_from_sim3(tracked.pose.this_to_parent)
        old_to_new = nps.se3_inverse(frame_to_kf)
        have_mask = tracked.parent_kf_id == old_kf.id
        self.stats.bump("keyframes_created")
        rescale = self.map.create_keyframe(
            jnp.asarray(old_to_new, jnp.float32), old_kf.pyr.images[0],
            tracked.pyr, jnp.asarray(tracked.good_mask), have_mask)

        new_kf = Keyframe(tracked.id, tracked.timestamp, tracked.pyr,
                          tracked.pose, self.cfg.system.pyramid_levels,
                          self.cfg.mapping.min_use_grad)
        new_kf.initial_tracked_residual = tracked.initial_tracked_residual
        # absorb the idepth renormalization into thisToParent
        # (DepthMap.cpp:1285-1306)
        new_kf.pose.this_to_parent = nps.sim3_from_se3(
            nps.se3_inverse(old_to_new), rescale)
        new_kf.pose.invalidate_cache()
        self.registry.invalidate_all()

        self._export_depth_to(new_kf)
        self._install_keyframe(new_kf)

    def load_existing_keyframe(self, kf: Keyframe):
        """== loadNewCurrentKeyframe (SlamSystem.cpp:492-506)."""
        self.stats.bump("keyframes_reactivated")
        re_id, re_var, re_validity = kf.reactivation
        self.map.set_from_existing_kf(re_id, re_var, re_validity)
        self._export_depth_to(kf)
        kf.num_mapped_on_this = 0
        kf.num_frames_tracked_on_this = 0
        self.current_keyframe = kf

    # ------------------------------------------------------------- reloc

    def _reinit_from_frame(self, pyr, frame_id: int, timestamp: float):
        """Discard the never-finished map and restart from this frame
        (loss with zero finished keyframes — the reference's
        discard-young-keyframe-and-retry, SlamSystem.cpp:804-827)."""
        node = self._new_pose_node(frame_id)
        if self.all_frame_poses[:-1]:
            # anchor the new segment at the last tracked absolute pose
            node.this_to_parent = \
                self.all_frame_poses[-2].cam_to_world().copy()
        kf = Keyframe(frame_id, timestamp, pyr, node,
                      self.cfg.system.pyramid_levels,
                      self.cfg.mapping.min_use_grad)
        self.map.initialize_randomly(pyr.max_grad[0],
                                     seed=self.seed + frame_id)
        self._export_depth_to(kf)
        self._install_keyframe(kf)
        self._log_pose(timestamp, frame_id, node)
        self.latest_tracked = None
        self.create_new_keyframe = False
        self.tracking_is_good = True
        self.stats.bump("reinitialized_after_loss")

    def _attempt_relocalization(self, pyr, frame_id, timestamp):
        """Consensus-voted candidate from the batched relocalizer, then a
        FULL SE3 track re-verification before re-activating
        (== takeRelocalizeResult, SlamSystem.cpp:695-737)."""
        if self.backend is None:
            return
        hit = self.backend.relocalize(pyr, frame_id, timestamp)
        if hit is None:
            return
        kf, frame_to_kf_init = hit
        self.load_existing_keyframe(kf)
        res = self.tracker.track(kf.tracking_ref, pyr,
                                 jnp.asarray(frame_to_kf_init, jnp.float32))
        host = np.asarray(res.host_pack, np.float64)
        good = float(host[HP["good_count"]])
        bad = float(host[HP["bad_count"]])
        good_frac = good / max(good + bad, 1.0)
        # acceptance bound from SlamSystem.cpp:717:
        # goodFraction >= 1 - 0.75*(1 - MIN_GOODPERGOODBAD_PIXEL)
        min_frac = 1.0 - 0.75 * (1.0
                                 - self.cfg.tracker.min_goodpergoodbad_pixel)
        if not bool(host[HP["tracking_good"]]) or good_frac < min_frac:
            self.stats.bump("relocalization_rejected")
            return
        node = self._new_pose_node(frame_id)
        node.this_to_parent = nps.sim3_from_se3(host[HP["frame_to_ref"]], 1.0)
        node.parent = kf.pose
        self.registry.invalidate_all()
        self._log_pose(timestamp, frame_id, node)
        self.latest_tracked = TrackedFrame(
            frame_id, timestamp, node, pyr, res.good_mask,
            float(host[HP["initial_residual"]]),
            float(host[HP["point_usage"]]), kf.id)
        self.create_new_keyframe = False
        self.tracking_is_good = True
        self.stats.bump("relocalized")

    # ------------------------------------------------------------- final

    def block_until_mapped(self, timeout: float = 60.0):
        """hz=0 blocking in async mode (SlamSystem.cpp:1030-1039)."""
        self._drain_ring()
        if self.mapping_thread is not None:
            self.mapping_thread.wait_until_drained(timeout)

    def finalize(self):
        """== SlamSystem::finalize (SlamSystem.cpp:225-263)."""
        self._drain_ring()
        if self.mapping_thread is not None:
            self.mapping_thread.wait_until_drained()
            self.mapping_thread.stop()
        if self.current_keyframe is not None and self.tracking_is_good:
            if (self.current_keyframe.idx_in_keyframes < 0
                    and self.current_keyframe.num_mapped_on_this_total
                    >= self.cfg.keyframe.min_num_mapped):
                self.finish_current_keyframe()
        if self.backend is not None:
            self.backend.finalize()
        if self.multihost is not None:
            self.multihost.stop()
            self.multihost = None

    # ------------------------------------------------------------- export

    def trajectory_array(self) -> np.ndarray:
        """(N, 8) camToWorld Sim3 per tracked frame, as logged AT TRACK
        TIME (the reference's estimated_poses.txt semantics,
        LiveSLAMWrapper.cpp:141-161)."""
        return np.stack([p for _, _, p in self.trajectory])

    def optimized_trajectory_array(self) -> np.ndarray:
        """(N, 8) camToWorld Sim3 per tracked frame RECOMPUTED through the
        pose tree after graph optimization — unlike trajectory_array, past
        frames reflect merged PGO results (ATE-after-PGO evaluation)."""
        return np.stack([node.cam_to_world()
                         for node in self.all_frame_poses])
