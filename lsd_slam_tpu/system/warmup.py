"""Engine warmup: pre-trace + pre-compile every dispatchable program.

The reference pays no JIT cost (ahead-of-time C++); a JAX engine pays
trace+compile on the FIRST call of each program shape. All engine programs
live in module-level caches keyed on (camera, config, shapes)
(tracking.se3_tracker.get_se3_program, depth.depth_map.get_depth_programs,
system.slam_system._get_frame_step, ...), so compiling them ONCE per
process makes every subsequently constructed SlamSystem hot from frame 0 —
this module provides the product API that does so.

`warmup(cam, cfg)` runs a short scripted synthetic episode at the real
frame resolution through a scratch SlamSystem, forcing the rare paths
(keyframe switches, constraint search at all Sim3 level ranges, quick-track
batch buckets, PGO vertex buckets, re-activation, relocalization) that an
ordinary run only hits minutes in. The scratch engine is discarded; the
compiled programs stay in the shared caches.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax.numpy as jnp

from lsd_slam_tpu.camera import Camera
from lsd_slam_tpu.config import LSDConfig


def warmup(cam: Camera, cfg: LSDConfig, enable_slam: bool = True,
           n_switches: int = 5, verbose: bool = False) -> dict:
    """Pre-compile the engine program set for (cam, cfg).

    n_switches forced keyframe promotions compile the switch path
    (finalize / propagate / Sim3 constraint search / PGO) and walk the
    quick-track batch buckets + PGO vertex buckets a real run starts in.
    Returns a dict of timings. Safe to call more than once (second call is
    cheap — every program is already cached)."""
    from lsd_slam_tpu import lie
    from lsd_slam_tpu.system.slam_system import SlamSystem
    from lsd_slam_tpu.utils import synth
    from lsd_slam_tpu.utils.stats import device_sync

    t0 = time.perf_counter()
    scene = synth.PlaneScene(seed=7)
    sys_ = SlamSystem(cam, cfg, enable_slam=enable_slam, seed=7)

    def pose(i):
        # small lateral arc — comfortably trackable at any resolution
        t = np.asarray(lie.se3_exp(jnp.asarray(
            [0, 0, 0, 0, 0.004 * i, 0], jnp.float32)))
        c2w = np.concatenate([t[0:4], [0.01 * i, 0.0, 0.002 * i]])
        return np.asarray(lie.se3_inverse(jnp.asarray(
            c2w.astype(np.float32))))

    img0, dep0 = synth.render(scene, cam, jnp.asarray(pose(0)))
    sys_.gt_depth_init(np.asarray(img0), np.asarray(dep0), 0, 0.0)

    fid = 0
    # two plain frames: compiles build_frame, the fused speculative
    # _frame_step (pyramid + track + observe + export + pack)
    for _ in range(2):
        fid += 1
        img, _ = synth.render(scene, cam, jnp.asarray(pose(fid)))
        sys_.track_frame(img, fid, fid / 30.0)
    # standalone observe (async/reloc-path mapping iteration)
    sys_.do_mapping_iteration()
    t_track = time.perf_counter()

    # forced keyframe switches: standalone tracker (non-speculative path),
    # finalize + propagate, constraint search (Sim3 at all level ranges,
    # quick-track buckets), PGO buckets
    for s in range(n_switches):
        fid += 1
        img, _ = synth.render(scene, cam, jnp.asarray(pose(fid)))
        sys_.create_new_keyframe = True
        sys_.track_frame(img, fid, fid / 30.0)
        fid += 1
        img, _ = synth.render(scene, cam, jnp.asarray(pose(fid)))
        sys_.track_frame(img, fid, fid / 30.0)
    t_switch = time.perf_counter()

    # compile EVERY observe-budget bucket of both the fused frame step and
    # the standalone observe program: the engine switches buckets as the
    # eligible set shrinks (depth_map.pick_observe_budget), and in async
    # mode a mid-run compile stalls the mapping thread long enough to
    # starve tracking (queue full -> dropped frames -> loss)
    from lsd_slam_tpu.depth.depth_map import observe_budget_buckets
    import jax
    if sys_.map.is_valid() and sys_.current_keyframe is not None:
        kf = sys_.current_keyframe
        st = sys_.map.state
        img, _ = synth.render(scene, cam, jnp.asarray(pose(fid)))
        init7 = np.zeros(7, np.float32)
        init7[0] = 1.0  # identity quaternion
        extras2 = np.zeros(2, np.float32)
        for b in observe_budget_buckets(cfg.height, cfg.width):
            out = sys_._frame_step(
                st, kf.tracking_ref, kf.pyr,
                jnp.asarray(img, jnp.float32), init7, extras2,
                point_budget=b)
            jax.block_until_ready(out[4])
            out2 = sys_.map._observe(
                st, kf.pyr.images[0], kf.pyr.gx[0], kf.pyr.gy[0],
                kf.pyr.max_grad[0], kf.pyr.images[0],
                jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32)),
                jnp.float32(1.0),
                jnp.ones_like(kf.pyr.images[0], dtype=bool),
                jnp.float32(1.0), jnp.float32(3.0), point_budget=b)
            jax.block_until_ready(out2[1]["active"])
        # multi-ref queue-drain sweeps (async thread mode): one program
        # per K bucket at the full budget
        from lsd_slam_tpu.depth.depth_map import (MULTI_REF_BUCKETS,
                                                  observe_budget_full)
        ident = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
        gm_min = jnp.ones((cfg.height >> cfg.tracker.min_level,
                           cfg.width >> cfg.tracker.min_level), dtype=bool)
        for k in MULTI_REF_BUCKETS:
            out3 = sys_.map._observe_multi(
                st, kf.pyr.images[0], kf.pyr.gx[0], kf.pyr.gy[0],
                kf.pyr.max_grad[0],
                jnp.stack([kf.pyr.images[0]] * k),
                jnp.stack([ident] * k),
                jnp.asarray([1.0] * k, jnp.float32),
                jnp.stack([gm_min] * k),
                jnp.ones((k,), jnp.float32), jnp.float32(3.0),
                point_budget=observe_budget_full(cfg.height, cfg.width))
            jax.block_until_ready(out3[1]["active"])
    t_buckets = time.perf_counter()

    reloc_ok = False
    if enable_slam and sys_.backend is not None and len(sys_.keyframes) >= 2:
        # re-activation program (setFromExistingKF)
        kf = sys_.keyframes[0]
        if kf.reactivation is not None:
            state_snap = sys_.map.snapshot()
            current = sys_.current_keyframe
            sys_.load_existing_keyframe(kf)
            sys_.current_keyframe = current
            sys_.map.restore(state_snap)
        # batched relocalizer program (first bucket)
        from lsd_slam_tpu.frames import build_frame
        img, _ = synth.render(scene, cam, jnp.asarray(pose(1)))
        pyr = build_frame(jnp.asarray(img, jnp.float32),
                          cfg.system.pyramid_levels, cfg.mapping.min_use_grad)
        try:
            sys_.backend.relocalize(pyr, fid + 1, 0.0)
            reloc_ok = True
        except Exception:  # pragma: no cover - warmup must never fail a run
            pass

    sys_.finalize()
    device_sync()
    out = {
        "total_s": round(time.perf_counter() - t0, 2),
        "frame_path_s": round(t_track - t0, 2),
        "switch_path_s": round(t_switch - t_track, 2),
        "bucket_path_s": round(t_buckets - t_switch, 2),
        "keyframes": len(sys_.keyframes),
        "reloc_warmed": reloc_ok,
    }
    if verbose:  # pragma: no cover
        print(f"[warmup] {out}")
    return out
