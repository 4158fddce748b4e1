"""dataset_slam: run the engine over an image folder.

== main_on_images.cpp: `python -m lsd_slam_tpu.io.runner files:<dir>
calib:<file> [hz:0] [out:<dir>] [vo]`. hz:0 is the deterministic
sequential mode (README.md:139); this build's hz=0 path is fully
deterministic (the reference's is not, README.md:241).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def parse_args(argv):
    args = {"hz": 0.0, "out": "lsd_out", "vo": False, "dump": False,
            "checkpoint": None, "resume": None, "profile": None}
    for a in argv:
        if a.startswith("files:"):
            args["files"] = a[6:]
        elif a.startswith("calib:"):
            args["calib"] = a[6:]
        elif a.startswith("hz:"):
            args["hz"] = float(a[3:])
        elif a.startswith("out:"):
            args["out"] = a[4:]
        elif a.startswith("checkpoint:"):
            args["checkpoint"] = a[11:]
        elif a.startswith("resume:"):
            args["resume"] = a[7:]
        elif a.startswith("profile:"):
            # device-truthful profiling: per-stage timers block until the
            # device drains, and a jax.profiler trace lands in the dir
            args["profile"] = a[8:]
        elif a.startswith("multihost:"):
            # multihost:<rank>:<world>[:<coord_port>[:<chan_port>]] —
            # rank 0 runs the dataset with the engine's candidate search
            # and PGO fanned out across processes; ranks >= 1 serve
            args["multihost"] = a[10:]
        elif a.startswith("pipeline:"):
            args["pipeline"] = int(a[9:])
        elif a == "vo":
            args["vo"] = True
        elif a == "dump":
            args["dump"] = True
    return args


def _parse_multihost(spec: str):
    parts = spec.split(":")
    rank, world = int(parts[0]), int(parts[1])
    coord_port = int(parts[2]) if len(parts) > 2 else 47211
    chan_port = int(parts[3]) if len(parts) > 3 else coord_port + 1
    return rank, world, coord_port, chan_port


def bringup_multihost(spec: str, cam, cfg, local_device_count=None):
    """Initialize jax.distributed + the host channel for `spec` =
    '<rank>:<world>[:<coord_port>[:<chan_port>]]'.

    Rank 0 returns a MultihostFrontend to pass into SlamSystem; other
    ranks SERVE until the frontend stops them, then return None (the
    caller should exit)."""
    from lsd_slam_tpu.parallel.multihost import init_multihost, HostChannel
    from lsd_slam_tpu.parallel import multihost_engine

    rank, world, coord_port, chan_port = _parse_multihost(spec)
    init_multihost(f"127.0.0.1:{coord_port}", world, rank,
                   local_device_count=local_device_count)
    channel = HostChannel(rank, world, port=chan_port, timeout=120.0)
    if rank == 0:
        return multihost_engine.MultihostFrontend(channel, cam, cfg)
    multihost_engine.serve(channel)
    return None


def main(argv=None):
    from lsd_slam_tpu.config import LSDConfig
    from lsd_slam_tpu.system import SlamSystem
    from lsd_slam_tpu.io.dataset import ImageFolderSource
    from lsd_slam_tpu.io.trajectory import save_tum_trajectory
    from lsd_slam_tpu.io.output import FileOutput3DWrapper, export_ply

    args = parse_args(argv if argv is not None else sys.argv[1:])
    src = ImageFolderSource(args["files"], args.get("calib"))
    cam = src.camera
    if cam is None:
        raise SystemExit("need calib:<file>")

    cfg = LSDConfig(width=cam.width, height=cam.height)
    # hz != 0 selects the async pipeline (tracking thread + mapping thread);
    # hz == 0 is the deterministic sequential mode (README.md:139)
    if args["hz"] != 0.0:
        from lsd_slam_tpu.config import SystemConfig
        cfg = cfg.replace(system=SystemConfig(sequential=False))
    if args["profile"]:
        import dataclasses
        cfg = cfg.replace(
            system=dataclasses.replace(cfg.system, profile_sync=True))
    if args.get("pipeline"):
        import dataclasses
        cfg = cfg.replace(system=dataclasses.replace(
            cfg.system, pipeline_lag=args["pipeline"]))
    multihost = None
    if args.get("multihost"):
        multihost = bringup_multihost(args["multihost"], cam, cfg)
        if multihost is None:
            print("multihost worker done", flush=True)
            return
    if args["resume"]:
        from lsd_slam_tpu.io.checkpoint import load_system
        system = load_system(args["resume"], cfg,
                             enable_slam=not args["vo"])
        print(f"resumed from {args['resume']}: "
              f"{len(system.keyframes)} keyframes", flush=True)
    else:
        system = SlamSystem(cam, cfg, enable_slam=not args["vo"],
                            multihost=multihost)
    out = FileOutput3DWrapper(args["out"], cam=cam)
    system.set_visualization(out)

    profile_ctx = None
    if args["profile"]:
        import jax
        profile_ctx = jax.profiler.trace(args["profile"])
        profile_ctx.__enter__()

    t_start = time.time()
    n = 0
    resumed = args["resume"] is not None
    id_offset = (system.trajectory[-1][1] + 1) if resumed else 0
    for i, ts, img in src:
        i = i + id_offset
        if i == 0 and not resumed:
            system.random_init(img, i, ts)
        else:
            pose = system.track_frame(img, i, ts)
            if pose is not None:
                out.publish_tracked_frame(i, ts, pose)
        n += 1
        if n % 30 == 0:
            el = time.time() - t_start
            print(f"frame {n}/{len(src)}  {n/el:.1f} fps  "
                  f"kfs={len(system.keyframes)}", flush=True)

    system.finalize()
    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        print(f"profiler trace -> {args['profile']}", flush=True)
    if args["checkpoint"]:
        from lsd_slam_tpu.io.checkpoint import save_system
        save_system(args["checkpoint"], system)
        print(f"checkpoint -> {args['checkpoint']}", flush=True)
    if args["dump"]:
        from lsd_slam_tpu.io.dump import dump_map
        dump_map(os.path.join(args["out"], "dump"), system)
    for kf in system.keyframes:
        out.publish_keyframe(kf)
    if system.backend is not None and system.backend._graph is not None:
        out.publish_keyframe_graph(system.keyframes,
                                   system.backend.graph.edges)
    save_tum_trajectory(os.path.join(args["out"], "estimated_poses.txt"),
                        system.trajectory)
    n_pts = export_ply(os.path.join(args["out"], "pointcloud.ply"),
                       system.keyframes, cam)
    el = time.time() - t_start
    print(f"done: {n} frames in {el:.1f}s ({n/el:.1f} fps), "
          f"{len(system.keyframes)} keyframes, {n_pts} points", flush=True)
    print("timing:", system.timers.summary(), flush=True)
    print("stats:", system.stats.format(), flush=True)


if __name__ == "__main__":
    main()
