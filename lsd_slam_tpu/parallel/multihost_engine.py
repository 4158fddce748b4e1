"""Multi-host ENGINE integration: keyframe-partitioned candidate search
and cross-process PGO driven by the live SlamSystem.

SURVEY section 7 T6 / 2.11: the reference scales candidate search with one
process's threads; the multi-host build partitions the permaRef store and
the quick-track candidate batches across processes (each host's chips
track a slice of keyframes), and runs pose-graph optimization as one SPMD
program over the global device mesh. Graph topology and the small permaRef
clouds (~60 KB each at 640x480 L4) ride the HostChannel host-RPC; only
the PGO state touches device collectives.

Roles:
  * rank 0 — the FRONTEND: runs the full SlamSystem; its KeyFrameGraph
    calls `quick_refs` / `quick_frames` which fan candidate slices out to
    every rank (including doing its own slice locally) and gather results;
    `pgo` runs the SPMD distributed step with every rank participating.
  * ranks 1..N-1 — WORKERS: `serve()` loops on broadcast commands,
    mirrors finished keyframes' permaRefs, answers quick-track shards on
    LOCAL devices, and joins the global-mesh PGO program.

All commands are strictly ordered on the channel; the frontend serializes
them behind a lock (the constraint worker and the optimization worker can
both issue commands concurrently in async mode).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

from lsd_slam_tpu.parallel.multihost import HostChannel, global_mesh


def _tree_to_host(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _tree_to_device(tree):
    import jax.numpy as jnp
    import jax
    return jax.tree_util.tree_map(jnp.asarray, tree)


def _round_robin(n: int, world: int) -> List[List[int]]:
    """Deterministic candidate partition: index i -> rank i % world."""
    out: List[List[int]] = [[] for _ in range(world)]
    for i in range(n):
        out[i % world].append(i)
    return out


class _QuickBackend:
    """Per-process quick-track executor over a mirrored permaRef store."""

    def __init__(self, cam, cfg):
        from lsd_slam_tpu.tracking.quick_tracker import QuickTracker

        self.cam = cam
        self.cfg = cfg
        self.qt = QuickTracker(cam, cfg.tracker,
                               sigma2=cfg.mapping.camera_pixel_noise2)
        self.permaref: Dict[int, tuple] = {}  # kf_id -> (pts dev, quad dev)

    def add_kf(self, kf_id: int, pts_host, quad_host):
        self.permaref[kf_id] = (_tree_to_device(pts_host),
                                _tree_to_device(quad_host))

    def quick_refs(self, frame_quad_host, ids: List[int], inits: np.ndarray):
        """Track the (shipped) frame against this rank's slice of keyframe
        point sets. Returns host tuple arrays ordered like ids."""
        import jax
        import jax.numpy as jnp
        from lsd_slam_tpu.lie import np_sim3 as nps

        if not ids:
            return None
        frame_quad = _tree_to_device(frame_quad_host)
        pts_list = [self.permaref[i][0] for i in ids]
        n = len(pts_list)
        b = 1
        while b < n:
            b *= 2
        b = max(b, 4)
        pad = jax.tree_util.tree_map(jnp.zeros_like, pts_list[0])
        pts_list = pts_list + [pad] * (b - n)
        refs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pts_list)
        inits_j = jnp.asarray(np.concatenate(
            [np.asarray(inits, np.float32).reshape(n, 7),
             np.tile(nps.se3_identity().astype(np.float32), (b - n, 1))]))
        res = self.qt.track_batch_pts(refs, frame_quad, inits_j)
        out = (res.ref_to_frame, res.tracking_good, res.point_usage,
               res.good_count, res.bad_count)
        return tuple(np.asarray(o)[:n] for o in out)

    def quick_frames(self, ref_pts_host, ids: List[int], inits: np.ndarray):
        """Reciprocal direction: ONE (shipped) reference point set tracked
        against this rank's slice of keyframe frame-quads."""
        import jax.numpy as jnp
        from lsd_slam_tpu.lie import np_sim3 as nps

        if not ids:
            return None
        ref_pts = _tree_to_device(ref_pts_host)
        quads_list = [self.permaref[i][1] for i in ids]
        n = len(quads_list)
        b = 1
        while b < n:
            b *= 2
        b = max(b, 4)
        quads = jnp.stack(list(quads_list)
                          + [jnp.zeros_like(quads_list[0])] * (b - n))
        inits_j = jnp.asarray(np.concatenate(
            [np.asarray(inits, np.float32).reshape(n, 7),
             np.tile(nps.se3_identity().astype(np.float32), (b - n, 1))]))
        res = self.qt.track_batch_frames(ref_pts, quads, inits_j)
        out = (res.ref_to_frame, res.tracking_good, res.point_usage,
               res.good_count, res.bad_count)
        return tuple(np.asarray(o)[:n] for o in out)


def _spmd_pgo(payload, num_iterations: int) -> np.ndarray:
    """The SPMD body every rank executes for a `pgo` command."""
    import jax
    import jax.numpy as jnp
    from lsd_slam_tpu.parallel.distributed import distributed_pgo_cg_step
    from lsd_slam_tpu.parallel.multihost import replicated, edge_sharded

    mesh = global_mesh()
    n = int(payload["poses"].shape[0])
    step = distributed_pgo_cg_step(mesh, n)
    poses = replicated(mesh, payload["poses"].astype(np.float32))
    args = (replicated(mesh, payload["fixed"]),
            edge_sharded(mesh, payload["efrom"].astype(np.int32)),
            edge_sharded(mesh, payload["eto"].astype(np.int32)),
            edge_sharded(mesh, payload["meas_inv"].astype(np.float32)),
            edge_sharded(mesh, payload["info"].astype(np.float32)),
            edge_sharded(mesh, payload["delta"].astype(np.float32)))
    lam = 1e-6
    last_chi2 = None
    for _ in range(num_iterations):
        new_poses, chi2, dmax = step(poses, *args, jnp.float32(lam))
        total_chi2 = float(chi2)
        dmax = float(dmax)
        if not np.isfinite(dmax) or dmax > 10.0:
            lam *= 10
            continue
        poses = new_poses
        if last_chi2 is not None and total_chi2 > last_chi2 * 1.5:
            lam *= 10
        else:
            lam = max(lam * 0.3, 1e-8)
        last_chi2 = total_chi2
        if dmax < 1e-9:
            break
    out = np.asarray(jax.device_get(poses), np.float64)
    out[:, 0:4] /= np.linalg.norm(out[:, 0:4], axis=1, keepdims=True)
    return out


class MultihostFrontend:
    """Rank-0 handle the engine talks to (None on single-host runs)."""

    # a fan-out only pays once every rank gets a couple of lanes
    min_candidates = 4

    def __init__(self, channel: HostChannel, cam, cfg):
        self.channel = channel
        self.world = channel.world
        self.backend = _QuickBackend(cam, cfg)
        self._lock = threading.Lock()
        # workers build their QuickTracker from the same (cam, cfg)
        with self._lock:
            self.channel.broadcast(("hello", cam, cfg))

    # ---------------------------------------------------------- commands

    def add_kf(self, kf_id: int, pts, quad):
        """Mirror a finished keyframe's permaRef on every rank."""
        pts_h = _tree_to_host(pts)
        quad_h = _tree_to_host(quad)
        with self._lock:
            self.channel.broadcast(("add_kf", kf_id, pts_h, quad_h))
        self.backend.add_kf(kf_id, pts_h, quad_h)

    def has_kf(self, kf_id: int) -> bool:
        return kf_id in self.backend.permaref

    def quick_refs(self, frame_quad, kf_ids: List[int], inits: np.ndarray):
        """Keyframe-partitioned quick-track: frame vs kf_ids' point sets."""
        return self._fanout("quick_refs", _tree_to_host(frame_quad),
                            kf_ids, inits)

    def quick_frames(self, ref_pts, kf_ids: List[int], inits: np.ndarray):
        return self._fanout("quick_frames", _tree_to_host(ref_pts),
                            kf_ids, inits)

    def _fanout(self, cmd: str, shipped, kf_ids: List[int],
                inits: np.ndarray):
        n = len(kf_ids)
        parts = _round_robin(n, self.world)
        with self._lock:
            self.channel.broadcast((
                cmd, shipped,
                [[kf_ids[i] for i in p] for p in parts],
                [np.asarray(inits, np.float32)[p] for p in parts]))
            mine = getattr(self.backend, cmd)(
                shipped, [kf_ids[i] for i in parts[0]],
                np.asarray(inits, np.float32)[parts[0]])
            replies = self.channel.gather(mine)
        # reassemble into original candidate order
        outs = [None] * n
        for rank, part in enumerate(parts):
            if not part:
                continue
            r = replies[rank]
            for j, i in enumerate(part):
                outs[i] = tuple(a[j] for a in r)
        return tuple(np.stack([o[k] for o in outs])
                     for k in range(len(outs[0])))

    def pgo(self, payload, num_iterations: int = 10) -> np.ndarray:
        """Pose-graph optimization as ONE SPMD program over the global
        mesh — every rank participates."""
        with self._lock:
            self.channel.broadcast(("pgo", payload, num_iterations))
            return _spmd_pgo(payload, num_iterations)

    def stop(self):
        with self._lock:
            self.channel.broadcast(("stop",))
        self.channel.barrier()
        self.channel.close()


def serve(channel: HostChannel) -> None:
    """Worker loop for ranks >= 1: answer engine commands until 'stop'."""
    backend: Optional[_QuickBackend] = None
    while True:
        msg = channel.broadcast(None)
        cmd = msg[0]
        if cmd == "stop":
            channel.barrier()
            channel.close()
            return
        if cmd == "hello":
            backend = _QuickBackend(msg[1], msg[2])
        elif cmd == "add_kf":
            backend.add_kf(msg[1], msg[2], msg[3])
        elif cmd in ("quick_refs", "quick_frames"):
            _, shipped, id_parts, init_parts = msg
            rank = channel.rank
            out = getattr(backend, cmd)(shipped, id_parts[rank],
                                        init_parts[rank])
            channel.gather(out)
        elif cmd == "pgo":
            _spmd_pgo(msg[1], msg[2])
        else:  # pragma: no cover
            raise RuntimeError(f"unknown multihost command {cmd!r}")
