"""Multi-host runtime: jax.distributed bring-up + host-side graph channel.

SURVEY section 2.11: the reference scales with boost threads in one process
and ROS pub/sub between processes; the TPU-native equivalent is the
`jax.distributed` runtime for the numeric state (collectives over ICI
within a slice, DCN across hosts) plus a host-to-host side channel for the
irregular graph bookkeeping (keyframe metadata, edge topology) — graph
structure is data-dependent and tiny, so it rides a plain TCP socket
channel (the "host RPC"), while the O(E*49) normal-equation blocks reduce
on the device mesh.

Components:
  * `init_multihost`      — jax.distributed.initialize wrapper (idempotent);
  * `HostChannel`         — rank-0-rooted broadcast/gather of pickled python
                            objects over TCP (the graph-topology channel);
  * `global_mesh`         — 1-D device mesh spanning every process;
  * `replicated` / `edge_sharded` — build global arrays from host-local
                            (process-replicated) numpy data;
  * `multihost_pgo_optimize` — damped-GN pose-graph optimization over the
                            global mesh: rank 0 broadcasts the edge set,
                            every process runs the same SPMD program, the
                            result is replicated.

Tested with N processes of K virtual CPU devices each (gloo collectives) —
the standard way to exercise pod code without a pod; on TPU pods the same
code paths run over ICI/DCN.
"""

from __future__ import annotations

import pickle
import socket
import struct
import time
from typing import Any, List, Optional

import numpy as np

from lsd_slam_tpu.parallel.distributed import AXIS


# --------------------------------------------------------------------------
# jax.distributed bring-up
# --------------------------------------------------------------------------

_initialized = False


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int, local_device_count: Optional[int] = None,
                   use_gloo: bool = True) -> None:
    """Initialize the jax.distributed runtime (idempotent).

    For CPU-based multi-process testing set `local_device_count` (wires
    --xla_force_host_platform_device_count) and keep gloo collectives on;
    on real TPU pods pass local_device_count=None and the TPU runtime's
    device discovery takes over."""
    global _initialized
    if _initialized:
        return
    import os
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    import jax
    if use_gloo:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # TPU runs / older flag name
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    # Force backend bring-up NOW: device/topology registration with the
    # coordinator happens at backend init, which is lazy — a process that
    # parks on a host-channel recv before touching jax (an engine worker
    # in serve()) would otherwise never register, deadlocking every other
    # process's backend init at the local-topology exchange.
    jax.devices()
    _initialized = True


# --------------------------------------------------------------------------
# host RPC channel (graph topology / keyframe metadata)
# --------------------------------------------------------------------------

def _send_obj(conn: socket.socket, obj: Any) -> None:
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    conn.sendall(struct.pack("!Q", len(payload)) + payload)


def _recv_obj(conn: socket.socket) -> Any:
    hdr = b""
    while len(hdr) < 8:
        chunk = conn.recv(8 - len(hdr))
        if not chunk:
            raise ConnectionError("host channel closed")
        hdr += chunk
    (n,) = struct.unpack("!Q", hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("host channel closed")
        buf += chunk
    return pickle.loads(bytes(buf))


class HostChannel:
    """Rank-0-rooted TCP object channel between the SLAM processes.

    Rank 0 listens; ranks 1..N-1 connect. broadcast() sends one object from
    rank 0 to everyone; gather() collects one object per rank at rank 0;
    allgather() = gather + broadcast. This is the deliberately-boring
    "host RPC" of SURVEY 2.11 — graph topology is kilobytes, not a job for
    device collectives."""

    def __init__(self, rank: int, world: int, host: str = "127.0.0.1",
                 port: int = 49777, timeout: float = 60.0):
        self.rank = rank
        self.world = world
        self._conns: List[socket.socket] = []
        if world == 1:
            return
        if rank == 0:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((host, port))
            srv.listen(world - 1)
            srv.settimeout(timeout)
            peers = {}
            for _ in range(world - 1):
                conn, _ = srv.accept()
                peer_rank = _recv_obj(conn)
                peers[peer_rank] = conn
            srv.close()
            self._conns = [peers[r] for r in range(1, world)]
        else:
            deadline = time.time() + timeout
            while True:
                try:
                    conn = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                    conn.connect((host, port))
                    break
                except OSError:
                    conn.close()
                    if time.time() > deadline:
                        raise
                    time.sleep(0.1)
            _send_obj(conn, rank)
            self._conns = [conn]

    def broadcast(self, obj: Any = None) -> Any:
        if self.world == 1:
            return obj
        if self.rank == 0:
            for c in self._conns:
                _send_obj(c, obj)
            return obj
        return _recv_obj(self._conns[0])

    def gather(self, obj: Any) -> Optional[List[Any]]:
        if self.world == 1:
            return [obj]
        if self.rank == 0:
            out = [obj] + [None] * (self.world - 1)
            for i, c in enumerate(self._conns):
                out[i + 1] = _recv_obj(c)
            return out
        _send_obj(self._conns[0], obj)
        return None

    def allgather(self, obj: Any) -> List[Any]:
        got = self.gather(obj)
        return self.broadcast(got)

    def barrier(self) -> None:
        self.allgather(None)

    def close(self) -> None:
        for c in self._conns:
            try:
                c.close()
            except OSError:
                pass
        self._conns = []


# --------------------------------------------------------------------------
# global mesh + array placement
# --------------------------------------------------------------------------

def global_mesh():
    """1-D mesh over EVERY device of EVERY process (ICI within a host's
    slice, DCN between hosts on real pods)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (AXIS,))


def replicated(mesh, x: np.ndarray):
    """Host-local array -> fully-replicated global array."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P())
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def edge_sharded(mesh, x: np.ndarray):
    """Host-local (identical on every process) array -> globally
    axis-0-sharded array. Every process holds the full edge set (broadcast
    over the HostChannel), so each device's shard is just a slice."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(AXIS))
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


# --------------------------------------------------------------------------
# multi-host pose-graph optimization
# --------------------------------------------------------------------------

def multihost_pgo_optimize(channel: HostChannel, graph_payload=None,
                           num_iterations: int = 10):
    """Distributed PGO across all processes.

    Rank 0 passes `graph_payload` = dict(poses (N,8) f32, fixed (N,) bool,
    efrom, eto (E,) i32, meas_inv (E,8) f32, info (E,7,7) f32, delta (E,)
    f32) with E divisible by the global device count (pad with
    zero-information self-loops); other ranks pass None. The topology is
    broadcast over the host channel; every process then executes the same
    SPMD edge-sharded GN steps over the global mesh. Returns the optimized
    poses (N, 8) float64 — identical on every rank."""
    import jax
    import jax.numpy as jnp
    from lsd_slam_tpu.parallel.distributed import distributed_pgo_step

    payload = channel.broadcast(graph_payload)
    mesh = global_mesh()
    n = int(payload["poses"].shape[0])
    step = distributed_pgo_step(mesh, n)

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
