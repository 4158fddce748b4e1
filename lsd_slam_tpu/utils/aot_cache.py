"""AOT executable cache: serialize compiled engine programs to disk.

The reference pays zero startup cost (ahead-of-time C++,
main_on_images.cpp:128-177); a JAX engine pays trace + XLA compile for
every program shape on first call — ~8 minutes for the full 640x480
program set, and on remote-attached TPU backends the standard persistent
compilation cache does not populate (the compile happens behind the
relay). This module closes that gap the TPU-native way:
`jax.experimental.serialize_executable` round-trips the COMPILED
executable, so a process can load yesterday's binaries and skip both the
trace and the compile.

`aot_wrap(name, jitted_fn, static_argnames)` returns a callable that
  * on cache hit (same program name, argument signature, package source
    hash, jax version, device kind): deserializes the executable from
    `$LSD_AOT_CACHE_DIR` (default ~/.lsd_aot_cache) — milliseconds;
  * on miss: lowers + compiles once, serializes for next time.

Safety: the cache key includes a sha256 over every .py file in the
package, so ANY source change invalidates every entry (a stale executable
silently computing old math would be far worse than a recompile). Disable
with LSD_AOT_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading
from typing import Optional

import numpy as np

ENABLED = os.environ.get("LSD_AOT_CACHE", "1") != "0"
CACHE_DIR = os.environ.get("LSD_AOT_CACHE_DIR",
                           os.path.expanduser("~/.lsd_aot_cache"))

_source_hash: Optional[str] = None
_lock = threading.Lock()


def package_source_hash() -> str:
    """sha256 over the package's .py sources (computed once per process):
    any code change invalidates every cached executable."""
    global _source_hash
    if _source_hash is not None:
        return _source_hash
    import lsd_slam_tpu

    root = os.path.dirname(os.path.abspath(lsd_slam_tpu.__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(p.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    _source_hash = h.hexdigest()[:16]
    return _source_hash


def _env_tag() -> str:
    import jax

    dev = jax.devices()[0]
    return (f"{jax.__version__}|{dev.platform}|{dev.device_kind}"
            f"|{jax.local_device_count()}|{jax.process_count()}")


_use_cache: Optional[bool] = None


def _cache_usable() -> bool:
    """AOT caching pays on remote-attached accelerator backends, where the
    standard persistent compilation cache does not populate (the compile
    happens behind a relay). On CPU the persistent cache already works and
    serialized CPU executables carry host-machine-feature baggage — skip.
    LSD_AOT_CACHE=force enables it everywhere (tests)."""
    global _use_cache
    if _use_cache is None:
        if os.environ.get("LSD_AOT_CACHE", "") == "force":
            _use_cache = True
        else:
            import jax
            _use_cache = jax.default_backend() != "cpu"
    return _use_cache


def _leaf_sig(x) -> tuple:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return (tuple(x.shape), str(x.dtype),
                bool(getattr(x, "weak_type", False)))
    # python scalars / bools — include type and value class only
    return ("py", type(x).__name__)


class AotFunction:
    """A jitted function with a disk-backed compiled-executable cache."""

    def __init__(self, name: str, fn, static_argnames=(), context: str = ""):
        self.name = name
        self.fn = fn
        self.static = tuple(static_argnames)
        self.context = context  # e.g. repr of (camera, config)
        self._compiled = {}
        self._lock = threading.Lock()

    def __call__(self, *args, **kw):
        if not ENABLED or not _cache_usable():
            return self.fn(*args, **kw)
        import jax

        leaves = jax.tree_util.tree_leaves(args)
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            # called under an outer trace (program composition — e.g. the
            # tracker inside the fused frame step): inline the jitted fn
            return self.fn(*args, **kw)
        if any(not (hasattr(x, "shape") and hasattr(x, "dtype"))
               for x in leaves):
            # plain python scalars in the positional args are ambiguous
            # (dynamic value vs positional static) — don't risk a
            # mis-keyed executable, just use the jit path
            return self.fn(*args, **kw)
        for k in kw:
            if k not in self.static:
                # dynamic kwargs would change the calling convention of
                # the serialized executable; engine code passes dynamics
                # positionally
                return self.fn(*args, **kw)
        key = self._sig(args, kw)
        ex = self._compiled.get(key)
        if ex is None:
            with self._lock:
                ex = self._compiled.get(key)
                if ex is None:
                    ex = self._load_or_build(key, args, kw)
                    self._compiled[key] = ex
        if ex is False:  # serialization unsupported for this program
            return self.fn(*args, **kw)
        try:
            return ex(*args)
        except TypeError:
            # calling-convention mismatch (e.g. a static arg passed
            # positionally): permanently bypass for this signature rather
            # than risk mis-keyed executables
            self._compiled[key] = False
            return self.fn(*args, **kw)

    # ------------------------------------------------------------ internals

    def _sig(self, args, skw) -> str:
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(args)
        parts = [repr(treedef), repr(sorted(skw.items())),
                 repr([_leaf_sig(x) for x in leaves])]
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:20]

    def _path(self, key: str) -> str:
        ctx = hashlib.sha256(self.context.encode()).hexdigest()[:10]
        tag = hashlib.sha256(_env_tag().encode()).hexdigest()[:10]
        return os.path.join(
            CACHE_DIR, f"{self.name}-{package_source_hash()}-{ctx}-{tag}-"
                       f"{key}.aotx")

    def _load_or_build(self, key: str, args, skw):
        import jax
        from jax.experimental import serialize_executable as se

        # deserialize_and_load restores the executable's device assignment
        # over ALL local devices — on a multi-device process that breaks
        # the single-device calling convention, so the DISK path is
        # single-local-device only (the remote-attached-chip case this
        # cache exists for); multi-device processes still get in-process
        # AOT compilation
        disk_ok = jax.local_device_count() == 1
        path = self._path(key)
        if disk_ok and os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                return se.deserialize_and_load(payload, in_tree, out_tree)
            except Exception:
                try:
                    os.remove(path)
                except OSError:
                    pass
        try:
            lowered = self.fn.lower(*args, **skw)
            compiled = lowered.compile()
        except Exception:
            return False  # not lowerable (e.g. non-jit callable): bypass
        if disk_ok:
            try:
                payload, in_tree, out_tree = se.serialize(compiled)
                os.makedirs(CACHE_DIR, exist_ok=True)
                _prune_stale()
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump((payload, in_tree, out_tree), f,
                                protocol=pickle.HIGHEST_PROTOCOL)
                os.replace(tmp, path)
            except Exception:
                pass  # not serializable — the compiled object still works
        return compiled


_pruned = False


def _prune_stale():
    """Drop cache entries serialized under a different package source hash
    (every source edit strands the previous generation; once per
    process)."""
    global _pruned
    if _pruned:
        return
    _pruned = True
    tag = f"-{package_source_hash()}-"
    try:
        for fn in os.listdir(CACHE_DIR):
            if fn.endswith(".aotx") and tag not in fn:
                try:
                    os.remove(os.path.join(CACHE_DIR, fn))
                except OSError:
                    pass
    except OSError:
        pass


def aot_wrap(name: str, fn, static_argnames=(), context: str = ""):
    """Wrap a jitted function with the AOT executable cache."""
    return AotFunction(name, fn, static_argnames, context)
