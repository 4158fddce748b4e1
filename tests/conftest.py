"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this conftest is imported by
pytest before any test module imports jax.
"""

import os
import sys

# Force CPU: the ambient environment points JAX at the tunneled TPU
# (JAX_PLATFORMS=axon registered by /root/.axon_site/sitecustomize, which
# imports jax at interpreter start — before any conftest runs). Tests must
# run on the local virtual-device CPU backend, and the remote-compile relay
# must stay out of the path entirely (it serializes processes and can
# wedge). The only reliable fix is to re-exec pytest once with a scrubbed
# environment.
# sitecustomize has already imported jax (but not initialized backends), so
# switching the platform via jax.config still works — and is the only thing
# that does (env vars are read at jax import).
os.environ["JAX_PLATFORMS"] = "cpu"

# persistent compilation cache: XLA compiles are slow on this 2-vCPU host,
# and the suite re-compiles the same programs every run otherwise
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache_cpu"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
