"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must set XLA flags before jax initializes (hence module-level, before any
jax import in the test session).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image pins axon (TPU); tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The image's sitecustomize force-registers the remote 'axon' TPU backend and
# overrides platform selection; pin back to CPU after the fact (env alone is
# not enough once register() has run).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU LLVM compiles dominate test wall-time
# otherwise (every un-jitted jnp call compiles a fresh executable).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
