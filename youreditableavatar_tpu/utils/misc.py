"""Small shared helpers (PRNG threading, dtype policy, host/device utilities).

The reference's `utils/misc.py` rank/broadcast machinery
(`misc.py:17-29,104-120`) has no TPU analog by design: JAX initialization is
replicated-by-construction from explicit PRNG keys, so instead of a post-init
``broadcast(params, src=0)`` we provide :func:`assert_replicated` as the
invariant check.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def apply_platform_env() -> None:
    """Make JAX honor the JAX_PLATFORMS env var even when a site hook has
    force-registered another backend (some images pin a remote TPU plugin
    that overrides env-based platform selection). CLI entry points call
    this right after parsing args so `JAX_PLATFORMS=cpu tool ...` works."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)


def key_seq(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite iterator of fresh PRNG subkeys."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def tree_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def assert_replicated(tree: Any, atol: float = 0.0) -> None:
    """Check that a pytree of (possibly sharded) arrays holds identical data on
    every device that has a full copy. Replaces the reference's post-init
    ``broadcast`` (`implicit_sdf.py:255-257`) with an invariant assertion."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if not isinstance(leaf, jax.Array):
            continue
        shards = [s for s in leaf.addressable_shards if s.replica_id is not None]
        if len(shards) < 2:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if s.index != shards[0].index:
                continue
            got = np.asarray(s.data)
            if not np.allclose(ref, got, atol=atol, rtol=0.0):
                raise AssertionError("pytree is not replicated across devices")


@contextlib.contextmanager
def timed(label: str, sink: Optional[Dict[str, float]] = None):
    """Wall-clock timer that blocks on async dispatch at exit."""
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = dt


def dtype_of(x: Any) -> Any:
    return jnp.asarray(x).dtype


def scaled_dot_bf16(a: jax.Array, b: jax.Array) -> jax.Array:
    """bf16-input matmul with f32 accumulation — the MXU-native contraction."""
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def cleanup() -> None:
    """Free cached compilations + host garbage between pipeline stages.

    Role of the reference's `cleanup()` (`utils/misc.py:94-101`: gc +
    `torch.cuda.empty_cache` + tcnn context free). In JAX, device buffers
    free with their last reference, so gc plus dropping the compilation
    caches is the whole story; live arrays are untouched.
    """
    import gc

    gc.collect()
    jax.clear_caches()
