"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Multi-host bring-up (SURVEY §5.8 TPU plan: `jax.distributed.initialize`
    replaces the reference's torch.distributed env-var plumbing,
    `utils/misc.py:17-29`).

    On TPU pods with no arguments, JAX auto-discovers the topology; explicit
    (coordinator, N, id) supports CPU/GPU clusters. No-op (single process)
    when no distributed env is detectable. Returns (process_id, n_processes).
    """
    import os

    explicit = coordinator_address is not None
    env = any(k in os.environ for k in
              ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
               "SLURM_NTASKS"))
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    # Some images set TPU_WORKER_HOSTNAMES to a warning string; only treat
    # it as a cluster signal when it parses as a host list.
    env = env or ("," in hosts and " " not in hosts)
    if explicit or env:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except (ValueError, RuntimeError):
            pass  # misdetected single-process environment
    return jax.process_index(), jax.process_count()


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str] = ("data", "tile"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    `axis_sizes` may contain one −1 (inferred). On multi-host systems call
    `jax.distributed.initialize()` first; `jax.devices()` then spans hosts
    and the mesh lays the trailing axis over intra-host (ICI-adjacent)
    devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    sizes = list(axis_sizes)
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if len(devices) % known != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by {known}"
            )
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(axis_names[: len(sizes)]))
