"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


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
