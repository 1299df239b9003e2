"""Segment/range helpers for static-budget expansion (TPU-friendly).

The recurring pattern in this framework: N producers each emit `counts[i]`
items; items live in a flat budgeted array at offsets `cumsum - counts`.
Mapping each flat slot back to its producer is `searchsorted`, but XLA lowers
searchsorted to a log-N scan loop that is very slow on TPU; an O(P) scatter of
the producer rank at each range start followed by a running max is far faster
and exactly equivalent.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array


def range_owner(counts: Array, budget: int) -> Tuple[Array, Array, Array]:
    """Owner index per flat slot for ranges laid out by cumsum(counts).

    Args:
      counts: (N,) int32 items per producer (≥ 0).
      budget: static flat-array size P.
    Returns:
      owner: (P,) int32 producer index per slot (clamped to a real producer;
        only meaningful where valid).
      local: (P,) int32 index of the slot within its producer's range.
      valid: (P,) bool slot < total items.
    """
    n = counts.shape[0]
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts

    slots = jnp.arange(budget, dtype=jnp.int32)
    has = counts > 0
    tgt = jnp.where(has & (offsets < budget), offsets, budget)
    marks = jnp.zeros((budget + 1,), jnp.int32).at[tgt].max(
        jnp.where(has, jnp.arange(n, dtype=jnp.int32) + 1, 0)
    )[:budget]
    owner = jnp.maximum(jax.lax.cummax(marks) - 1, 0)
    # Per-slot range start: marks is nonzero exactly at range starts (ids are
    # ≥ 1 there), so a running max over `slot where a range starts` recovers
    # the start slot — local comes out gather-free (the obvious
    # `offsets[owner]` is a 1-D gather with ~1e5 indices, which serializes on
    # TPU at ~8 ns/row, measured 1.5 ms at 512²/100k bench scale).
    range_start = jax.lax.cummax(jnp.where(marks > 0, slots, 0))
    local = slots - range_start
    valid = slots < total
    return owner, local, valid
