"""Shared graphics math (focal/fov, triangle metrics).

Capability parity with `Edit_core/utils/graphics_utils.py:39-136`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def triangle_area(a: Array, b: Array, c: Array) -> Array:
    """(N,) area of triangles."""
    return 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)


def circumcircle_radius(a: Array, b: Array, c: Array, eps: float = 1e-12) -> Array:
    """(N,) circumcircle radius (`graphics_utils.py:108-116`)."""
    la = jnp.linalg.norm(b - c, axis=-1)
    lb = jnp.linalg.norm(a - c, axis=-1)
    lc = jnp.linalg.norm(a - b, axis=-1)
    s = 0.5 * (la + lb + lc)
    k = jnp.sqrt(jnp.maximum(s * (s - la) * (s - lb) * (s - lc), eps))
    return la * lb * lc / (4.0 * k)


def inverse_sigmoid(x: Array) -> Array:
    return jnp.log(x / (1.0 - x))
