"""Small MLPs for implicit fields (replaces tcnn FullyFusedMLP + VanillaMLP).

Capability parity with `tetgs_spatial/models/networks.py:109-196` (VanillaMLP
with optional sphere initialization for SDF outputs). The networks are tiny
(1 hidden layer × 64 wide in the reference SDF config) — plain jnp matmuls
compile to single fused MXU ops; no custom kernel is warranted.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax import Array


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    dim_in: int = 32
    dim_out: int = 1
    n_neurons: int = 64
    n_hidden_layers: int = 1
    # Geometric (sphere) init for SDF heads: output ≈ ‖x‖ − radius at start.
    sphere_init: bool = False
    sphere_init_radius: float = 0.5
    sphere_init_inside_out: bool = False
    weight_norm: bool = False  # kept for config parity; applied at init only


Params = List[Dict[str, Array]]


def init_mlp_params(key: jax.Array, cfg: MLPConfig) -> Params:
    """Initialize layer list [{'w': (din, dout), 'b': (dout,)}...]."""
    dims = [cfg.dim_in] + [cfg.n_neurons] * cfg.n_hidden_layers + [cfg.dim_out]
    params: Params = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        is_last = i == len(dims) - 2
        is_first = i == 0
        if cfg.sphere_init:
            # Geometric initialization (SAL/IGR-style, mirrors
            # `networks.py:166-196`): hidden layers ~ N(0, sqrt(2/dout)),
            # last layer ~ N(sqrt(pi/din), tiny) with bias −radius.
            if is_last:
                sign = -1.0 if cfg.sphere_init_inside_out else 1.0
                mean = sign * jnp.sqrt(jnp.pi) / jnp.sqrt(jnp.float32(din))
                w = mean + 1e-4 * jax.random.normal(keys[i], (din, dout))
                b = jnp.full((dout,), -sign * cfg.sphere_init_radius)
            else:
                w = jax.random.normal(keys[i], (din, dout)) * jnp.sqrt(
                    2.0 / dout
                )
                if is_first:
                    # Positions enter in the first 3 dims; zero the rest so
                    # the initial field is a function of position only.
                    mask = jnp.zeros((din, 1)).at[:3].set(1.0)
                    w = w * mask
                b = jnp.zeros((dout,))
        else:
            scale = jnp.sqrt(2.0 / (din + dout))
            w = jax.random.normal(keys[i], (din, dout)) * scale
            b = jnp.zeros((dout,))
        params.append({"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)})
    return params


def mlp_apply(params: Params, x: Array, activation: str = "relu") -> Array:
    """Forward pass; hidden activation relu (reference default), linear out."""
    act = {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "softplus": jax.nn.softplus}[
        activation
    ]
    h = x
    for i, layer in enumerate(params):
        h = h @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            h = act(h)
    return h
