"""Implicit SDF field: hash-grid encoding + MLP head.

Capability parity with `tetgs_spatial/models/geometry/implicit_sdf.py:20-535`
(reference config: HashGrid 16 levels × 2 features, 2^19 table, base res 16,
growth 1.3819, progressive start level 8; 1-hidden-layer 64-wide ReLU MLP;
finite-difference normals with optional progressive eps; sphere sdf bias).
Functional JAX design: params are a pytree `{"grid": ..., "mlp": ...}`;
every method takes (params, points) explicitly so the same field code serves
the live and frozen ("prev_geometry") roles of the reference's dual-MLP
partition queries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.models.mlp import (
    MLPConfig,
    init_mlp_params,
    mlp_apply,
)
from youreditableavatar_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    init_hashgrid_params,
    progressive_level_mask,
)
from youreditableavatar_tpu.utils.registry import register


@dataclasses.dataclass(frozen=True)
class SDFFieldConfig:
    radius: float = 1.0  # bbox half-extent; points live in [-radius, radius]³
    grid: HashGridConfig = dataclasses.field(
        default_factory=lambda: HashGridConfig(
            n_levels=16,
            n_features_per_level=2,
            log2_hashmap_size=19,
            base_resolution=16,
            per_level_scale=1.381912879967776,
            progressive=True,
            start_level=8,
            start_step=0,
            update_steps=1000,
        )
    )
    n_neurons: int = 64
    n_hidden_layers: int = 1
    normal_type: str = "finite_difference"  # or "analytic"
    finite_difference_normal_eps: float = 0.01
    progressive_eps: bool = False  # Neuralangelo-style eps from active level
    sdf_bias: str | float = 0.0  # 0.0 or "sphere"
    sdf_bias_radius: float = 0.5


@register("implicit-sdf")
class SDFField:
    """Stateless field; all state in the params pytree."""

    def __init__(self, cfg: SDFFieldConfig = SDFFieldConfig()):
        self.cfg = cfg
        self.mlp_cfg = MLPConfig(
            dim_in=cfg.grid.out_dim,
            dim_out=1,
            n_neurons=cfg.n_neurons,
            n_hidden_layers=cfg.n_hidden_layers,
        )

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        return {
            "grid": init_hashgrid_params(k1, self.cfg.grid),
            "mlp": init_mlp_params(k2, self.mlp_cfg),
        }

    def contract(self, points: Array) -> Array:
        """[-radius, radius]³ → [0, 1]³ (`contract_to_unisphere` bounded
        branch, `geometry/base.py:496-527`)."""
        r = self.cfg.radius
        return jnp.clip((points + r) / (2 * r), 0.0, 1.0)

    def level_mask(self, global_step: int | Array) -> Array:
        return progressive_level_mask(self.cfg.grid, global_step)

    def forward_sdf(
        self,
        params: Dict[str, Any],
        points: Array,
        level_mask: Optional[Array] = None,
        n_active: Optional[int] = None,
    ) -> Array:
        """(N, 3) → (N,) signed distance.

        `n_active` (STATIC) skips masked progressive levels entirely —
        trainers derive it host-side from the step (exact; see
        `hashgrid_encode`)."""
        x = self.contract(points)
        enc = hashgrid_encode(params["grid"], x, self.cfg.grid, level_mask,
                              n_active=n_active)
        sdf = mlp_apply(params["mlp"], enc)[..., 0]
        return sdf + self._bias(points)

    def _bias(self, points: Array) -> Array:
        if self.cfg.sdf_bias == "sphere":
            return (
                jnp.linalg.norm(points, axis=-1) - self.cfg.sdf_bias_radius
            )
        return jnp.asarray(float(self.cfg.sdf_bias))

    def fd_eps(self, global_step: int = 0) -> float:
        cfg = self.cfg
        if not cfg.progressive_eps:
            return cfg.finite_difference_normal_eps
        g = cfg.grid
        level = min(
            g.start_level
            + max(global_step - g.start_step, 0) // g.update_steps,
            g.n_levels,
        )
        grid_res = g.base_resolution * g.per_level_scale ** (level - 1)
        return 2 * cfg.radius / grid_res

    def forward_with_normal(
        self,
        params: Dict[str, Any],
        points: Array,
        level_mask: Optional[Array] = None,
        eps: Optional[float] = None,
    ) -> Tuple[Array, Array]:
        """(N, 3) → (sdf (N,), unit normal (N, 3)).

        Forward-difference normals (`implicit_sdf.py:417-425` semantics):
        grad_i = (sdf(p + eps·e_i) − sdf(p)) / eps.
        """
        if self.cfg.normal_type == "analytic":
            f = lambda p: self.forward_sdf(params, p[None], level_mask)[0]
            sdf, grads = jax.vmap(jax.value_and_grad(f))(points)
            n = grads / jnp.maximum(
                jnp.linalg.norm(grads, axis=-1, keepdims=True), 1e-12
            )
            return sdf, n

        e = self.cfg.finite_difference_normal_eps if eps is None else eps
        r = self.cfg.radius
        offsets = jnp.asarray(
            [[e, 0, 0], [0, e, 0], [0, 0, e]], jnp.float32
        )
        p_off = jnp.clip(points[:, None, :] + offsets[None], -r, r)
        all_pts = jnp.concatenate([points, p_off.reshape(-1, 3)])
        all_sdf = self.forward_sdf(params, all_pts, level_mask)
        n = points.shape[0]
        sdf = all_sdf[:n]
        sdf_off = all_sdf[n:].reshape(n, 3)
        grad = (sdf_off - sdf[:, None]) / e
        normal = grad / jnp.maximum(
            jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12
        )
        return sdf, normal

    def forward_sdf_chunked(
        self,
        params: Dict[str, Any],
        points: Array,
        chunk: int = 262144,
        level_mask: Optional[Array] = None,
        n_active: Optional[int] = None,
    ) -> Array:
        """Chunked field eval (`chunk_batch`, `utils/ops.py:112-180`): scan
        over fixed-size chunks to bound activation memory on big tet grids."""
        n = points.shape[0]
        if n <= chunk:
            return self.forward_sdf(params, points, level_mask, n_active)
        pad = (-n) % chunk
        pts = jnp.pad(points, ((0, pad), (0, 0)))
        blocks = pts.reshape(-1, chunk, 3)

        def body(_, block):
            return None, self.forward_sdf(params, block, level_mask,
                                          n_active)

        _, out = jax.lax.scan(body, None, blocks)
        return out.reshape(-1)[:n]
