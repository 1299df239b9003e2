"""Multiresolution hash-grid encoding (replaces tiny-cuda-nn's HashGrid).

The reference's SDF field is a tcnn `Encoding` with 16 levels × 2 features,
2^19 hashmap, base res 16, growth 1.447 (`implicit_sdf.py:26-41`,
`networks.py:55-64`) plus a `ProgressiveBandHashGrid` curriculum that unmasks
levels over training (`networks.py:67-106`).

TPU-native design (measured on v5e, `scripts/exp_r5_scatter.py`):

  * forward — XLA gathers over the (L, T, F) table run at ~5-6 ns/row,
    the TPU's scalar-pipeline floor for random row access; a Pallas serial
    gather loop is SLOWER (~11 ns/row, `exp_r3_gather.py`), so the forward
    stays XLA.
  * backward — XLA's scatter-add costs ~41 ns/row and dominated the
    stage-1 spatial step (SPATIAL_BENCH_r04 "bottleneck"). On TPU the
    custom VJP routes the table gradient through the Pallas
    scatter-accumulate kernel (`hashgrid_pallas.py`, ~7 ns/row: the level
    table accumulates in VMEM, one HBM write per level) — the tiny-cuda-nn
    atomicAdd-backward role (`networks.py:55-64`).
  * the point gradient (dx) is computed in plain XLA elementwise math from
    saved corner features; every production call site queries the field at
    CONSTANT lattice positions, so XLA dead-code-eliminates it.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

# Spatial hashing primes (instant-ngp convention; the first "prime" is 1 so
# axis 0 indexes linearly).
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.381912879967776
    # Progressive curriculum ON by default — reference parity: the SDF field
    # trains as a ProgressiveBandHashGrid with start_level 8
    # (`implicit_sdf.py:26-41`, `networks.py:67-106`).
    progressive: bool = True
    start_level: int = 8
    start_step: int = 0
    update_steps: int = 1000

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolutions(self) -> list[int]:
        return [
            int(self.base_resolution * self.per_level_scale**lvl)
            for lvl in range(self.n_levels)
        ]


def init_hashgrid_params(key: jax.Array, cfg: HashGridConfig) -> Array:
    """(L, T, F) feature table, U(-1e-4, 1e-4) like tcnn."""
    return jax.random.uniform(
        key,
        (cfg.n_levels, cfg.table_size, cfg.n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )


def _hash_corner(coords: Array, res: int, table_size: int) -> Array:
    """Integer corner coords (..., 3) → table index."""
    n_dense = (res + 1) ** 3
    if n_dense <= table_size:
        # Dense indexing when the level fits.
        idx = (
            coords[..., 0]
            + coords[..., 1] * (res + 1)
            + coords[..., 2] * (res + 1) ** 2
        )
    else:
        c = coords.astype(jnp.uint32)
        idx = (
            c[..., 0] * jnp.uint32(_PRIMES[0])
            ^ c[..., 1] * jnp.uint32(_PRIMES[1])
            ^ c[..., 2] * jnp.uint32(_PRIMES[2])
        )
        idx = (idx % jnp.uint32(table_size)).astype(jnp.int32)
    return idx


_OFFSETS = tuple(
    (i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)
)


def _level_corners(x: Array, res: int, table_size: int):
    """Per-level corner data: idx (N,8), per-axis weight factors
    wx/wy/wz (N,8), their ±1 signs (8,) and the in-range clip mask (N,3)."""
    offsets = jnp.asarray(_OFFSETS, jnp.int32)  # (8, 3)
    xs = x * res
    x0 = jnp.floor(xs).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, res - 1)
    w = xs - x0.astype(jnp.float32)  # (N, 3)
    corners = x0[:, None, :] + offsets[None, :, :]
    idx = _hash_corner(corners, res, table_size)
    wx = jnp.where(offsets[None, :, 0] == 1, w[:, None, 0],
                   1 - w[:, None, 0])
    wy = jnp.where(offsets[None, :, 1] == 1, w[:, None, 1],
                   1 - w[:, None, 1])
    wz = jnp.where(offsets[None, :, 2] == 1, w[:, None, 2],
                   1 - w[:, None, 2])
    return idx, wx, wy, wz


def _encode_xla(
    params: Array,
    x: Array,
    cfg: HashGridConfig,
    level_mask: Optional[Array],
    want_residuals: bool = False,
    n_active: Optional[int] = None,
):
    """XLA path; optionally returns per-level corner features (residuals
    for the custom backward).

    `n_active` (STATIC) computes only the first n levels — exact under the
    progressive curriculum, whose mask zeroes the rest anyway (masked
    features are 0 and masked tables get exactly-zero gradients either
    way); the remaining features are zero-filled."""
    la = cfg.n_levels if n_active is None else n_active
    x = jnp.clip(x, 0.0, 1.0)
    feats = []
    cfs = []
    for lvl, res in enumerate(cfg.level_resolutions()[:la]):
        idx, wx, wy, wz = _level_corners(x, res, cfg.table_size)
        cf = params[lvl][idx]  # (N, 8, F)
        weight = wx * wy * wz  # (N, 8)
        feats.append(jnp.sum(cf * weight[..., None], axis=1))  # (N, F)
        if want_residuals:
            cfs.append(cf)
    out = jnp.stack(feats, axis=1)  # (N, la, F)
    if level_mask is not None:
        out = out * level_mask[None, :la, None]
    if la < cfg.n_levels:
        out = jnp.pad(out, ((0, 0), (0, cfg.n_levels - la), (0, 0)))
    out = out.reshape(x.shape[0], cfg.out_dim)
    if want_residuals:
        return out, jnp.stack(cfs)  # (la, N, 8, F)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _encode_tpu(cfg: HashGridConfig, n_active, params, x, level_mask):
    return _encode_xla(params, x, cfg, level_mask, n_active=n_active)


def _encode_tpu_fwd(cfg, n_active, params, x, level_mask):
    out, cf = _encode_xla(
        params, x, cfg, level_mask, want_residuals=True, n_active=n_active
    )
    return out, (x, cf, level_mask)


def _encode_tpu_bwd(cfg, n_active, residuals, g):
    """Table grad via the Pallas scatter kernel; point grad in XLA.

    level_mask gets a zero cotangent (it is a step-derived curriculum
    constant, never optimized — `networks.py:97-106`).
    """
    from youreditableavatar_tpu.ops.hashgrid_pallas import hash_scatter_add

    x, cf, level_mask = residuals
    la = cfg.n_levels if n_active is None else n_active
    n = x.shape[0]
    xc = jnp.clip(x, 0.0, 1.0)
    g3 = g.reshape(n, cfg.n_levels, cfg.n_features_per_level)[:, :la]
    g3 = g3 * level_mask[None, :la, None]

    sgn = jnp.asarray(_OFFSETS, jnp.float32) * 2.0 - 1.0  # (8, 3) ±1
    in_rng = ((x > 0.0) & (x < 1.0)).astype(jnp.float32)  # clip grad mask

    idx_all, v0_all, v1_all = [], [], []
    dx = jnp.zeros_like(x)
    for lvl, res in enumerate(cfg.level_resolutions()[:la]):
        idx, wx, wy, wz = _level_corners(xc, res, cfg.table_size)
        weight = wx * wy * wz
        gl = g3[:, lvl, :]  # (N, F)
        v = weight[..., None] * gl[:, None, :]  # (N, 8, F)
        idx_all.append(idx.reshape(-1))
        v0_all.append(v[..., 0].reshape(-1))
        v1_all.append(v[..., 1].reshape(-1))
        # dx: d(weight)/dxs_a = sgn_a * (other two factors); dxs/dx = res.
        gdotcf = jnp.sum(cf[lvl] * gl[:, None, :], axis=-1)  # (N, 8)
        dxs = jnp.stack(
            [
                jnp.sum(gdotcf * sgn[None, :, 0] * wy * wz, axis=1),
                jnp.sum(gdotcf * sgn[None, :, 1] * wx * wz, axis=1),
                jnp.sum(gdotcf * sgn[None, :, 2] * wx * wy, axis=1),
            ],
            axis=-1,
        )  # (N, 3)
        dx = dx + dxs * res
    dx = dx * in_rng

    dparams = hash_scatter_add(
        jnp.stack(idx_all),
        jnp.stack(v0_all),
        jnp.stack(v1_all),
        cfg.table_size,
    )
    if la < cfg.n_levels:
        dparams = jnp.pad(
            dparams, ((0, cfg.n_levels - la), (0, 0), (0, 0))
        )
    return dparams, dx, jnp.zeros_like(level_mask)


_encode_tpu.defvjp(_encode_tpu_fwd, _encode_tpu_bwd)


def _default_backend() -> str:
    env = os.environ.get("YEA_HASHGRID_BACKEND", "")
    if env:
        return env
    return (
        "pallas"
        if jax.default_backend() in ("tpu", "axon")
        else "xla"
    )


def hashgrid_encode(
    params: Array,
    x: Array,
    cfg: HashGridConfig,
    level_mask: Optional[Array] = None,
    backend: Optional[str] = None,
    n_active: Optional[int] = None,
) -> Array:
    """Encode positions with the multiresolution hash grid.

    Args:
      params: (L, T, F) table.
      x: (N, 3) positions in [0, 1]³ (callers contract to this range).
      cfg: static config.
      level_mask: optional (L,) float mask for the progressive curriculum.
      backend: "pallas" (TPU custom-VJP scatter kernel), "xla", or None
        for auto (pallas on TPU, xla elsewhere; override with
        YEA_HASHGRID_BACKEND).
      n_active: STATIC count of progressive levels to actually compute
        (trainers derive it host-side from the step; exact — masked
        levels produce zero features and zero table grads either way,
        this just skips their gather/scatter work).
    Returns:
      (N, L*F) features.
    """
    be = backend or _default_backend()
    if (
        be == "pallas"
        and cfg.n_features_per_level == 2
        and cfg.table_size % 64 == 0
    ):
        mask = (
            level_mask
            if level_mask is not None
            else jnp.ones((cfg.n_levels,), jnp.float32)
        )
        return _encode_tpu(cfg, n_active, params, x, mask)
    return _encode_xla(params, x, cfg, level_mask, n_active=n_active)


def progressive_level_mask(cfg: HashGridConfig, global_step: int | Array) -> Array:
    """(L,) 0/1 mask for the level curriculum (`networks.py:97-106`)."""
    if not cfg.progressive:
        return jnp.ones((cfg.n_levels,), jnp.float32)
    step = jnp.asarray(global_step)
    current = jnp.minimum(
        cfg.start_level
        + jnp.maximum(step - cfg.start_step, 0) // cfg.update_steps,
        cfg.n_levels,
    )
    return (jnp.arange(cfg.n_levels) < current).astype(jnp.float32)
