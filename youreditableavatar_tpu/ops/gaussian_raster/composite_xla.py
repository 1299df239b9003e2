"""Pure-XLA tile compositing (CPU-runnable reference backend, autodiff-capable).

Implements the exact sequential semantics of the CUDA `renderCUDA` loop
(`forward.cu:261-374`) in vectorized mask form, chunked over each tile's
depth-sorted pair list with a `lax.scan`:

  per gaussian i (depth order), per pixel:
    alpha  = min(0.99, opacity · exp(power));   skip if power > 0 or alpha < 1/255
    test_T = T · (1 − alpha)
    if test_T < 1e-4: pixel is permanently done (no contribution from i onward)
    else: C += color · alpha · T;  T = test_T

The per-chunk vectorization uses cumprod for the transmittance prefix and
cumsum over the "trigger" events for the permanent done flag — proven
equivalent to the sequential loop because a trigger at index k excludes all
i ≥ k. Gradients come from JAX autodiff and match the analytic CUDA backward
(`backward.cu:400-641`) semantics: masks and clamps are treated as constants.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4

# Field-row layout of the pre-gathered pair data (NUM_FIELDS × CAP per tile).
F_MX, F_MY, F_CA, F_CB, F_CC, F_OPAC, F_R, F_G, F_B = range(9)
NUM_FIELDS = 16  # padded to a VMEM-friendly sublane count


def tile_pixel_coords(
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int,
    tile_ids: Array | None = None,
) -> Tuple[Array, Array]:
    """Per-tile flattened pixel coordinates.

    Returns (px, py), each (T, PIX) float32, flat index p → (x, y) =
    (p % tile_size, p // tile_size) offset by the tile origin. `tile_ids`
    restricts to a subset (the tile-sharded path computes only its shard).
    """
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles_x * num_tiles_y, dtype=jnp.int32)
    t = tile_ids
    base_x = (t % num_tiles_x) * tile_size
    base_y = (t // num_tiles_x) * tile_size
    p = jnp.arange(tile_size * tile_size, dtype=jnp.int32)
    px = base_x[:, None] + p[None, :] % tile_size
    py = base_y[:, None] + p[None, :] // tile_size
    return px.astype(jnp.float32), py.astype(jnp.float32)


def gather_pair_data(
    mean2d: Array,
    conic: Array,
    color: Array,
    opacity: Array,
    pair_gauss: Array,
    tile_start: Array,
    tile_count: Array,
    capacity: int,
) -> Array:
    """Gather per-pair fields into the dense (T, NUM_FIELDS, CAP) layout.

    Invalid slots (beyond a tile's count) are zeroed, which makes them inert in
    compositing (alpha = 0 < 1/255 → skipped). Differentiable: the backward of
    this gather is the scatter-add that accumulates per-pair gradients onto
    Gaussians (replacing the CUDA backward's atomicAdd).
    """
    num_pairs = pair_gauss.shape[0]
    slots = tile_start[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
    valid = jnp.arange(capacity, dtype=jnp.int32)[None, :] < tile_count[:, None]
    slots = jnp.clip(slots, 0, num_pairs - 1)
    gi = pair_gauss[slots]  # (T, CAP)

    fields = jnp.stack(
        [
            mean2d[gi, 0],
            mean2d[gi, 1],
            conic[gi, 0],
            conic[gi, 1],
            conic[gi, 2],
            opacity[gi],
            color[gi, 0],
            color[gi, 1],
            color[gi, 2],
        ],
        axis=1,
    )  # (T, 9, CAP)
    fields = jnp.where(valid[:, None, :], fields, 0.0)
    pad = jnp.zeros(
        (fields.shape[0], NUM_FIELDS - fields.shape[1], capacity), fields.dtype
    )
    return jnp.concatenate([fields, pad], axis=1)


def composite_tiles_xla(
    pair_data: Array,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int,
    chunk: int = 32,
    tile_ids: Array | None = None,
) -> Tuple[Array, Array]:
    """Front-to-back alpha compositing over all tiles.

    Args:
      pair_data: (T, NUM_FIELDS, CAP) gathered pair fields, depth-ordered.
      chunk: gaussians processed per scan step.
      tile_ids: optional (T,) global tile indices when pair_data covers a
        shard of the screen (tile-axis parallelism).
    Returns:
      rgb: (T, 3, PIX) accumulated color (no background).
      final_t: (T, PIX) final transmittance.
      n_contrib: (T, PIX) int32 count of gaussians that actually contributed
        (passed the α test) per pixel. NOTE: the reference's diagnostic
        (forward.cu:330-371) stores last_contributor — the 1-based rank of
        the last contributor *including* α-skipped pairs in the prefix — so
        the two diverge whenever a prefix pair fails the α test. Ours is a
        contributor count, not a rank; diagnostic-only (stop-gradient).
    """
    num_t, _, cap = pair_data.shape
    if cap % chunk != 0:
        raise ValueError(f"capacity {cap} must be divisible by chunk {chunk}")
    pix = tile_size * tile_size
    px, py = tile_pixel_coords(
        num_tiles_x, num_tiles_y, tile_size, tile_ids
    )  # (T, PIX)

    def step(carry, fields_c):
        # fields_c: (T, NUM_FIELDS, chunk); carry: (T_trans, done, rgb, cnt)
        t_in, done, rgb, cnt = carry
        mx = fields_c[:, F_MX, :, None]
        my = fields_c[:, F_MY, :, None]
        ca = fields_c[:, F_CA, :, None]
        cb = fields_c[:, F_CB, :, None]
        cc = fields_c[:, F_CC, :, None]
        op = fields_c[:, F_OPAC, :, None]
        col = fields_c[:, (F_R, F_G, F_B), :]  # (T, 3, chunk)

        dx = px[:, None, :] - mx  # (T, chunk, PIX)
        dy = py[:, None, :] - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP, op * jnp.exp(power))
        ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(ok, alpha, 0.0)

        one_m = 1.0 - a
        cp = jnp.cumprod(one_m, axis=1)  # prefix ∏(1-a) incl. i
        t_after = t_in[:, None, :] * cp
        t_before = t_in[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1
        )

        trigger = (a > 0.0) & (t_after < T_EPS)
        csum = jnp.cumsum(trigger.astype(jnp.int32), axis=1)
        contrib = (a > 0.0) & (~done[:, None, :]) & (csum == 0)

        w = jnp.where(contrib, a * t_before, 0.0)  # (T, chunk, PIX)
        # HIGHEST: on TPU the default matmul precision feeds the MXU bf16
        # inputs — a ~1e-3 relative error on every composited pixel that
        # breaks parity with the (full-f32) Pallas and CUDA kernels.
        rgb = rgb + jnp.einsum(
            "tck,tkp->tcp", col, w, precision=jax.lax.Precision.HIGHEST
        )
        t_out = t_in * jnp.prod(jnp.where(contrib, one_m, 1.0), axis=1)
        cnt = cnt + jnp.sum(contrib.astype(jnp.int32), axis=1)
        done = done | jnp.any(trigger & ~done[:, None, :], axis=1)
        return (t_out, done, rgb, cnt), None

    t0 = jnp.ones((num_t, pix), jnp.float32)
    done0 = jnp.zeros((num_t, pix), bool)
    rgb0 = jnp.zeros((num_t, 3, pix), jnp.float32)
    cnt0 = jnp.zeros((num_t, pix), jnp.int32)
    chunks = pair_data.reshape(num_t, NUM_FIELDS, cap // chunk, chunk)
    chunks = jnp.moveaxis(chunks, 2, 0)  # (S, T, NUM_FIELDS, chunk)
    # Remat each step: without it autodiff saves the (T, chunk, PIX)
    # intermediates of every scan step (~chunk× the carry size), which blows
    # past HBM at realistic tile capacities; with it only the (T, PIX)
    # carries are stored and the step recomputes in the backward pass.
    (t_final, _, rgb, cnt), _ = jax.lax.scan(
        jax.checkpoint(step), (t0, done0, rgb0, cnt0), chunks
    )
    return rgb, t_final, cnt


def assemble_image(
    rgb_tiles: Array,
    t_tiles: Array,
    num_tiles_x: int,
    num_tiles_y: int,
    tile_size: int,
    width: int,
    height: int,
) -> Tuple[Array, Array]:
    """(T, 3, PIX) tiles → (H, W, 3) image + (H, W) transmittance."""
    ts = tile_size
    rgb = rgb_tiles.reshape(num_tiles_y, num_tiles_x, 3, ts, ts)
    rgb = jnp.transpose(rgb, (0, 3, 1, 4, 2)).reshape(
        num_tiles_y * ts, num_tiles_x * ts, 3
    )
    t = t_tiles.reshape(num_tiles_y, num_tiles_x, ts, ts)
    t = jnp.transpose(t, (0, 2, 1, 3)).reshape(num_tiles_y * ts, num_tiles_x * ts)
    return rgb[:height, :width], t[:height, :width]
