"""Per-parameter-group Adam with the 3DGS exponential position schedule.

Capability parity with `tetgs_scene/tetgs_optimizer.py:9-200` and
`get_expon_lr_func` (`utils/general_utils.py:25-57`), built on optax:
each `TetGSParams` leaf gets its own learning rate (positions ×
spatial_lr_scale with log-lerp decay + delay warmup, sh_rest at
feature_lr / 20, etc.) via `optax.multi_transform` keyed by leaf name.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from youreditableavatar_tpu.models.tetgs import TetGSParams


@dataclasses.dataclass(frozen=True)
class OptimizationParams:
    """(`tetgs_optimizer.py:9-44`) defaults."""

    iterations: int = 15_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """3DGS log-lerp schedule (`general_utils.py:25-57`)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
        )
        return delay * log_lerp

    return schedule


def make_tetgs_optimizer(
    opt: OptimizationParams,
    spatial_lr_scale: float,
    adam_eps: float = 1e-15,
    train_mask: Any | None = None,
) -> optax.GradientTransformation:
    """Optimizer over a `TetGSParams` pytree.

    Args:
      spatial_lr_scale: camera spatial extent (scales the position lr, as in
        `TetGSOptimizer.__init__`).
      train_mask: optional TetGSParams of booleans — False leaves get zero
        updates (EditTetGS freezes the keep part this way).
    """
    pos_sched = expon_lr_schedule(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )

    def adam(lr) -> optax.GradientTransformation:
        return optax.adam(lr, eps=adam_eps)

    transforms = {
        "delta": adam(pos_sched),
        "log_scales": adam(opt.scaling_lr),
        "quats": adam(opt.rotation_lr),
        "opacity_raw": adam(opt.opacity_lr),
        "sh_dc": adam(opt.feature_lr),
        "sh_rest": adam(opt.feature_lr / 20.0),
    }
    labels = TetGSParams(
        delta="delta",
        log_scales="log_scales",
        quats="quats",
        opacity_raw="opacity_raw",
        sh_dc="sh_dc",
        sh_rest="sh_rest",
    )
    tx = optax.multi_transform(transforms, labels)
    if train_mask is not None:
        inv = jax.tree_util.tree_map(lambda m: not m, train_mask)
        tx = optax.chain(optax.masked(optax.set_to_zero(), inv), tx)
    return tx
