"""Name → optax optimizer / schedule parsing.

The config-string dispatch of the reference's `systems/utils.py:35-86`
(`parse_optimizer` / `parse_scheduler` over torch.optim names) re-targeted
at optax: the stage configs name the optimizer ("AdamW",
`geometry-edit.yaml:68-73`) and the trainer builds it by name.
"""

from __future__ import annotations

from typing import Tuple

import optax


def parse_optimizer(
    name: str,
    lr: float,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    key = name.lower().replace("_", "")
    if key in ("adam",):
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if key in ("adamw",):
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    if key in ("sgd",):
        return optax.sgd(lr)
    if key in ("adagrad",):
        return optax.adagrad(lr, eps=eps)
    if key in ("rmsprop",):
        return optax.rmsprop(lr, eps=eps)
    if key in ("lion",):
        return optax.lion(lr, b1=betas[0], b2=betas[1])
    raise ValueError(f"unknown optimizer {name!r}")


def parse_scheduler(name: str, lr: float, max_steps: int,
                    final_factor: float = 0.01) -> optax.Schedule:
    key = name.lower()
    if key in ("constant", "none"):
        return optax.constant_schedule(lr)
    if key in ("exponential", "exp"):
        return optax.exponential_decay(
            lr, max_steps, final_factor, staircase=False)
    if key in ("cosine",):
        return optax.cosine_decay_schedule(lr, max_steps,
                                           alpha=final_factor)
    if key in ("linear",):
        return optax.linear_schedule(lr, lr * final_factor, max_steps)
    raise ValueError(f"unknown scheduler {name!r}")
