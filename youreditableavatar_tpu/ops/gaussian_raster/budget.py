"""Pair-budget sizing + overflow governance.

The CUDA reference sizes its pair buffers *exactly* at runtime: an
InclusiveSum over tiles_touched yields num_rendered, and the pair arrays are
allocated to that size per render (`rasterizer_impl.cu:277-303`) — it can
never overflow. XLA requires static shapes, so the TPU design instead uses a
static `pair_budget` with:

  (a) an exact COUNT PRE-PASS (`count_pairs`) to size the budget before the
      step function is compiled — same arithmetic as the reference's
      InclusiveSum, one cheap preprocess-only dispatch;
  (b) BUCKETED growth (`fit_pair_budget`) so a changing scene triggers at
      most O(log) recompiles over a run; and
  (c) a runtime governor (`BudgetGovernor`) that trainers feed the
      `num_pairs` / `num_tile_overflow` diagnostics every logging interval,
      growing the budget (or failing loudly) instead of silently truncating.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Optional

import jax.numpy as jnp


class PairOverflowError(RuntimeError):
    """A render exceeded its static pair budget (or tile capacity)."""


def count_pairs(
    means3d, scales, quats, opacities, sh, camera, cfg
) -> jnp.ndarray:
    """Exact (gaussian, tile) pair total for a scene+camera: () int32.

    Equals `render_gaussians(...)["num_pairs"]` (binning's pre-cull total,
    the analogue of the reference's num_rendered) but runs ONLY the
    projection/preprocess pass — no binning, sort, or compositing — so it is
    cheap enough to run over a camera sample before compiling train steps.
    """
    from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
        preprocess_gaussians,
    )

    proj = preprocess_gaussians(
        means3d, scales, quats, opacities,
        sh if sh is not None else jnp.zeros((means3d.shape[0], 1, 3)),
        camera, cfg.sh_degree, cfg.tile_size, cfg.scale_mod, None,
        rect_mode=cfg.rect_mode,
    )
    return jnp.sum(proj.tiles_touched)


def fit_pair_budget(
    n_pairs: int,
    headroom: float = 1.2,
    min_budget: int = 1 << 12,
    max_budget: int = 1 << 24,
    align: int = 128,
) -> int:
    """Smallest bucket ≥ n_pairs·headroom.

    Buckets are the geometric ladder {2^k, 1.5·2^k} (×1.5 / ×4/3 alternating
    steps), so repeated growth across a whole run recompiles at most twice
    per octave; the result is rounded up to an `align` multiple for the
    chunk-aligned Pallas pair layout.
    """
    need = max(int(float(n_pairs) * headroom), min_budget)
    if need > max_budget:
        raise PairOverflowError(
            f"required pair budget {need} exceeds max_budget {max_budget}"
        )
    b = min_budget
    while b < need:
        # power of two → ×3/2; 3·2^j → ×4/3 (both exact in int)
        b = b * 3 // 2 if (b & (b - 1)) == 0 else b * 4 // 3
    return -(-b // align) * align


@dataclasses.dataclass
class BudgetGovernor:
    """Watches render diagnostics; grows budgets or fails loudly.

    Policies (`overflow_policy` in the stage configs):
      "grow"  — return an updated config with the next-bucket pair budget
                (and doubled tile_capacity on tile overflow); the trainer
                rebuilds its jitted steps. Default.
      "raise" — raise PairOverflowError (production hard-fail).
      "warn"  — emit a warning once per growth event, keep going (the
                render IS wrong; use only for throwaway previews).
    """

    policy: str = "grow"
    headroom: float = 1.2
    max_budget: int = 1 << 24
    name: str = "raster"
    events: list = dataclasses.field(default_factory=list)

    def check(
        self,
        cfg: Any,
        num_pairs: int,
        num_tile_overflow: int = 0,
        step: Optional[int] = None,
    ) -> Optional[Any]:
        """Inspect one render's diagnostics against its config.

        Returns a replacement config (same dataclass, larger budgets) when
        regrowth is needed under policy="grow", else None.
        """
        num_pairs = int(num_pairs)
        num_tile_overflow = int(num_tile_overflow)
        pair_over = num_pairs > cfg.pair_budget
        if not pair_over and num_tile_overflow == 0:
            return None
        msg = (
            f"[{self.name}] overflow at step {step}: num_pairs={num_pairs} "
            f"(budget {cfg.pair_budget}), tile_overflow={num_tile_overflow} "
            f"(capacity {cfg.tile_capacity})"
        )
        self.events.append(
            {"step": step, "num_pairs": num_pairs,
             "pair_budget": cfg.pair_budget,
             "num_tile_overflow": num_tile_overflow,
             "tile_capacity": cfg.tile_capacity, "policy": self.policy}
        )
        if self.policy == "raise":
            raise PairOverflowError(msg)
        if self.policy == "warn":
            warnings.warn(msg + " — rendering truncated", RuntimeWarning)
            return None
        if self.policy != "grow":
            raise ValueError(f"unknown overflow policy {self.policy!r}")
        new_budget = cfg.pair_budget
        if pair_over:
            # canonical bucket ≥ headroom·num_pairs — strictly > the current
            # budget (num_pairs > budget), so growth always makes progress
            new_budget = fit_pair_budget(
                num_pairs, headroom=self.headroom,
                max_budget=self.max_budget,
            )
        new_capacity = cfg.tile_capacity * (2 if num_tile_overflow else 1)
        return dataclasses.replace(
            cfg, pair_budget=new_budget, tile_capacity=new_capacity
        )
