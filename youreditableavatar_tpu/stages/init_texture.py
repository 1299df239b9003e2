"""Stage 2 — initial texture: fit bound-Gaussian appearance to real frames.

Capability parity with `tetgs_texture/refine.py:23-427` (`TetGS_Init`):
load the exported init mesh, transform tet→COLMAP frame, seed vertex colors
from the SfM cloud, bind Gaussians, then run the photometric fit
(l1 + D-SSIM at λ=0.2 + scaling regularizer) over the training cameras with
the 3DGS Adam groups, raising the active SH degree every
`sh_warmup_every` iterations (`refine.py:359-361`). Validation renders the
3-ring probe views used downstream for segmentation (`refine.py:377-427`).

TPU design: all camera intrinsics/poses/frames are stacked device arrays; the
jitted step gathers its view by index, so one compilation serves every camera
(one recompile per SH-degree bump). Views can be sharded over a device mesh
(see `parallel/`).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from youreditableavatar_tpu.models.cameras import GSCamera
from youreditableavatar_tpu.models.optimizer import (
    OptimizationParams,
    expon_lr_schedule,
    make_tetgs_optimizer,
)
from youreditableavatar_tpu.models.tetgs import (
    TetGSBinding,
    TetGSParams,
    gaussian_arrays,
    scaling_regularizer,
)
from youreditableavatar_tpu.ops.gaussian_raster import (
    BudgetGovernor,
    RasterCamera,
    RasterizeConfig,
    count_pairs,
    fit_pair_budget,
    render_gaussians,
)
from youreditableavatar_tpu.ops.image_losses import l1_dssim
from youreditableavatar_tpu.utils.registry import register


@dataclasses.dataclass(frozen=True)
class InitTextureConfig:
    num_iterations: int = 4000
    dssim_factor: float = 0.2
    sh_warmup_every: int = 1000
    scaling_reg: bool = True
    scaling_reg_weight: float = 1.0
    log_every: int = 100
    white_background: bool = True
    # Pair-budget governance (see ops.gaussian_raster.budget): size the
    # static budget from an exact count pre-pass at init, and grow/raise on
    # runtime overflow instead of silently truncating renders.
    auto_size_budget: bool = True
    overflow_policy: str = "grow"  # "grow" | "raise" | "warn"
    raster: RasterizeConfig = dataclasses.field(
        default_factory=lambda: RasterizeConfig()
    )
    opt: OptimizationParams = dataclasses.field(
        default_factory=lambda: OptimizationParams()
    )


class CameraStack:
    """Stacked device-side cameras + frames (uniform resolution)."""

    def __init__(self, cameras: Sequence[GSCamera], with_images: bool = True):
        if not cameras:
            raise ValueError("no cameras")
        w, h = cameras[0].width, cameras[0].height
        for c in cameras:
            if (c.width, c.height) != (w, h):
                raise ValueError("cameras must share a resolution on-device")
        self.width, self.height = w, h
        self.viewmats = jnp.asarray(
            np.stack([c.viewmat for c in cameras]), jnp.float32
        )
        self.fx = jnp.asarray([c.fx for c in cameras], jnp.float32)
        self.fy = jnp.asarray([c.fy for c in cameras], jnp.float32)
        self.cx = jnp.asarray([c.cx for c in cameras], jnp.float32)
        self.cy = jnp.asarray([c.cy for c in cameras], jnp.float32)
        self.images: Optional[Array] = None
        if with_images and cameras[0].image is not None:
            self.images = jnp.asarray(
                np.stack([c.image for c in cameras]), jnp.float32
            )
        self.n = len(cameras)

    def camera(self, idx: Array) -> RasterCamera:
        return RasterCamera(
            viewmat=self.viewmats[idx],
            fx=self.fx[idx], fy=self.fy[idx],
            cx=self.cx[idx], cy=self.cy[idx],
            width=self.width, height=self.height,
        )

    def spatial_extent(self) -> float:
        centers = np.asarray(
            [-(np.asarray(v)[:3, :3].T @ np.asarray(v)[:3, 3])
             for v in self.viewmats]
        )
        center = centers.mean(0)
        return float(np.linalg.norm(centers - center, axis=-1).max())


def auto_size_raster_config(
    gaussians: Tuple[Array, Array, Array, Array, Optional[Array]],
    stack: "CameraStack",
    rcfg: RasterizeConfig,
    sample: int = 8,
    headroom: float = 1.3,
) -> RasterizeConfig:
    """Exact-count pre-pass over a view sample → bucketed budgets.

    Replaces hard-coded budgets with the reference's runtime-exact sizing
    (`rasterizer_impl.cu:277-303` InclusiveSum → num_rendered), adapted to
    XLA static shapes: count pairs AND the max per-tile pair count on
    ≤`sample` evenly-spaced views, take the max, and pick the next budget
    buckets with headroom (scales grow during fitting; the runtime
    BudgetGovernor catches any residual overflow).

    `gaussians` = (means, scales, quats, opacities, sh) — e.g. the output
    of `gaussian_arrays` / `full_gaussian_arrays(...)[:5]`.
    """
    from youreditableavatar_tpu.ops.gaussian_raster.binning import (
        bin_gaussians,
    )
    from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
        preprocess_gaussians,
    )

    means, scales, quats, opac, _ = gaussians
    # Color never affects tile counts — count with a degree-0 stub SH so the
    # pre-pass is independent of the caller's SH layout.
    sh = jnp.zeros((means.shape[0], 1, 3))
    rcfg0 = dataclasses.replace(rcfg, sh_degree=0)
    fn = jax.jit(
        lambda i: count_pairs(
            means, scales, quats, opac, sh, stack.camera(i), rcfg0
        )
    )
    idxs = np.unique(
        np.linspace(0, stack.n - 1, min(stack.n, sample)).astype(np.int32)
    )
    mx = max(int(fn(jnp.asarray(i, jnp.int32))) for i in idxs)
    budget = fit_pair_budget(mx, headroom=headroom)

    # Per-tile capacity (xla backend's depth cap): one binning pass per
    # sample view at the fitted budget gives the exact max tile depth.
    ts = rcfg.tile_size
    ntx = -(-stack.width // ts)
    nty = -(-stack.height // ts)

    @jax.jit
    def max_tile(i):
        cam = stack.camera(i)
        proj = preprocess_gaussians(
            means, scales, quats, opac, sh, cam, 0, ts,
            rcfg.scale_mod, None, rect_mode=rcfg.rect_mode,
        )
        binning = bin_gaussians(proj, ntx, nty, budget, ts)
        return jnp.max(binning.tile_count)

    mt = max(int(max_tile(jnp.asarray(i, jnp.int32))) for i in idxs)
    capacity = fit_pair_budget(mt, headroom=headroom, min_budget=128)
    return dataclasses.replace(
        rcfg, pair_budget=budget, tile_capacity=capacity
    )


@register("tetgs-init-trainer")
class TetGSInitTrainer:
    """Photometric appearance fit over training views."""

    def __init__(
        self,
        binding: TetGSBinding,
        params: TetGSParams,
        cameras: Sequence[GSCamera],
        cfg: InitTextureConfig = InitTextureConfig(),
    ):
        self.binding = binding
        self.params = params
        self.cfg = cfg
        self.stack = CameraStack(cameras)
        if self.stack.images is None:
            raise ValueError("training cameras need images")
        self.spatial_extent = self.stack.spatial_extent()
        self.tx = make_tetgs_optimizer(cfg.opt, self.spatial_extent)
        self.opt_state = self.tx.init(params)
        if cfg.auto_size_budget:
            self.cfg = cfg = dataclasses.replace(
                cfg, raster=auto_size_raster_config(
                    gaussian_arrays(binding, params), self.stack, cfg.raster)
            )
        self.governor = BudgetGovernor(
            policy=cfg.overflow_policy, name="tetgs-init"
        )
        self._steps: Dict[int, callable] = {}
        self.losses: List[float] = []
        self.stats: List[dict] = []

    def _make_step(self, sh_degree: int):
        cfg = self.cfg
        binding = self.binding
        stack = self.stack
        bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
        rcfg = dataclasses.replace(cfg.raster, sh_degree=sh_degree)

        def loss_fn(params: TetGSParams, cam_idx: Array):
            means, scales, quats, opac, sh = gaussian_arrays(binding, params)
            cam = stack.camera(cam_idx)
            out = render_gaussians(
                means, scales, quats, opac, sh, cam, rcfg, bg
            )
            gt = stack.images[cam_idx]
            loss = l1_dssim(out["image"], gt, cfg.dssim_factor)
            if cfg.scaling_reg:
                loss = loss + cfg.scaling_reg_weight * scaling_regularizer(
                    binding, params
                )
            diag = {"num_pairs": out["num_pairs"],
                    "num_tile_overflow": out["num_tile_overflow"]}
            return loss, diag

        @jax.jit
        def step(params, opt_state, cam_idx):
            (loss, diag), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, cam_idx
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, diag

        return step

    def step_fn(self, iteration: int):
        sh_degree = min(
            iteration // max(self.cfg.sh_warmup_every, 1),
            self.binding.sh_levels - 1,
        )
        if sh_degree not in self._steps:
            self._steps[sh_degree] = self._make_step(sh_degree)
        return self._steps[sh_degree]

    def param_stats(self) -> dict:
        """min/max/mean/std of every Gaussian parameter tensor — the
        reference's per-100-iter rich stats block (`refine.py:326-342`)."""
        out = {}
        for name, arr in dataclasses.asdict(self.params).items():
            a = jnp.asarray(arr)
            if a.size == 0:  # e.g. sh_rest at sh_levels=1
                continue
            out[name] = {
                "min": float(a.min()), "max": float(a.max()),
                "mean": float(a.mean()), "std": float(a.std()),
            }
        return out

    def train(self, seed: int = 0, num_iterations: Optional[int] = None,
              verbose: bool = False):
        n_iter = num_iterations or self.cfg.num_iterations
        rng = np.random.default_rng(seed)
        t0 = time.time()
        for it in range(n_iter):
            cam_idx = jnp.asarray(rng.integers(0, self.stack.n), jnp.int32)
            step = self.step_fn(it)
            self.params, self.opt_state, loss, diag = step(
                self.params, self.opt_state, cam_idx
            )
            if it % self.cfg.log_every == 0 or it == n_iter - 1:
                # Pair-budget governance: the reference sizes buffers
                # exactly per render and cannot overflow; we detect and
                # grow (or fail) instead of training on truncated renders.
                new_rcfg = self.governor.check(
                    self.cfg.raster, diag["num_pairs"],
                    diag["num_tile_overflow"], step=it,
                )
                if new_rcfg is not None:
                    self.cfg = dataclasses.replace(self.cfg, raster=new_rcfg)
                    self._steps.clear()  # recompile at the grown budget
                self.losses.append(float(loss))
                self.stats.append({"iteration": it, "loss": float(loss),
                                   "num_pairs": int(diag["num_pairs"]),
                                   "num_tile_overflow":
                                       int(diag["num_tile_overflow"]),
                                   **self.param_stats()})
                if verbose:
                    print(f"[tetgs-init] it {it} loss {float(loss):.5f} "
                          + " ".join(
                              f"{k}[{v['min']:.3g},{v['max']:.3g}]"
                              for k, v in self.stats[-1].items()
                              if isinstance(v, dict)))
        self.elapsed = time.time() - t0
        return self.params

    def render_views(
        self, cameras: Sequence[GSCamera], sh_degree: Optional[int] = None
    ) -> List[np.ndarray]:
        """Validation renders (`refine.py:377-427` probe views)."""
        deg = (
            self.binding.sh_levels - 1 if sh_degree is None else sh_degree
        )
        rcfg = dataclasses.replace(self.cfg.raster, sh_degree=deg)
        bg = jnp.ones(3) if self.cfg.white_background else jnp.zeros(3)
        means, scales, quats, opac, sh = gaussian_arrays(
            self.binding, self.params
        )
        out = []
        for cam in cameras:
            img = render_gaussians(
                means, scales, quats, opac, sh, cam.raster_camera(), rcfg, bg
            )["image"]
            out.append(np.asarray(jnp.clip(img, 0, 1)))
        return out
