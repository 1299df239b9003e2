"""Stage 4 — texture editing: progressive inpainting + 3D refinement.

Capability parity with `tetgs_texture/paint_2dgs.py:33-689` (TetGS_Inpaint)
and `tetgs_texture/refine_3dgs.py:24-449` (TetGS_Refine):

  * `InpaintTrainer.inpaint_training`: walk the 3-ring camera set (8/12/12,
    `paint_2dgs.py:163-166`); per view render masks/normals with the
    textured-mesh model, call the Inpainter backend (SDXL+ControlNet-Union in
    the reference; any `guidance.base.Inpainter` here — views 0/1 use the
    joint front/back path `inpaint_utils.py:80-186`), composite the guidance
    image, fit the edit-Gaussian colors/opacity against it (iteration ladder
    1000/800/400 `paint_2dgs.py:61-63`), then roll back Gaussians outside
    the newly painted faces (`:538-557`).
  * `InpaintTrainer.prepare_refine_guidance`: 60 turntable renders, img2img
    tile-refined (strength 0.4, `sdxl_tile_refiner.py:66-67`), blended
    per-pixel between edit and keep renders (`paint_2dgs.py:616-689`).
  * `RefineTrainer.refined_editing`: promote the 2D disks to the 3D model
    and train on the blended views (l1+dssim, 10× weight on the 4 key views
    {0,14,29,44} `refine_3dgs.py:334-335`, scaling regularizer).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from youreditableavatar_tpu.guidance.base import Inpainter
from youreditableavatar_tpu.models.cameras import GSCamera
from youreditableavatar_tpu.models.optimizer import OptimizationParams, \
    expon_lr_schedule
from youreditableavatar_tpu.models.tetgs_edit import (
    EditBinding,
    EditParams,
    full_gaussian_arrays,
    promote_to_3d,
    render_edit_tetgs,
    rollback_outside_faces,
)
from youreditableavatar_tpu.models.textured_mesh import TexturedMeshModel
from youreditableavatar_tpu.ops.gaussian_raster import (
    BudgetGovernor,
    RasterCamera,
    RasterizeConfig,
)
from youreditableavatar_tpu.ops.image_losses import dssim, l1_dssim
from youreditableavatar_tpu.utils.registry import register


@dataclasses.dataclass(frozen=True)
class InpaintConfig:
    # Iteration ladder per view group (`paint_2dgs.py:61-63`).
    iters_first: int = 1000
    iters_second: int = 800
    iters_rest: int = 400
    first_group: int = 4
    second_group: int = 4
    lr_sh: float = 0.0025
    lr_opacity: float = 0.05
    inpaint_steps: int = 30
    white_background: bool = True
    # Fit loss = (1−f)·masked-L1 + f·D-SSIM against the composited target
    # (`paint_2dgs.py:74,345-347` default dssim_factor 0.2).
    dssim_factor: float = 0.2
    # Views 0/1 (front + back) are inpainted JOINTLY as one side-by-side
    # image so the two sides agree (`inpaint_utils.py:80-186`).
    joint_front_back: bool = True
    fb_res: int = 512  # per-side resolution of the joint inpaint
    # Pair-budget overflow policy (ops.gaussian_raster.budget): "grow"
    # rebuilds the fit step at a larger budget and refits the view;
    # "raise" hard-fails; "warn" keeps going on a truncated render.
    overflow_policy: str = "grow"
    # Size pair_budget/tile_capacity from an exact count pre-pass at init.
    auto_size_budget: bool = True
    raster: RasterizeConfig = dataclasses.field(
        default_factory=lambda: RasterizeConfig()
    )


def _edit_param_mask(train_positions: bool = False,
                     train_geometry: bool = False) -> EditParams:
    """Which EditParams leaves train during inpainting (colors + opacity)."""
    return EditParams(
        delta=train_positions,
        log_scales=train_geometry,
        quats=train_geometry,
        opacity_raw=True,
        sh_dc=True,
        sh_rest=True,
    )


def make_edit_optimizer(
    lr_sh: float, lr_opacity: float, train_mask: EditParams
) -> optax.GradientTransformation:
    transforms = {
        "delta": optax.adam(1.6e-4, eps=1e-15),
        "log_scales": optax.adam(5e-3, eps=1e-15),
        "quats": optax.adam(1e-3, eps=1e-15),
        "opacity_raw": optax.adam(lr_opacity, eps=1e-15),
        "sh_dc": optax.adam(lr_sh, eps=1e-15),
        "sh_rest": optax.adam(lr_sh / 20.0, eps=1e-15),
    }
    labels = EditParams(
        delta="delta", log_scales="log_scales", quats="quats",
        opacity_raw="opacity_raw", sh_dc="sh_dc", sh_rest="sh_rest",
    )
    tx = optax.multi_transform(transforms, labels)
    inv = jax.tree_util.tree_map(lambda m: not m, train_mask)
    return optax.chain(optax.masked(optax.set_to_zero(), inv), tx)


@register("tetgs-inpaint")
class InpaintTrainer:
    def __init__(
        self,
        binding: EditBinding,
        params: EditParams,
        mesh_model: TexturedMeshModel,
        cameras: Sequence[GSCamera],
        inpainter: Inpainter,
        prompt: str,
        negative_prompt: str = "",
        cfg: InpaintConfig = InpaintConfig(),
        segmenter=None,
    ):
        self.binding = binding
        self.params = params
        self.mesh_model = mesh_model
        self.cameras = list(cameras)
        self.inpainter = inpainter
        self.prompt = prompt
        self.negative_prompt = negative_prompt
        self.cfg = cfg
        # Optional stages.localization.Segmenter for the front/back views'
        # edge-misalignment fix (`inpaint_utils.py:207-218`): the guidance
        # blend mask is intersected with a "person" mask of the inpainted
        # image and max-pool dilated, so stray background pixels the
        # diffusion model painted outside the subject don't become targets.
        self.segmenter = segmenter
        self.tx = make_edit_optimizer(
            cfg.lr_sh, cfg.lr_opacity, _edit_param_mask()
        )
        self.governor = BudgetGovernor(
            policy=cfg.overflow_policy, name="tetgs-inpaint"
        )
        if cfg.auto_size_budget:
            from youreditableavatar_tpu.stages.init_texture import (
                CameraStack, auto_size_raster_config,
            )

            self.cfg = cfg = dataclasses.replace(
                cfg, raster=auto_size_raster_config(
                    full_gaussian_arrays(binding, params)[:5],
                    CameraStack(self.cameras, with_images=False),
                    cfg.raster,
                )
            )
        self._fit_step = None
        self.history: List[Dict[str, float]] = []

    def _bg(self):
        return jnp.ones(3) if self.cfg.white_background else jnp.zeros(3)

    def _make_fit_step(self, height: int, width: int):
        binding = self.binding
        rcfg = dataclasses.replace(
            self.cfg.raster, sh_degree=binding.sh_levels - 1
        )
        bg = self._bg()
        tx = self.tx

        dssim_f = self.cfg.dssim_factor

        def loss_fn(params, cam_arrs, target, weight):
            cam = RasterCamera(*cam_arrs, width=width, height=height)
            out = render_edit_tetgs(binding, params, cam, rcfg, bg)
            diff = jnp.abs(out["image"] - target)
            l1 = jnp.sum(diff * weight[..., None]) / (
                jnp.sum(weight) * 3.0 + 1e-6
            )
            # l1+dssim as the reference's fit loss (`paint_2dgs.py:345-347`);
            # the D-SSIM term runs on the full composited target (outside
            # the mask target == current render, so it only shapes the
            # painted region and its surround).
            loss = (1.0 - dssim_f) * l1 + dssim_f * dssim(
                out["image"], target
            )
            diag = {"num_pairs": out["num_pairs"],
                    "num_tile_overflow": out["num_tile_overflow"]}
            return loss, diag

        @jax.jit
        def step(params, opt_state, cam_arrs, target, weight):
            (loss, diag), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, cam_arrs, target, weight)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, diag

        return step

    def _iters_for_view(self, idx: int) -> int:
        if idx < self.cfg.first_group:
            return self.cfg.iters_first
        if idx < self.cfg.first_group + self.cfg.second_group:
            return self.cfg.iters_second
        return self.cfg.iters_rest

    def _joint_front_back_guidance(
        self, key: jax.Array
    ) -> List[Array]:
        """Views 0/1 inpainted as ONE side-by-side front|back image.

        The reference concatenates the two 512-px views and makes a single
        SDXL inpaint call (`prepare_fb_inputs`/`prepare_fb_image_guidance`,
        `inpaint_utils.py:80-186`) so front and back agree on the garment;
        the halves are split back and used as the per-view guidance.
        """
        cfg = self.cfg
        h, w = self.cameras[0].height, self.cameras[0].width
        r = cfg.fb_res
        rcfg = dataclasses.replace(
            cfg.raster, sh_degree=self.binding.sh_levels - 1
        )
        halves = {"image": [], "mask": [], "normal": []}
        for gscam in self.cameras[:2]:
            cam = gscam.raster_camera()
            view = self.mesh_model.render_view(cam)
            masks = self.mesh_model.prepare_inpaint_masks(view)
            current = render_edit_tetgs(
                self.binding, self.params, cam, rcfg, self._bg()
            )["image"]
            halves["image"].append(
                jax.image.resize(current, (r, r, 3), "bilinear"))
            halves["mask"].append(jax.image.resize(
                masks["inpaint_mask_soft"], (r, r), "bilinear"))
            halves["normal"].append(jax.image.resize(
                view["comp_normal"], (r, r, 3), "bilinear"))
        img_fb = jnp.concatenate(halves["image"], axis=1)
        mask_fb = jnp.concatenate(halves["mask"], axis=1)
        norm_fb = jnp.concatenate(halves["normal"], axis=1)
        joint = self.inpainter.inpaint(
            image=img_fb, mask=mask_fb, control_normal=norm_fb,
            control_repaint=img_fb, prompt=self.prompt,
            negative_prompt=self.negative_prompt, key=key,
            steps=self.cfg.inpaint_steps,
        )
        joint = jnp.clip(jnp.asarray(joint), 0.0, 1.0)
        return [
            jax.image.resize(joint[:, :r], (h, w, 3), "bilinear"),
            jax.image.resize(joint[:, r:], (h, w, 3), "bilinear"),
        ]

    def inpaint_training(
        self, key: jax.Array, iters_scale: float = 1.0
    ) -> EditParams:
        cfg = self.cfg
        h = self.cameras[0].height
        w = self.cameras[0].width
        if self._fit_step is None:
            self._fit_step = self._make_fit_step(h, w)

        fb_guidance: Optional[List[Array]] = None
        if cfg.joint_front_back and len(self.cameras) >= 2:
            key, k_fb = jax.random.split(key)
            fb_guidance = self._joint_front_back_guidance(k_fb)

        for vi, gscam in enumerate(self.cameras):
            key, k_inp = jax.random.split(key)
            cam = gscam.raster_camera()
            view = self.mesh_model.render_view(cam)
            masks = self.mesh_model.prepare_inpaint_masks(view)

            # Current model render (the image being completed).
            rcfg = dataclasses.replace(
                cfg.raster, sh_degree=self.binding.sh_levels - 1
            )
            current = render_edit_tetgs(
                self.binding, self.params, cam, rcfg, self._bg()
            )["image"]

            # Guidance image: views 0/1 take the precomputed joint
            # front/back result; later views the per-view normal-conditioned
            # inpaint (`paint_2dgs.py:350-489`, `normal_based_inpaint`).
            if fb_guidance is not None and vi < 2:
                guidance = fb_guidance[vi]
            else:
                guidance = self.inpainter.inpaint(
                    image=current,
                    mask=masks["inpaint_mask_soft"],
                    control_normal=view["comp_normal"],
                    control_repaint=current,
                    prompt=self.prompt,
                    negative_prompt=self.negative_prompt,
                    key=k_inp,
                    steps=cfg.inpaint_steps,
                )
            guidance = jnp.clip(jnp.asarray(guidance), 0.0, 1.0)
            # Composite: keep region from the current render.
            m = masks["inpaint_mask_soft"][..., None]
            if self.segmenter is not None and fb_guidance is not None \
                    and vi < 2:
                from youreditableavatar_tpu.ops.morphology import dilate

                # Edge fix for the joint views (`inpaint_utils.py:207-218`):
                # blend only where the painted mask ∩ person mask says the
                # subject is, dilated by a 15-px max-pool.
                person = self.segmenter.segment(
                    np.asarray(guidance), "person"
                )
                mm = (masks["inpaint_mask"] > 0.5) & jnp.asarray(person)
                m = dilate(mm.astype(jnp.float32), size=15)[..., None]
            target = guidance * m + current * (1 - m)

            # Fit the edit gaussians to the composited target inside the
            # editable coverage.
            weight = jnp.where(
                (view["editable"] > 0.5) | (masks["inpaint_mask"] > 0.5),
                1.0, 0.0,
            )
            prev_params = self.params
            n_iters = max(1, int(self._iters_for_view(vi) * iters_scale))
            cam_arrs = (cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy)
            # Restart-on-grow: overflow diagnostics are view-dependent, so
            # probe them on the view's first step; if the governor grows the
            # budget, rebuild the jitted step and refit the whole view from
            # the pre-fit params (the truncated first step is discarded).
            while True:
                params = prev_params
                opt_state = self.tx.init(prev_params)
                regrown = False
                for it in range(n_iters):
                    params, opt_state, loss, diag = self._fit_step(
                        params, opt_state, cam_arrs, target, weight
                    )
                    if it == 0:
                        new_rcfg = self.governor.check(
                            cfg.raster, diag["num_pairs"],
                            diag["num_tile_overflow"], step=vi,
                        )
                        if new_rcfg is not None:
                            self.cfg = cfg = dataclasses.replace(
                                cfg, raster=new_rcfg
                            )
                            self._fit_step = self._make_fit_step(h, w)
                            regrown = True
                            break
                if not regrown:
                    break
            self.params = params

            # Back-project the newly painted pixels and roll back gaussians
            # outside the painted face set.
            painted_px = np.asarray(masks["inpaint_mask"] > 0.5)
            newly_painted_faces = self.mesh_model.back_project(
                view, painted_px
            )
            # Faces painted in ANY view so far stay; others roll back.
            total_painted = jnp.asarray(
                np.asarray(
                    self.mesh_model.painted[
                        np.asarray(self.mesh_model.faces)
                    ].any(1)
                )
            )
            self.params = rollback_outside_faces(
                self.binding, self.params, prev_params, total_painted
            )
            self.history.append(
                {"view": vi, "loss": float(loss), "iters": n_iters}
            )
        return self.params

    def prepare_refine_guidance(
        self,
        turntable: Sequence[GSCamera],
        key: jax.Array,
        strength: float = 0.4,
        upscale_to_2048: bool = False,
    ) -> List[np.ndarray]:
        """60 refined + blended guidance images (`paint_2dgs.py:616-689`).

        Each render is tile-controlled img2img-refined at strength 0.4; with
        `upscale_to_2048` the 2×-upscale 2×2-crop path of
        `sdxl_tile_refiner.py:49-66` runs instead (each quadrant refined at
        native resolution, reassembled at double size).
        """
        rcfg = dataclasses.replace(
            self.cfg.raster, sh_degree=self.binding.sh_levels - 1
        )
        out_images = []
        for i, gscam in enumerate(turntable):
            key, k = jax.random.split(key)
            cam = gscam.raster_camera()
            render = render_edit_tetgs(
                self.binding, self.params, cam, rcfg, self._bg()
            )["image"]
            if upscale_to_2048:
                from youreditableavatar_tpu.guidance.sdxl_pipeline import (
                    sdxl_tile_refine,
                )

                refined = jnp.clip(
                    sdxl_tile_refine(
                        self.inpainter, render, self.prompt, k, strength,
                        upscale_to_2048=True,
                    ), 0, 1,
                )
                refined = jax.image.resize(
                    refined, render.shape, "bilinear"
                )
            else:
                refined = jnp.clip(
                    jnp.asarray(
                        self.inpainter.img2img(
                            render, render, self.prompt, key=k,
                            strength=strength,
                        )
                    ), 0, 1,
                )
            blend = self.mesh_model.concat_blend_masks(cam)
            m = blend["edit_mask_soft"][..., None]
            img = refined * m + render * (1 - m)
            out_images.append(np.asarray(img))
        return out_images


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    num_iterations: int = 2000
    key_views: Tuple[int, ...] = (0, 14, 29, 44)
    key_view_weight: float = 10.0
    dssim_factor: float = 0.2
    scaling_reg: bool = True
    # Optional LPIPS perceptual term (the reference's bundled VGG-LPIPS,
    # `tetgs_spatial/utils/perceptual/`); 0 = off.
    lambda_perceptual: float = 0.0
    white_background: bool = True
    overflow_policy: str = "grow"  # see ops.gaussian_raster.budget
    auto_size_budget: bool = True
    raster: RasterizeConfig = dataclasses.field(
        default_factory=lambda: RasterizeConfig()
    )
    sh_levels: int = 4


@register("tetgs-refine")
class RefineTrainer:
    def __init__(
        self,
        binding2d: EditBinding,
        params2d: EditParams,
        cameras: Sequence[GSCamera],
        images: Sequence[np.ndarray],
        cfg: RefineConfig = RefineConfig(),
    ):
        self.cfg = cfg
        self.binding, self.params = promote_to_3d(
            binding2d, params2d, sh_levels=cfg.sh_levels
        )
        self.cameras = list(cameras)
        self.images = jnp.asarray(np.stack(images), jnp.float32)
        self.tx = make_edit_optimizer(
             0.0025, 0.05,
            _edit_param_mask(train_positions=True, train_geometry=True),
        )
        self.opt_state = self.tx.init(self.params)
        self.governor = BudgetGovernor(
            policy=cfg.overflow_policy, name="tetgs-refine"
        )
        if cfg.auto_size_budget:
            from youreditableavatar_tpu.stages.init_texture import (
                CameraStack, auto_size_raster_config,
            )

            self.cfg = cfg = dataclasses.replace(
                cfg, raster=auto_size_raster_config(
                    full_gaussian_arrays(self.binding, self.params)[:5],
                    CameraStack(self.cameras, with_images=False),
                    cfg.raster,
                )
            )
        self.losses: List[float] = []
        self._step = None
        self._lpips = None
        if cfg.lambda_perceptual > 0:
            from youreditableavatar_tpu.ops.lpips import LPIPS

            self._lpips = LPIPS()

    def _make_step(self, height, width):
        binding = self.binding
        cfg = self.cfg
        rcfg = dataclasses.replace(cfg.raster, sh_degree=cfg.sh_levels - 1)
        bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
        tx = self.tx
        lpips_fn = self._lpips

        def loss_fn(params, cam_arrs, target, weight):
            cam = RasterCamera(*cam_arrs, width=width, height=height)
            out = render_edit_tetgs(binding, params, cam, rcfg, bg)
            diag = {"num_pairs": out["num_pairs"],
                    "num_tile_overflow": out["num_tile_overflow"]}
            loss = weight * l1_dssim(out["image"], target, cfg.dssim_factor)
            if lpips_fn is not None:
                loss = loss + cfg.lambda_perceptual * jnp.mean(
                    lpips_fn(out["image"][None], target[None])
                )
            if cfg.scaling_reg:
                scales = jnp.exp(params.log_scales)
                max_v = jnp.max(scales, -1)
                min_v = jnp.min(scales, -1)
                ratio = max_v / jnp.maximum(min_v, 1e-12)
                bad = (ratio > 10.0) & (max_v > 0.1)
                cnt = jnp.sum(bad)
                loss = loss + jnp.where(
                    cnt > 0,
                    jnp.sum(jnp.where(bad, max_v, 0.0)) / jnp.maximum(cnt, 1),
                    0.0,
                )
            return loss, diag

        @jax.jit
        def step(params, opt_state, cam_arrs, target, weight):
            (loss, diag), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, cam_arrs, target, weight)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, diag

        return step

    def refined_editing(
        self, seed: int = 0, num_iterations: Optional[int] = None
    ) -> EditParams:
        cfg = self.cfg
        n_iter = num_iterations or cfg.num_iterations
        h, w = self.cameras[0].height, self.cameras[0].width
        if self._step is None:
            self._step = self._make_step(h, w)
        rng = np.random.default_rng(seed)
        for it in range(n_iter):
            vi = int(rng.integers(0, len(self.cameras)))
            cam = self.cameras[vi].raster_camera()
            weight = jnp.asarray(
                cfg.key_view_weight if vi in cfg.key_views else 1.0,
                jnp.float32,
            )
            cam_arrs = (cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy)
            self.params, self.opt_state, loss, diag = self._step(
                self.params, self.opt_state, cam_arrs, self.images[vi],
                weight,
            )
            if it % 100 == 0:
                new_rcfg = self.governor.check(
                    self.cfg.raster, diag["num_pairs"],
                    diag["num_tile_overflow"], step=it,
                )
                if new_rcfg is not None:
                    self.cfg = cfg = dataclasses.replace(
                        self.cfg, raster=new_rcfg
                    )
                    self._step = self._make_step(h, w)
                self.losses.append(float(loss))
        return self.params

    def validate(self, cameras: Sequence[GSCamera]) -> List[np.ndarray]:
        """Final turntable renders (`refine_3dgs.py:409-449`)."""
        rcfg = dataclasses.replace(
            self.cfg.raster, sh_degree=self.cfg.sh_levels - 1
        )
        bg = jnp.ones(3) if self.cfg.white_background else jnp.zeros(3)
        out = []
        for cam in cameras:
            img = render_edit_tetgs(
                self.binding, self.params, cam.raster_camera(), rcfg, bg
            )["image"]
            out.append(np.asarray(jnp.clip(img, 0, 1)))
        return out
