"""Stages 0–1 — SDF shape initialization + localized SDS geometry editing.

Capability parity with the reference spatial stage:

  * `shape_init` (= `HumanInit` / `ImplicitSDF.initialize_shape`,
    `implicit_sdf.py:172-361`): phase A regresses the field to the signed
    distance of the anchor-aligned body mesh (reference: 15k iters × 40k pts
    against pysdf; here the native `MeshSDF` BVH with a pre-sampled point
    pool), phase B refines with rendered-normal L1 against the GT mesh's
    normal maps from random cameras plus a strong SDF anchor term
    (`:265-330`).
  * `HumanEditTrainer` (= `HumanEdit.training_step`,
    `systems/humanedit.py:152-304`): per step — sample a local+global camera
    pair, extract the partitioned update surface, render normal maps, apply
    SDS guidance on the local OR global normal map (chosen randomly with the
    λ_sds weighting), the surface-aware keep-SDF recon loss, the HumanNorm
    control-SDF loss, and normal consistency, all with `C()` schedules.

Alignment chain (`convert_mesh_init`): mesh recentred by the anchor centroid,
y += 0.3, up-y→up-z / front-z→front-x rotation, |v|∞-normalized to
shape_init_params.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from youreditableavatar_tpu.data.camera_sampler import (
    RandomCameraConfig,
    RandomCameraSampler,
)
from youreditableavatar_tpu.guidance.prompts import PromptProcessor
from youreditableavatar_tpu.guidance.sds import SDSGuidance
from youreditableavatar_tpu.models.geometry import Partition, TetGeometry
from youreditableavatar_tpu.models.part_renderer import (
    normal_consistency,
    render_part_maps,
)
from youreditableavatar_tpu.models.sdf import SDFField
from youreditableavatar_tpu.native import MeshSDF
from youreditableavatar_tpu.ops.mesh_raster import MeshRasterConfig
from youreditableavatar_tpu.utils.registry import register
from youreditableavatar_tpu.utils.schedule import C, ScheduleSpec


def align_anchor_mesh(
    verts: np.ndarray,
    anchor_verts: Optional[np.ndarray] = None,
    shape_init_params: float = 0.9,
    y_offset: float = 0.3,
) -> Tuple[np.ndarray, Dict[str, Any]]:
    """`convert_mesh_init` mesh-side chain (`cameras.py:225-270`)."""
    anchor = verts if anchor_verts is None else anchor_verts
    centroid = anchor.mean(0)
    v = verts - centroid
    v = v.copy()
    v[:, 1] += y_offset
    x_ = np.array([0.0, 0.0, 1.0])  # front +z
    z_ = np.array([0.0, 1.0, 0.0])  # up +y
    y_ = np.cross(z_, x_)
    std2mesh = np.stack([x_, y_, z_], axis=0).T
    mesh2std = np.linalg.inv(std2mesh)
    scale = np.abs(v).max()
    v = v / scale * shape_init_params
    v = (mesh2std @ v.T).T
    meta = {
        "centroid": centroid,
        "scale": float(scale),
        "shape_init_params": shape_init_params,
        "y_offset": y_offset,
    }
    return v.astype(np.float32), meta


@dataclasses.dataclass(frozen=True)
class ShapeInitConfig:
    sdf_iters: int = 15000
    sdf_points_per_iter: int = 40000
    sdf_pool_size: int = 2_000_000
    sdf_lr: float = 1e-3
    normal_iters: int = 501
    normal_lr: float = 5e-5
    normal_height: int = 512
    normal_width: int = 512
    normal_sdf_weight: float = 10000.0
    normal_points_per_iter: int = 40000
    camera: RandomCameraConfig = dataclasses.field(
        default_factory=lambda: RandomCameraConfig(
            elevation_range=(-10, 10),
            camera_distance_range=(3.0, 3.3),
            fovy_range=(40, 45),
            height=512, width=512,
        )
    )


@register("human-init")
class ShapeInitializer:
    """Stage-0 SDF fit to a reconstructed body mesh."""

    def __init__(
        self,
        field: SDFField,
        geometry: TetGeometry,
        cfg: ShapeInitConfig = ShapeInitConfig(),
    ):
        self.field = field
        self.geometry = geometry
        self.cfg = cfg

    def run(
        self,
        verts: np.ndarray,
        faces: np.ndarray,
        key: jax.Array,
        mesh_cfg: MeshRasterConfig = MeshRasterConfig(),
        debug_dir: str = None,
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Fit the SDF to the body mesh. With `debug_dir` set, exports the
        GT body mesh and the fitted isosurface as PLYs after each phase
        (the reference's `init_debug` switch, `implicit_sdf.py:332-361`) so
        alignment problems are visible before any edit training runs."""
        cfg = self.cfg
        k_init, k_pool, k_train, k_cam = jax.random.split(key, 4)
        params = self.field.init_params(k_init)

        # Host: signed distance oracle + pre-sampled pool (the reference
        # queries pysdf per iteration; the pool amortizes the BVH queries).
        mesh_sdf = MeshSDF(verts, faces)
        rng = np.random.default_rng(int(jax.random.randint(k_pool, (), 0,
                                                           2**31 - 1)))
        pool = rng.uniform(-1, 1, (cfg.sdf_pool_size, 3)).astype(np.float32)
        # MeshSDF is positive outside; the field convention is also positive
        # outside (the reference flips pysdf's positive-inside, we don't
        # need to).
        pool_sdf = mesh_sdf(pool)
        pool_j = jnp.asarray(pool)
        pool_sdf_j = jnp.asarray(pool_sdf)

        tx = optax.adam(cfg.sdf_lr)
        opt_state = tx.init(params)
        field = self.field

        # Progressive hash-grid: the whole shape init runs at the curriculum's
        # step-0 mask (start_level coarse levels) — the reference's
        # `initialize_shape` executes inside `on_fit_start` where
        # global_step == 0, so the fine levels stay inactive until edit
        # training advances the band (`networks.py:97-106`).
        init_mask = field.level_mask(0)

        @jax.jit
        def sdf_step(params, opt_state, key):
            idx = jax.random.randint(
                key, (cfg.sdf_points_per_iter,), 0, cfg.sdf_pool_size
            )
            pts = pool_j[idx]
            gt = pool_sdf_j[idx]

            def loss_fn(p):
                pred = field.forward_sdf(p, pts, level_mask=init_mask)
                return jnp.mean((pred - gt) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        keys = jax.random.split(k_train, cfg.sdf_iters)
        losses = []
        for i in range(cfg.sdf_iters):
            params, opt_state, loss = sdf_step(params, opt_state, keys[i])
            if i % 500 == 0:
                losses.append(float(loss))

        def _dump(tag, p):
            if debug_dir is None:
                return
            import os

            from youreditableavatar_tpu.utils.saving import save_ply

            os.makedirs(debug_dir, exist_ok=True)
            mt = self.geometry.isosurface(p, level_mask=init_mask)
            nv = int(mt.num_verts)
            fv = np.asarray(mt.faces)[np.asarray(mt.faces_valid)]
            save_ply(os.path.join(debug_dir, f"init_{tag}.ply"),
                     np.asarray(mt.verts)[:nv], fv)
            save_ply(os.path.join(debug_dir, "init_gt_body.ply"),
                     np.asarray(verts), np.asarray(faces))

        _dump("sdf_phase", params)

        # Phase B: rendered-normal refinement vs the GT mesh's own normal
        # maps + a strong anchor on the pool SDF (`implicit_sdf.py:265-330`).
        from youreditableavatar_tpu.models.part_renderer import (
            render_geometry_maps,
        )

        gt_verts = jnp.asarray(verts)
        gt_faces = jnp.asarray(faces, jnp.int32)
        gt_valid = jnp.ones((faces.shape[0],), bool)
        sampler = RandomCameraSampler(cfg.camera, seed=0)
        tx2 = optax.adam(cfg.normal_lr)
        opt2 = tx2.init(params)
        geometry = self.geometry

        @jax.jit
        def normal_step(params, opt_state, viewmat, fx, fy, cx, cy, key):
            from youreditableavatar_tpu.ops.gaussian_raster.types import (
                RasterCamera,
            )

            cam = RasterCamera(
                viewmat=viewmat, fx=fx, fy=fy, cx=cx, cy=cy,
                width=cfg.normal_width, height=cfg.normal_height,
            )
            gt_maps = render_geometry_maps(
                gt_verts, gt_faces, gt_valid, cam, mesh_cfg
            )

            def loss_fn(p):
                mt = geometry.isosurface(p, level_mask=init_mask)
                pred = render_geometry_maps(
                    mt.verts, mt.faces, mt.faces_valid, cam, mesh_cfg
                )
                l_norm = jnp.mean(
                    jnp.abs(pred["comp_normal"] - gt_maps["comp_normal"])
                )
                idx = jax.random.randint(
                    key, (cfg.normal_points_per_iter,), 0, cfg.sdf_pool_size
                )
                l_sdf = jnp.mean(
                    (field.forward_sdf(p, pool_j[idx],
                                       level_mask=init_mask)
                     - pool_sdf_j[idx]) ** 2
                )
                return l_norm + cfg.normal_sdf_weight * l_sdf

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx2.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        nkeys = jax.random.split(k_cam, cfg.normal_iters)
        for i in range(cfg.normal_iters):
            batch = sampler.sample()
            cam = batch.global_[0].raster_camera()
            params, opt2, loss = normal_step(
                params, opt2, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
                nkeys[i],
            )
            if i % 100 == 0:
                losses.append(float(loss))

        _dump("normal_phase", params)
        return params, {"losses": losses, "pool_size": cfg.sdf_pool_size}


@dataclasses.dataclass(frozen=True)
class HumanEditConfig:
    """Stage-1 defaults mirror `configs/geometry-edit.yaml:51-66` +
    `systems/humanedit.py:34-52` file-for-file."""

    max_steps: int = 10000
    # AdamW lr 2e-5, betas (0.9, 0.99), eps 1e-15 (`geometry-edit.yaml:68-73`)
    optimizer: str = "adamw"
    lr: float = 2e-5
    betas: Tuple[float, float] = (0.9, 0.99)
    eps: float = 1e-15
    lambda_sds: ScheduleSpec = 0.5  # also the local-vs-global choice weight
    lambda_sds_global: ScheduleSpec = 0.5
    lambda_sdf_recon: ScheduleSpec = 5000.0
    lambda_sdf_control: ScheduleSpec = 2000.0  # `lambda_sdf`
    lambda_normal_consistency: ScheduleSpec = 2000.0
    # After sub_step (tet subdivision engages) the NC weight switches
    # (`humanedit.py:206-216`, `geometry-edit.yaml` sub_step: 500).
    lambda_normal_consistency_sub: ScheduleSpec = 2000.0
    sub_step: int = 500
    start_sdf_loss_step: int = 3000
    recon_points: int = 30000
    log_every: int = 50
    # Mesh-raster pair-budget overflow policy (ops.gaussian_raster.budget):
    # "grow" rebuilds the step at a larger budget, "raise" hard-fails,
    # "warn" continues on a truncated render.
    overflow_policy: str = "grow"
    # Selection-cache refresh period K for part_isosurface_cached (every
    # live vertex re-evaluates at most K steps apart; selected-tet corners
    # refresh every step). 0 disables the cache (full sweep per step).
    sdf_cache_refresh: int = 8
    # Visual checkpoints: normal-grid dump cadence (`humanedit.py:257-292`),
    # written when `save_dir` is set on the trainer.
    image_every: int = 250
    # Optional image-guided editing (`use_additional_input`,
    # `humanedit.py:219-258`): front/back GT normal+mask images.
    use_additional_input: bool = False
    lambda_normal: ScheduleSpec = 100.0
    lambda_normal_sub: ScheduleSpec = 100.0
    lambda_mask: ScheduleSpec = 100.0
    # Multi-step "du" edit mode (`sds_du_guidance.py:40-42,276-314`): when
    # use_sds is False the SDS term is replaced by latent-MSE ("f") + image
    # L1 + perceptual pulls toward a cached multi-step-denoised edit of the
    # current render, refreshed every `guidance.cfg.per_editing_step` steps
    # (requires an `SDSDUGuidance` instance). Weight names follow the
    # reference's lambda_<loss-suffix> convention (`humanedit.py:295-299`).
    # The reference keys the edit cache by the dataloader's view index; our
    # camera stream is random per step, so the stable analog is an azimuth
    # bucket (du_view_buckets sectors).
    use_sds: bool = True
    lambda_f: ScheduleSpec = 1.0
    lambda_l1: ScheduleSpec = 10.0
    lambda_p: ScheduleSpec = 10.0
    du_view_buckets: int = 16
    camera: RandomCameraConfig = dataclasses.field(
        default_factory=lambda: RandomCameraConfig(
            elevation_range=(-5, 10),
            camera_distance_range=(3.3, 3.5),
            fovy_range=(40, 45),
        )
    )


@register("human-edit")
class HumanEditTrainer:
    """Stage-1 localized geometry editing with SDS guidance."""

    def __init__(
        self,
        field: SDFField,
        geometry: TetGeometry,
        partition: Partition,
        params: Dict[str, Any],
        guidance: SDSGuidance,
        prompts_local: PromptProcessor,
        prompts_global: Optional[PromptProcessor],
        cfg: HumanEditConfig = HumanEditConfig(),
        mesh_cfg: MeshRasterConfig = MeshRasterConfig(),
        seed: int = 0,
    ):
        self.field = field
        self.geometry = geometry
        self.partition = partition
        self.params = params
        self.frozen_params = jax.tree_util.tree_map(
            jax.lax.stop_gradient, params
        )
        self.guidance = guidance
        self.prompts_local = prompts_local
        self.prompts_global = prompts_global
        self.cfg = cfg
        self.mesh_cfg = mesh_cfg
        self.seed = seed
        self.sampler = RandomCameraSampler(cfg.camera, seed=seed)
        self.rng = np.random.default_rng(seed)
        from youreditableavatar_tpu.utils.optim import parse_optimizer

        self.tx = parse_optimizer(cfg.optimizer, cfg.lr, cfg.betas, cfg.eps)
        self.opt_state = self.tx.init(params)
        self.control_sdf: Optional[Array] = None
        self._ctrl_dev: Optional[Array] = None  # device cache (train_step)
        self.global_step = 0
        self.metrics: List[Dict[str, float]] = []
        from youreditableavatar_tpu.ops.gaussian_raster import BudgetGovernor

        self.governor = BudgetGovernor(
            policy=cfg.overflow_policy, name="human-edit-mesh"
        )
        self._step_fns: Dict[bool, Any] = {}
        self._render_fns: Dict[bool, Any] = {}  # du-mode refresh renders
        # Visual checkpoints (normal grids every cfg.image_every steps) are
        # written here when set (`humanedit.py:257-292`).
        self.save_dir: Optional[str] = None
        # Optional utils.saving.ProgressFile for UI frontends.
        self.progress = None
        # Optional image-guided editing targets (H, W, ...) in [0, 1]:
        # dict(front_normal, back_normal, front_mask) — `humanedit.py:144-150`.
        self.input_images: Optional[Dict[str, np.ndarray]] = None

        # Frozen-field SDF at grid vertices: the surface-aware recon target.
        self.recon_sdf = geometry.field.forward_sdf_chunked(
            self.frozen_params, geometry.grid_pos
        )

        # Selection cache (part_isosurface_cached): composite SDF carried
        # across steps. At t=0 the live field equals the frozen field, so
        # the partition's frozen_sdf is the exact initial cache.
        self._sdf_cache: Optional[Array] = (
            jnp.asarray(partition.frozen_sdf)
            if cfg.sdf_cache_refresh > 0 else None
        )
        if cfg.sdf_cache_refresh > 0:
            live = np.asarray(partition.live_vert_idx)
            k_ref = cfg.sdf_cache_refresh
            r = -(-live.shape[0] // k_ref)
            pad = np.resize(live, (k_ref * r,))  # wraps; dupes harmless
            self._refresh_slices = jnp.asarray(
                pad.reshape(k_ref, r).astype(np.int32)
            )

    def _make_step(self, use_global: bool):
        cfg = self.cfg
        geometry = self.geometry
        field = self.field
        part = self.partition
        guidance = self.guidance
        mesh_cfg = self.mesh_cfg
        grid_pos = geometry.grid_pos
        nv = grid_pos.shape[0]

        h, w = cfg.camera.height, cfg.camera.width
        from youreditableavatar_tpu.ops.gaussian_raster.types import (
            RasterCamera,
        )

        use_cache = cfg.sdf_cache_refresh > 0

        def step(params, opt_state, cam_l_arr, cam_g_arr, cond, uncond, key,
                 weights, min_t, max_t, control_sdf, global_step,
                 guide_normal, guide_mask, guide_flag, sdf_cache,
                 refresh_idx, du_gt, n_active=None):
            cam_l = RasterCamera(*cam_l_arr, width=w, height=h)
            cam_g = RasterCamera(*cam_g_arr, width=w, height=h)
            # Progressive hash-grid band (`networks.py:97-106`). n_active
            # is STATIC (host-derived from the step) so masked levels'
            # gather/scatter work is skipped entirely, not just zeroed.
            if n_active is None:
                lm = field.level_mask(global_step)
            else:
                lm = (jnp.arange(field.cfg.grid.n_levels)
                      < n_active).astype(jnp.float32)

            # Independent streams for the SDS noise draw and the recon/
            # control point sampling — reusing one key correlates the
            # guidance noise with the loss-sampling sites every step.
            key_sds, key_pts = jax.random.split(key)

            def loss_fn(p):
                if use_cache:
                    mt, new_cache = geometry.part_isosurface_cached(
                        p, part, sdf_cache, refresh_idx, level_mask=lm,
                        n_active=n_active,
                    )
                else:
                    mt = geometry.part_isosurface(
                        p, part, level_mask=lm, n_active=n_active)
                    new_cache = sdf_cache
                maps = render_part_maps(
                    part.keep_mesh, mt, cam_l,
                    cam_g if use_global else None, mesh_cfg,
                )
                normal_img = (
                    maps["global_comp_normal"] if use_global
                    else maps["local_comp_normal"]
                )
                if cfg.use_sds:
                    sds = guidance(
                        normal_img[None], cond, uncond, key_sds, min_t,
                        max_t
                    )
                    loss = weights["sds"] * sds["loss_sds"]
                    sds_aux = {"sds": sds["loss_sds"]}
                else:
                    # du edit mode: pull the render toward the cached
                    # multi-step edit `du_gt` (refreshed host-side in
                    # train_step; `sds_du_guidance.py:306-314`).
                    k_enc, _, _ = jax.random.split(key_sds, 3)
                    du = guidance.du_loss_terms(
                        normal_img[None], du_gt[None], k_enc
                    )
                    loss = (
                        weights["du_f"] * du["loss_f"]
                        + weights["du_l1"] * du["loss_l1"]
                        + weights["du_p"] * du.get("loss_p", 0.0)
                    )
                    sds_aux = {
                        "du_f": du["loss_f"], "du_l1": du["loss_l1"],
                    }

                # Surface-aware recon: keep-region vertices must match the
                # frozen field (`humanedit.py:198-204`, `forward_field`
                # recon branch).
                k_idx = jax.random.randint(
                    key_pts, (cfg.recon_points,), 0, nv
                )
                live = field.forward_sdf(p, grid_pos[k_idx],
                                         level_mask=lm, n_active=n_active)
                frozen = self.recon_sdf[k_idx]
                keep_w = (~part.live_vert_mask[k_idx]).astype(jnp.float32)
                loss_recon = jnp.sum(keep_w * (live - frozen) ** 2)
                loss = loss + weights["recon"] * loss_recon

                # HumanNorm control-SDF on the edit region (snapshotted live
                # field after warmup).
                loss_ctrl = jnp.where(
                    weights["control"] > 0,
                    jnp.sum(
                        part.live_vert_mask[k_idx].astype(jnp.float32)
                        * (live - control_sdf[k_idx]) ** 2
                    ),
                    0.0,
                )
                loss = loss + weights["control"] * loss_ctrl

                loss_nc = normal_consistency(mt)
                loss = loss + weights["nc"] * loss_nc

                aux = {
                    **sds_aux,
                    "recon": loss_recon,
                    "control": loss_ctrl,
                    "nc": loss_nc,
                    # mesh-raster pair totals (max over the views rendered
                    # this step) — compared against mesh_cfg.pair_budget by
                    # the train loop's overflow governor
                    "mesh_pairs": jnp.maximum(
                        maps["local_num_pairs"],
                        maps.get("global_num_pairs", 0),
                    ).astype(jnp.float32),
                }

                if cfg.use_additional_input:
                    # Image-guided editing (`humanedit.py:219-258`): MSE
                    # between the update-region normals and the front/back
                    # GT normal image, + silhouette L2 on the front mask.
                    upd = maps["local_update_mask"]
                    pred_n = upd[..., None] * maps["local_comp_normal"] \
                        + 0.5 * (1.0 - upd[..., None])
                    gt_n = upd[..., None] * guide_normal \
                        + 0.5 * (1.0 - upd[..., None])
                    loss_normal = jnp.sum((pred_n - gt_n) ** 2)
                    loss = loss + weights["img_normal"] * loss_normal
                    pred_o = upd * jnp.clip(
                        maps["local_opacity"], 1e-5, 1.0 - 1e-5
                    )
                    # front view only (flag == 0): silhouette L2
                    loss_mask = jnp.where(
                        guide_flag < 0.5,
                        jnp.sum((pred_o - upd * guide_mask) ** 2),
                        0.0,
                    )
                    loss = loss + weights["img_mask"] * loss_mask
                    aux["img_normal"] = loss_normal
                    aux["img_mask"] = loss_mask

                return loss, (aux, normal_img, new_cache)

            (loss, (aux, normal_img, new_cache)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux, normal_img, new_cache

        return jax.jit(step, static_argnums=(18,))

    def _make_render(self, use_global: bool):
        """Loss-free render of the current edit surface (du-mode cache
        refresh needs the CURRENT render before the training step;
        `sds_du_guidance.py:292-304` refreshes from the step's render)."""
        cfg = self.cfg
        geometry = self.geometry
        field = self.field
        part = self.partition
        mesh_cfg = self.mesh_cfg
        h, w = cfg.camera.height, cfg.camera.width
        from youreditableavatar_tpu.ops.gaussian_raster.types import (
            RasterCamera,
        )

        use_cache = cfg.sdf_cache_refresh > 0

        def render(params, cam_l_arr, cam_g_arr, global_step, sdf_cache,
                   refresh_idx, n_active=None):
            cam_l = RasterCamera(*cam_l_arr, width=w, height=h)
            cam_g = RasterCamera(*cam_g_arr, width=w, height=h)
            if n_active is None:
                lm = field.level_mask(global_step)
            else:
                lm = (jnp.arange(field.cfg.grid.n_levels)
                      < n_active).astype(jnp.float32)
            if use_cache:
                # Discard the cache update — the training step recomputes
                # and carries it (this render must not double-advance the
                # rotating refresh slice's staleness bookkeeping).
                mt, _ = geometry.part_isosurface_cached(
                    params, part, sdf_cache, refresh_idx, level_mask=lm,
                    n_active=n_active,
                )
            else:
                mt = geometry.part_isosurface(
                    params, part, level_mask=lm, n_active=n_active)
            maps = render_part_maps(
                part.keep_mesh, mt, cam_l,
                cam_g if use_global else None, mesh_cfg,
            )
            return (
                maps["global_comp_normal"] if use_global
                else maps["local_comp_normal"]
            )

        return jax.jit(render, static_argnums=(6,))

    def train_step(self, key: jax.Array) -> Dict[str, float]:
        cfg = self.cfg
        step_i = self.global_step
        # Per-step derived RNG streams (not a sequential stateful stream):
        # every host-side random draw this step is a pure function of
        # (seed, step), so a restored run at step k makes exactly the same
        # draws as an uninterrupted one — the resume-replay counterpart of
        # the reference's `do_update_step(..., on_load_weights=True)`
        # (`utils/misc.py:32-62`).
        step_rng = np.random.default_rng((self.seed, 1, step_i))
        self.sampler.rng = np.random.default_rng((self.seed, 2, step_i))
        batch = self.sampler.sample(step_i)
        cam_l = batch.local[0].raster_camera()
        cam_g = batch.global_[0].raster_camera()

        w_local = C(cfg.lambda_sds, 0, step_i)
        use_global = step_rng.random() >= w_local
        prompts = (
            self.prompts_global
            if use_global and self.prompts_global is not None
            else self.prompts_local
        )
        cond, uncond = prompts.get_text_embeddings(
            batch.elevation_deg[:1], batch.azimuth_deg[:1]
        )

        # Snapshot the control SDF at the warmup boundary.
        if step_i == cfg.start_sdf_loss_step:
            self.control_sdf = np.asarray(
                self.geometry.field.forward_sdf_chunked(
                    self.params, self.geometry.grid_pos
                )
            )
            self._ctrl_dev = None

        # NC weight switches to the `_sub` schedule once subdivision engages
        # (`humanedit.py:206-216`, sub_step 500).
        nc_spec = (
            cfg.lambda_normal_consistency if step_i < cfg.sub_step
            else cfg.lambda_normal_consistency_sub
        )
        weights = {
            "sds": jnp.asarray(
                C(cfg.lambda_sds_global if use_global else cfg.lambda_sds, 0,
                  step_i),
                jnp.float32,
            ),
            "recon": jnp.asarray(
                C(cfg.lambda_sdf_recon, 0, step_i), jnp.float32
            ),
            "control": jnp.asarray(
                C(cfg.lambda_sdf_control, 0, step_i)
                if self.control_sdf is not None else 0.0,
                jnp.float32,
            ),
            "nc": jnp.asarray(C(nc_spec, 0, step_i), jnp.float32),
            "du_f": jnp.asarray(
                C(cfg.lambda_f, 0, step_i) if not cfg.use_sds else 0.0,
                jnp.float32,
            ),
            "du_l1": jnp.asarray(
                C(cfg.lambda_l1, 0, step_i) if not cfg.use_sds else 0.0,
                jnp.float32,
            ),
            "du_p": jnp.asarray(
                C(cfg.lambda_p, 0, step_i) if not cfg.use_sds else 0.0,
                jnp.float32,
            ),
        }
        # Image-guided editing: random front/back choice per step
        # (`humanedit.py:161-162`); flag 0 = front.
        guide_flag = float(step_rng.integers(0, 2))
        h, w = cfg.camera.height, cfg.camera.width
        if cfg.use_additional_input and self.input_images is not None:
            img_n_spec = (
                cfg.lambda_normal if step_i < cfg.sub_step
                else cfg.lambda_normal_sub
            )
            weights["img_normal"] = jnp.asarray(
                C(img_n_spec, 0, step_i), jnp.float32)
            weights["img_mask"] = jnp.asarray(
                C(cfg.lambda_mask, 0, step_i), jnp.float32)
            which = "front" if guide_flag < 0.5 else "back"
            guide_normal = jnp.asarray(
                self.input_images[f"{which}_normal"], jnp.float32)
            guide_mask = jnp.asarray(
                self.input_images.get("front_mask",
                                      np.ones((h, w), np.float32)),
                jnp.float32,
            )
        else:
            weights["img_normal"] = jnp.float32(0.0)
            weights["img_mask"] = jnp.float32(0.0)
            guide_normal = jnp.zeros((h, w, 3), jnp.float32)
            guide_mask = jnp.zeros((h, w), jnp.float32)

        min_t, max_t = self.guidance.timestep_range(0, step_i)
        # Device-cache the control SDF: re-uploading the (Nv,) array every
        # step costs a ~1 MB host->device transfer at grid 64 (slow over a
        # remote-device tunnel); it only changes at the snapshot boundary.
        if self._ctrl_dev is None:
            self._ctrl_dev = jnp.asarray(
                self.control_sdf
                if self.control_sdf is not None
                else np.zeros(self.geometry.grid_pos.shape[0], np.float32)
            )
        ctrl = self._ctrl_dev

        if use_global not in self._step_fns:
            self._step_fns[use_global] = self._make_step(use_global)
        step_fn = self._step_fns[use_global]
        cam_l_arr = (cam_l.viewmat, cam_l.fx, cam_l.fy, cam_l.cx, cam_l.cy)
        cam_g_arr = (cam_g.viewmat, cam_g.fx, cam_g.fy, cam_g.cx, cam_g.cy)
        if self.cfg.sdf_cache_refresh > 0:
            sdf_cache = self._sdf_cache
            refresh_idx = self._refresh_slices[
                step_i % self.cfg.sdf_cache_refresh
            ]
        else:  # dummies (static shapes; unused by the step)
            sdf_cache = jnp.zeros((1,), jnp.float32)
            refresh_idx = jnp.zeros((1,), jnp.int32)

        # Static progressive level count (exact skip of masked levels'
        # hash work; same formula as progressive_level_mask).
        gcfg = self.field.cfg.grid
        if gcfg.progressive:
            n_active = int(min(
                gcfg.start_level
                + max(step_i - gcfg.start_step, 0) // gcfg.update_steps,
                gcfg.n_levels,
            ))
        else:
            n_active = gcfg.n_levels

        # du edit mode: refresh the per-view-bucket edited-image cache from
        # the CURRENT render when due, then hand the cached edit to the
        # jitted step (`sds_du_guidance.py:292-304`; the cache is host
        # state, exactly like the reference's `self.edited_images`).
        if not cfg.use_sds:
            az = float(batch.azimuth_deg[0]) % 360.0
            bucket = int(az / 360.0 * cfg.du_view_buckets) \
                % cfg.du_view_buckets
            key_sds_host, _ = jax.random.split(key)
            per_edit = int(getattr(self.guidance.cfg, "per_editing_step", 10))
            if (bucket not in self.guidance.edited_images
                    or step_i % per_edit == 0):
                if use_global not in self._render_fns:
                    self._render_fns[use_global] = \
                        self._make_render(use_global)
                cur = self._render_fns[use_global](
                    self.params, cam_l_arr, cam_g_arr, jnp.int32(step_i),
                    sdf_cache, refresh_idx, n_active,
                )
                self.guidance.maybe_refresh(
                    cur[None], jnp.asarray(cond), jnp.asarray(uncond),
                    key_sds_host, min_t, max_t, bucket, step_i,
                )
            du_gt = self.guidance.edited_images[bucket][0]
        else:
            du_gt = jnp.zeros((h, w, 3), jnp.float32)

        (self.params, self.opt_state, loss, aux, normal_img,
         new_cache) = step_fn(
            self.params, self.opt_state, cam_l_arr, cam_g_arr,
            jnp.asarray(cond), jnp.asarray(uncond), key, weights,
            jnp.asarray(min_t), jnp.asarray(max_t), ctrl,
            jnp.int32(step_i), guide_normal, guide_mask,
            jnp.float32(guide_flag), sdf_cache, refresh_idx, du_gt,
            n_active,
        )
        if self.cfg.sdf_cache_refresh > 0:
            self._sdf_cache = new_cache
        self.global_step += 1
        rec = {"loss": float(loss), **{k: float(v) for k, v in aux.items()}}
        if step_i % cfg.log_every == 0:
            self.metrics.append({"step": step_i, **rec})
            # Mesh-raster pair-budget governance: grow (rebuild steps) or
            # fail loudly instead of training on a truncated raster.
            new_mcfg = self.governor.check(
                self.mesh_cfg, int(rec["mesh_pairs"]), 0, step=step_i
            )
            if new_mcfg is not None:
                self.mesh_cfg = new_mcfg
                self._step_fns.clear()
                self._render_fns.clear()
        # Visual checkpoint: the training normal map every image_every steps
        # (`humanedit.py:257-292` normal grids).
        if self.save_dir is not None and step_i % cfg.image_every == 0:
            from youreditableavatar_tpu.utils.saving import save_image

            save_image(
                os.path.join(
                    self.save_dir,
                    f"train-normal/it{step_i}-"
                    f"{'global' if use_global else 'local'}-normal.png",
                ),
                np.clip(np.asarray(normal_img), 0, 1),
            )
        return rec

    def save_checkpoint(self, path: str) -> None:
        """Full resumable training state (params, opt_state, step, and the
        control-SDF snapshot when it exists) — orbax, same layout as the
        reference's Lightning ckpts (§5.4)."""
        from youreditableavatar_tpu.utils.checkpoint import save_state

        extra = {}
        if self.control_sdf is not None:
            extra["control_sdf"] = np.asarray(self.control_sdf)
        if self._sdf_cache is not None:
            # Carried selection cache: checkpointed so a restored run makes
            # exactly the same tet selections as an uninterrupted one.
            extra["sdf_cache"] = np.asarray(self._sdf_cache)
        save_state(path, self.params, self.opt_state,
                   step=self.global_step, extra=extra or None)

    def restore_checkpoint(self, path: str) -> None:
        """Resume mid-curriculum with step-replay semantics.

        Restores params/opt_state/step and re-derives every piece of
        step-dependent state, mirroring the reference's
        `do_update_step(epoch, step, on_load_weights=True)` replay
        (`utils/misc.py:32-62`, `networks.py:97-106`):

          * progressive hash-grid level mask — a pure function of the
            restored `global_step`, recomputed inside the jitted step;
          * all `C()` schedules and the timestep range — functions of step;
          * host RNG draws — per-step derived streams (see `train_step`),
            so no generator state needs restoring;
          * the control-SDF snapshot — restored if it was taken, else (when
            resuming from before `start_sdf_loss_step`) it will be taken at
            the boundary exactly as in an uninterrupted run.
        """
        from youreditableavatar_tpu.utils.checkpoint import (
            load_state, restore_like)

        state = load_state(path)
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        if "opt_state" in state:
            # Name-aware rebuild: orbax restores optax NamedTuple states as
            # dicts whose sorted-key order need not match field order.
            self.opt_state = restore_like(self.opt_state, state["opt_state"])
        self.global_step = int(state["step"])
        extra = state.get("extra") or {}
        ctrl = extra.get("control_sdf") if isinstance(extra, dict) else None
        self.control_sdf = np.asarray(ctrl) if ctrl is not None else None
        self._ctrl_dev = None
        if self.cfg.sdf_cache_refresh > 0:
            cache = (extra.get("sdf_cache")
                     if isinstance(extra, dict) else None)
            if cache is not None:
                self._sdf_cache = jnp.asarray(cache)
            else:  # older checkpoint: rebuild exactly from the live field
                live_idx = self.partition.live_vert_idx
                vals = self.geometry.field.forward_sdf_chunked(
                    self.params, self.geometry.grid_pos[live_idx],
                    level_mask=self.geometry.field.level_mask(
                        self.global_step
                    ),
                )
                self._sdf_cache = jnp.asarray(
                    self.partition.frozen_sdf
                ).at[live_idx].set(vals)

    def train(self, key: jax.Array, num_steps: Optional[int] = None):
        n = num_steps or self.cfg.max_steps
        for i in range(n):
            # Key derived from the GLOBAL step (not the loop index): a
            # restored run continues with exactly the keys an uninterrupted
            # run would have used.
            self.train_step(jax.random.fold_in(key, self.global_step))
            # UI progress line (reference gradio ProgressCallback,
            # `utils/callbacks.py:120-157`); None-safe no-op by default.
            if self.progress is not None and (
                i % self.cfg.log_every == 0 or i == n - 1
            ):
                self.progress.step(i + 1, n)
        return self.params
