"""End-to-end pipeline driver (the `run.sh` role) + per-stage entry points.

Mirrors the reference's 4-stage file-mediated flow (`run.sh:1-99`):

  stage 0/1 (spatial):  body mesh → SDF init ckpt → (optional SDS edit) →
                        init_mesh.npy / edit_mesh.npy
  stage 2  (init tex):  init_mesh.npy + posed frames → TetGS appearance fit →
                        probe renders → editing_region_info.npy (localization)
  stage 4  (edit tex):  edit_mesh.npy + keep Gaussians → progressive inpaint
                        → blend images → 3D refine → final turntable

Every stage reads/writes the same `.npy` artifact schemas as the reference,
so stages can be re-run in isolation (§5.3's file-mediated recovery
property). `run_synthetic_pipeline` exercises the whole chain on generated
data with stub diffusion backends — the executable smoke of SURVEY §4(d).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from youreditableavatar_tpu.data.camera_sampler import (
    RandomCameraConfig,
    RandomCameraSampler,
)
from youreditableavatar_tpu.guidance import (
    SDSConfig,
    SDSGuidance,
    StubDiffusionPrior,
    StubPromptEncoder,
)
from youreditableavatar_tpu.guidance.prompts import PromptProcessor
from youreditableavatar_tpu.guidance.stub import StubInpainter
from youreditableavatar_tpu.models.geometry import GeometryBudgets, TetGeometry
from youreditableavatar_tpu.models.sdf import SDFField, SDFFieldConfig
from youreditableavatar_tpu.models.tetgs import (
    build_tetgs,
    extract_keep_gaussians,
    load_tetgs,
    save_tetgs,
)
from youreditableavatar_tpu.models.tetgs_edit import build_edit_tetgs
from youreditableavatar_tpu.models.textured_mesh import TexturedMeshModel
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterCamera,
    RasterizeConfig,
)
from youreditableavatar_tpu.ops.hashgrid import HashGridConfig
from youreditableavatar_tpu.ops.marching_tets import make_tet_grid, marching_tets
from youreditableavatar_tpu.ops.mesh_raster import MeshRasterConfig
from youreditableavatar_tpu.stages.edit_texture import (
    InpaintConfig,
    InpaintTrainer,
    RefineConfig,
    RefineTrainer,
)
from youreditableavatar_tpu.stages.export import (
    export_edit_mesh,
    export_init_mesh,
    load_edit_mesh,
    load_editing_region_info,
    load_init_mesh,
)
from youreditableavatar_tpu.stages.init_texture import (
    InitTextureConfig,
    TetGSInitTrainer,
)
from youreditableavatar_tpu.stages.localization import (
    HeuristicSegmenter,
    LocalizationConfig,
    LocalMeshEditing,
)
from youreditableavatar_tpu.stages.spatial import (
    HumanEditConfig,
    HumanEditTrainer,
    ShapeInitConfig,
    ShapeInitializer,
)
from youreditableavatar_tpu.utils.checkpoint import load_state, save_state
from youreditableavatar_tpu.utils.profiling import MetricsLogger
from youreditableavatar_tpu.utils.saving import save_image, save_video


@dataclasses.dataclass
class PipelineScale:
    """Sizing knobs; `tiny()` runs the whole chain in minutes on CPU."""

    grid_res: int = 64
    image_hw: int = 512
    sdf_iters: int = 15000
    normal_iters: int = 501
    edit_steps: int = 10000
    fit_iters: int = 4000
    inpaint_views: int = 32
    turntable_views: int = 60
    refine_iters: int = 2000
    budgets: GeometryBudgets = dataclasses.field(
        default_factory=GeometryBudgets
    )
    raster: RasterizeConfig = dataclasses.field(
        default_factory=lambda: RasterizeConfig()
    )
    mesh_raster: MeshRasterConfig = dataclasses.field(
        default_factory=lambda: MeshRasterConfig()
    )
    hashgrid: HashGridConfig = dataclasses.field(
        default_factory=HashGridConfig
    )

    @staticmethod
    def tiny() -> "PipelineScale":
        return PipelineScale(
            grid_res=10,
            image_hw=64,
            sdf_iters=200,
            normal_iters=3,
            edit_steps=4,
            fit_iters=30,
            inpaint_views=3,
            turntable_views=4,
            refine_iters=10,
            budgets=GeometryBudgets(
                mt_verts=4096, mt_faces=8192, compact=4096,
                subdiv_mid=16384, fine_mt_verts=16384, fine_mt_faces=32768,
            ),
            # Budgets here are INITIAL HINTS only: the texture trainers
            # auto-size from an exact count pre-pass at init, and every
            # trainer's BudgetGovernor grows them on runtime overflow
            # (ops/gaussian_raster/budget.py) — nothing trains on a
            # silently truncated render.
            raster=RasterizeConfig(
                backend="auto", pair_budget=1 << 13, tile_capacity=512
            ),
            mesh_raster=MeshRasterConfig(
                backend="auto", pair_budget=1 << 14, tile_capacity=2048
            ),
            hashgrid=HashGridConfig(
                n_levels=4, n_features_per_level=2, log2_hashmap_size=13,
                base_resolution=4, per_level_scale=1.5,
            ),
        )


def _field(scale: PipelineScale) -> SDFField:
    return SDFField(
        SDFFieldConfig(grid=scale.hashgrid, sdf_bias="sphere",
                       sdf_bias_radius=0.4)
    )


def _cam_cfg(scale: PipelineScale, **kw) -> RandomCameraConfig:
    base = dict(
        height=scale.image_hw, width=scale.image_hw,
        camera_distance_range=(1.6, 1.8), elevation_range=(-5, 10),
        fovy_range=(40, 45),
    )
    base.update(kw)
    return RandomCameraConfig(**base)


def run_spatial_stage(
    out_dir: str,
    body_verts: np.ndarray,
    body_faces: np.ndarray,
    edit_prompt: str,
    scale: PipelineScale,
    seed: int = 0,
    edit_prompt_global: Optional[str] = None,
    editing_region_info: Optional[Dict] = None,
    guidance_backend: str = "stub",
    sd_weights: Optional[str] = None,
    system_cfg: Optional[Dict] = None,
    progress_path: Optional[str] = None,
    init_debug: bool = False,
) -> Dict[str, str]:
    """Stages 0+1: SDF init → (SDS edit over the localized region) → exports.

    Without `editing_region_info` only the init runs (geometry-init mode,
    max_steps=0 — `configs/geometry-init.yaml`) and `init_mesh.npy` is
    exported. With it, the SDS edit runs and `edit_mesh.npy` is exported.
    """
    os.makedirs(out_dir, exist_ok=True)
    metrics = MetricsLogger(out_dir)
    key = jax.random.PRNGKey(seed)
    field = _field(scale)
    geometry = TetGeometry(field, scale.grid_res, scale.budgets)

    init_cfg = ShapeInitConfig(
        sdf_iters=scale.sdf_iters,
        normal_iters=scale.normal_iters,
        sdf_points_per_iter=min(40000, 8192 if scale.grid_res < 32 else 40000),
        sdf_pool_size=min(2_000_000, 100_000 if scale.grid_res < 32 else
                          2_000_000),
        normal_height=scale.image_hw, normal_width=scale.image_hw,
        normal_points_per_iter=4096,
        camera=_cam_cfg(scale),
    )
    initializer = ShapeInitializer(field, geometry, init_cfg)
    key, k_init = jax.random.split(key)
    params, info = initializer.run(
        body_verts, body_faces, k_init, scale.mesh_raster,
        debug_dir=os.path.join(out_dir, "init_debug") if init_debug
        else None,
    )
    ckpt_path = os.path.join(out_dir, "initial_checkpoint")
    save_state(ckpt_path, params, step=0)
    metrics.log(0, stage="shape_init", final_loss=info["losses"][-1])

    mt = geometry.isosurface(params)
    init_mesh_path = os.path.join(out_dir, "init_mesh.npy")
    data = export_init_mesh(init_mesh_path, mt)
    # Companion PLY the reference's run.sh hands to the localization stage
    # as --seg_mesh_path (`mesh_exporter_init.py:65-81`, run.sh:51). Our
    # localization back-projects against primitive ids so any watertight
    # surface works; emit the same artifact for drop-in compatibility.
    from youreditableavatar_tpu.utils.saving import save_ply

    coarse_ply = os.path.join(out_dir, "init_mesh_coarse.ply")
    save_ply(
        coarse_ply,
        np.asarray(data["mesh"]["vertices"], np.float32),
        np.asarray(data["mesh"]["faces"]),
    )
    artifacts = {
        "ckpt": ckpt_path,
        "init_mesh": init_mesh_path,
        "init_mesh_coarse": coarse_ply,
    }

    if editing_region_info is not None:
        face_mask = np.zeros(mt.faces.shape[0], bool)
        src = np.asarray(editing_region_info["editing_mask_faces"]) > 0.5
        face_mask[: len(src)] = src[: len(face_mask)]
        part = geometry.partition_init(
            params, jnp.asarray(face_mask) & mt.faces_valid, frozen_mt=mt
        )
        from youreditableavatar_tpu.guidance.factory import (
            make_guidance_backend,
        )

        prior, enc = make_guidance_backend(
            guidance_backend, sd_weights, seed
        )
        sys_cfg = system_cfg or {}
        g_cfg = dict(sys_cfg.get("guidance", {}))
        sds_kwargs = {
            k: g_cfg[k] for k in
            ("guidance_scale", "min_step_percent", "max_step_percent",
             "grad_clip", "weighting_strategy")
            if k in g_cfg
        }
        sds_kwargs = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in sds_kwargs.items()
        }
        guidance = SDSGuidance(prior, SDSConfig(**sds_kwargs))
        prompts = PromptProcessor(
            edit_prompt, "low quality", enc,
            cache_dir=os.path.join(out_dir, ".cache"),
            model_name=guidance_backend,
        )
        # Distinct global prompt (reference run.sh local_prompt vs
        # global_prompt; config key system.prompt_global) — SDS on the
        # full-body view uses the scene-level phrasing.
        gp = edit_prompt_global or sys_cfg.get("prompt_global")
        prompts_global = prompts if not gp else PromptProcessor(
            str(gp), "low quality", enc,
            cache_dir=os.path.join(out_dir, ".cache"),
            model_name=guidance_backend,
        )
        loss_cfg = dict(sys_cfg.get("loss", {}))
        opt_cfg = dict(sys_cfg.get("optimizer", {}))
        edit_kwargs: Dict = dict(
            max_steps=scale.edit_steps,
            camera=_cam_cfg(scale),
            recon_points=4096,
            start_sdf_loss_step=int(
                sys_cfg.get("start_sdf_loss_step",
                            max(scale.edit_steps // 2, 1))
            ),
        )
        if "sub_step" in sys_cfg:
            edit_kwargs["sub_step"] = int(sys_cfg["sub_step"])
        if "use_additional_input" in sys_cfg:
            edit_kwargs["use_additional_input"] = bool(
                sys_cfg["use_additional_input"])
        for yk, ck in (
            ("lambda_sds", "lambda_sds"),
            ("lambda_sds_global", "lambda_sds_global"),
            ("lambda_sdf", "lambda_sdf_control"),
            ("lambda_sdf_recon", "lambda_sdf_recon"),
            ("lambda_normal_consistency", "lambda_normal_consistency"),
            ("lambda_normal_consistency_sub",
             "lambda_normal_consistency_sub"),
            ("lambda_normal", "lambda_normal"),
            ("lambda_normal_sub", "lambda_normal_sub"),
            ("lambda_mask", "lambda_mask"),
        ):
            if yk in loss_cfg:
                v = loss_cfg[yk]
                edit_kwargs[ck] = tuple(v) if isinstance(v, list) else v
        if "name" in opt_cfg:
            edit_kwargs["optimizer"] = str(opt_cfg["name"])
        if "lr" in opt_cfg:
            edit_kwargs["lr"] = float(opt_cfg["lr"])
        if "betas" in opt_cfg:
            edit_kwargs["betas"] = tuple(opt_cfg["betas"])
        if "eps" in opt_cfg:
            edit_kwargs["eps"] = float(opt_cfg["eps"])
        edit_cfg = HumanEditConfig(**edit_kwargs)
        trainer = HumanEditTrainer(
            field, geometry, part, params, guidance, prompts,
            prompts_global, edit_cfg, scale.mesh_raster, seed=seed,
        )
        trainer.save_dir = out_dir
        if progress_path is not None:
            from youreditableavatar_tpu.utils.saving import ProgressFile

            trainer.progress = ProgressFile(progress_path)
        key, k_edit = jax.random.split(key)
        params = trainer.train(k_edit)
        if trainer.progress is not None:
            trainer.progress.close()
        for rec in trainer.metrics:
            metrics.log(rec["step"], stage="human_edit", **{
                k: v for k, v in rec.items() if k != "step"
            })
        save_state(os.path.join(out_dir, "edited_checkpoint"), params,
                   step=scale.edit_steps)
        upd = geometry.part_isosurface(params, part)
        edit_mesh_path = os.path.join(out_dir, "edit_mesh.npy")
        export_edit_mesh(edit_mesh_path, part.keep_mesh, upd)
        artifacts["edit_mesh"] = edit_mesh_path
    metrics.close()
    return artifacts


def run_spatial_validate(
    out_dir: str,
    ckpt_path: str,
    scale: PipelineScale,
    num_views: int = 60,
    subdir: str = "validation",
    elevation_deg: float = 5.0,
) -> str:
    """Turntable normal renders of a spatial-stage checkpoint.

    The reference's `--validate/--test` dispatch renders the val/test
    turntable splits (`train_spatial.py:205-210`, 60-view circle from
    `data/uncond.py` val/test datasets); here: load checkpoint → isosurface
    → mesh-raster normal map per view → PNG frames (+ video when imageio
    has an mp4 writer).
    """
    from youreditableavatar_tpu.models.cameras import sample_circle_cameras
    from youreditableavatar_tpu.models.part_renderer import (
        render_geometry_maps,
    )

    os.makedirs(out_dir, exist_ok=True)
    field = _field(scale)
    geometry = TetGeometry(field, scale.grid_res, scale.budgets)
    params = load_state(ckpt_path)["params"]
    mt = geometry.isosurface(params)

    cams = sample_circle_cameras(
        num_views=num_views, radius=1.7, elevation_deg=elevation_deg,
        fov_deg=45.0, height=scale.image_hw, width=scale.image_hw,
    )
    frames = []
    render = jax.jit(
        lambda vm, fx, fy, cx, cy: render_geometry_maps(
            mt.verts, mt.faces, mt.faces_valid,
            RasterCamera(viewmat=vm, fx=fx, fy=fy, cx=cx, cy=cy,
                         width=scale.image_hw, height=scale.image_hw),
            scale.mesh_raster,
        )["comp_normal"]
    )
    vdir = os.path.join(out_dir, subdir)
    os.makedirs(vdir, exist_ok=True)
    for k, cam in enumerate(cams):
        rc = cam.raster_camera()
        normal = np.asarray(
            render(rc.viewmat, rc.fx, rc.fy, rc.cx, rc.cy)
        )
        frame = np.clip(normal, 0.0, 1.0)
        save_image(os.path.join(vdir, f"frame{k:04d}.png"), frame)
        frames.append(frame)
    try:
        save_video(os.path.join(vdir, "turntable.mp4"), frames, fps=20)
    except Exception:
        pass  # imageio without an mp4 writer: frames alone suffice
    return vdir


def run_init_texture_stage(
    out_dir: str,
    init_mesh_path: str,
    cameras,
    scale: PipelineScale,
    seg_prompt: str = "the garment",
    segmenter=None,
    vertex_colors: Optional[np.ndarray] = None,
    fit_iters: Optional[int] = None,
) -> Dict[str, str]:
    """Stage 2 + localization: appearance fit, probe renders, region masks."""
    os.makedirs(out_dir, exist_ok=True)
    mesh = load_init_mesh(init_mesh_path)
    verts = np.asarray(mesh["vertices"], np.float32)
    faces = np.asarray(mesh["faces"], np.int64)
    f2t = np.asarray(mesh["face_to_global_tet_idx"], np.int64)

    binding, params = build_tetgs(
        verts, faces, vertex_colors, f2t, sh_levels=2
    )
    cfg = InitTextureConfig(
        num_iterations=fit_iters or scale.fit_iters,
        raster=scale.raster,
        sh_warmup_every=max((fit_iters or scale.fit_iters) // 2, 1),
    )
    trainer = TetGSInitTrainer(binding, params, cameras, cfg)
    params = trainer.train()
    ckpt = os.path.join(out_dir, "tetgs_init_last.npz")
    save_tetgs(ckpt, binding, params)

    # Probe renders for localization (`refine.py:377-427` 9-view probe).
    sampler = RandomCameraSampler(_cam_cfg(scale), seed=1)
    probe_cams = []
    for az in (0.0, 120.0, 240.0):
        batch = sampler.sample()
        cam = batch.global_[0]
        probe_cams.append(cam)
    probe_images = trainer.render_views(probe_cams)
    for i, img in enumerate(probe_images):
        save_image(os.path.join(out_dir, f"probe_{i:02d}.png"), img)

    seg = segmenter or HeuristicSegmenter(mode="upper")
    loc = LocalMeshEditing(
        verts, faces, seg,
        LocalizationConfig(dilate_iters=2, erode_iters=2,
                           mesh_cfg=scale.mesh_raster),
    )
    region_path = os.path.join(out_dir, "editing_region_info.npy")
    loc.localize(probe_cams, probe_images, seg_prompt, region_path)
    return {
        "tetgs_init": ckpt,
        "editing_region_info": region_path,
    }


def run_edit_texture_stage(
    out_dir: str,
    edit_mesh_path: str,
    tetgs_init_path: str,
    prompt: str,
    scale: PipelineScale,
    inpainter=None,
    seed: int = 0,
    sample_type: str = "full",
) -> Dict[str, str]:
    """Stage 4: progressive inpaint + refine, final turntable renders.

    sample_type crops the probe/turntable framing to the garment band
    ("upper"/"lower"/"full", reference `gen_tet_camera`/`run_pg.sh`); the
    first two inpainting views always keep the full-body framing for the
    joint front/back step.
    """
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    edit = load_edit_mesh(edit_mesh_path)
    verts = np.asarray(edit["vertices"], np.float32)
    faces = np.asarray(edit["faces"], np.int64)
    nkv = int(edit["keep_vertices_num"])
    nkf = int(edit["keep_faces_num"])
    editing_mask = np.asarray(edit["editing_mask"]) > 0

    # Keep gaussians from the stage-2 model by tet-id intersection.
    binding0, params0, _ = load_tetgs(tetgs_init_path)
    keep_tets = np.asarray(edit["face_to_global_tet_idx"][:nkf])
    keep = extract_keep_gaussians(binding0, params0, keep_tets)

    # Edit sub-mesh (re-indexed).
    sub_faces = faces[nkf:] - nkv
    edit_verts = verts[nkv:]
    ok = (sub_faces >= 0).all(1) & (sub_faces < len(edit_verts)).all(1)
    eb, ep = build_edit_tetgs(edit_verts, sub_faces[ok], keep, sh_levels=1)

    tm = TexturedMeshModel(
        verts, faces, editing_mask, scale.mesh_raster
    )
    # Reference view sets: 3-ring probe cameras for the progressive
    # inpainting ladder and a turntable for refinement (`sample_gs_cameras`
    # / `sample_circle_gs_cameras`), with the garment-band framing.
    from youreditableavatar_tpu.models.cameras import (
        sample_circle_cameras,
        sample_ring_cameras,
    )

    nv = scale.inpaint_views
    counts = (max(nv // 4, 2), max(3 * nv // 8, 1), max(3 * nv // 8, 1))
    cams = sample_ring_cameras(
        counts=counts, height=scale.image_hw, width=scale.image_hw,
        sample_type=sample_type,
    )[:nv]
    inp_cfg = InpaintConfig(
        iters_first=scale.fit_iters // 4 or 1,
        iters_second=scale.fit_iters // 5 or 1,
        iters_rest=scale.fit_iters // 10 or 1,
        raster=scale.raster,
    )
    trainer = InpaintTrainer(
        eb, ep, tm, cams, inpainter or StubInpainter(), prompt,
        "low quality", inp_cfg,
    )
    key, k1, k2 = jax.random.split(key, 3)
    ep = trainer.inpaint_training(k1)

    turn = sample_circle_cameras(
        num_views=scale.turntable_views, height=scale.image_hw,
        width=scale.image_hw, sample_type=sample_type,
    )
    blends = trainer.prepare_refine_guidance(turn, k2)
    blend_dir = os.path.join(out_dir, "blend_images")
    for i, b in enumerate(blends):
        save_image(os.path.join(blend_dir, f"{i:04d}.png"), b)

    rcfg = RefineConfig(
        num_iterations=scale.refine_iters, raster=scale.raster, sh_levels=2,
        key_views=tuple(
            k for k in (0, 14, 29, 44) if k < len(turn)
        ),
    )
    refiner = RefineTrainer(eb, ep, turn, blends, rcfg)
    refiner.refined_editing(seed=seed)
    finals = refiner.validate(turn)
    final_dir = os.path.join(out_dir, "validation_refine")
    for i, img in enumerate(finals):
        save_image(os.path.join(final_dir, f"frame{i:04d}.png"), img)
    if len(finals) > 1:
        save_video(os.path.join(out_dir, "validation_refine.mp4"), finals,
                   fps=10)
    return {"blend_dir": blend_dir, "final_dir": final_dir}


def run_synthetic_pipeline(out_dir: str, scale: Optional[PipelineScale] = None,
                           prompt: str = "a red jacket") -> Dict[str, str]:
    """The full chain on synthetic data (sphere body, stub priors)."""
    scale = scale or PipelineScale.tiny()
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    # Synthetic "reconstructed body": marching-tets sphere.
    gv, gt = make_tet_grid(max(scale.grid_res, 10))
    pos = jnp.asarray(gv)
    sdf = jnp.linalg.norm(pos * jnp.asarray([1.0, 1.0, 0.7]), axis=-1) - 0.3
    mt = marching_tets(pos, sdf, jnp.asarray(gt), 8192, 16384)
    nv, nf = int(mt.num_verts), int(mt.num_faces)
    body_verts = np.asarray(mt.verts)[:nv]
    body_faces = np.asarray(mt.faces)[np.asarray(mt.faces_valid)][:nf]

    # Stage 0: SDF init + init_mesh export.
    sp_dir = os.path.join(out_dir, "spatial")
    arts = run_spatial_stage(
        sp_dir, body_verts, body_faces, prompt, scale
    )

    # Stage 2 needs posed "GT frames": render the init mesh's gaussians from
    # synthetic cameras with procedural colors.
    mesh = load_init_mesh(arts["init_mesh"])
    colors = np.clip(
        0.5 + 0.8 * np.asarray(mesh["vertices"], np.float32), 0.05, 0.95
    )
    sampler = RandomCameraSampler(_cam_cfg(scale), seed=7)
    from youreditableavatar_tpu.models.tetgs import (
        build_tetgs as _bt,
        gaussian_arrays as _ga,
    )
    from youreditableavatar_tpu.ops.gaussian_raster import render_gaussians

    b_gt, p_gt = _bt(
        np.asarray(mesh["vertices"], np.float32),
        np.asarray(mesh["faces"], np.int64), colors,
        np.asarray(mesh["face_to_global_tet_idx"], np.int64), sh_levels=2,
    )
    gt_cams = []
    m_, s_, q_, o_, sh_ = _ga(b_gt, p_gt)
    rc = dataclasses.replace(scale.raster, sh_degree=0)
    for i in range(6):
        cam = sampler.sample().global_[0]
        img = render_gaussians(
            m_, s_, q_, o_, sh_, cam.raster_camera(), rc, jnp.ones(3)
        )["image"]
        cam.image = np.asarray(jnp.clip(img, 0, 1))
        gt_cams.append(cam)

    from youreditableavatar_tpu.utils.misc import cleanup

    it_dir = os.path.join(out_dir, "init_texture")
    arts2 = run_init_texture_stage(
        it_dir, arts["init_mesh"], gt_cams, scale, vertex_colors=colors
    )
    cleanup()  # drop stage-2 compilations before the edit stage (reference
    # calls `cleanup()` between stages, `utils/misc.py:94-101`)

    # Stage 1 (edit) with the localized region, then export edit mesh.
    region = load_editing_region_info(arts2["editing_region_info"])
    arts3 = run_spatial_stage(
        sp_dir, body_verts, body_faces, prompt, scale,
        editing_region_info=region,
    )
    cleanup()

    # Stage 4.
    et_dir = os.path.join(out_dir, "edit_texture")
    arts4 = run_edit_texture_stage(
        et_dir, arts3["edit_mesh"], arts2["tetgs_init"], prompt, scale
    )
    return {
        **arts, **arts2, **arts3, **arts4,
        "elapsed_s": str(round(time.time() - t0, 1)),
    }
