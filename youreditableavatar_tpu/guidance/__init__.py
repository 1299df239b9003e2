"""Diffusion-prior guidance seam.

The reference hard-wires diffusers pipelines (SD1.5 SDS guidance
`sds_du_guidance.py`, SDXL+ControlNet-Union inpaint/img2img pipelines under
`tetgs_inpainter/`). The TPU framework isolates every diffusion dependency
behind small protocols (`DiffusionPrior`, `PromptEncoder`, `Inpainter`) so:

  * the full pipeline wiring runs and is tested with stub backends
    (SURVEY §4's "random-noise UNet" smoke prescription) without 10 GB of
    weights;
  * real backends (flax SD1.5 / SDXL ports, or a sidecar process) drop in
    behind the same seam.

The SDS math itself (timestep annealing, CFG mixing, w(t) weighting, the
MSE-to-target reparameterization) is backend-independent and lives here.
"""

from youreditableavatar_tpu.guidance.base import (
    DiffusionPrior,
    PromptEncoder,
)
from youreditableavatar_tpu.guidance.sds import (
    SDSConfig,
    SDSDUConfig,
    SDSDUGuidance,
    SDSGuidance,
)
from youreditableavatar_tpu.guidance.stub import (
    StubDiffusionPrior,
    StubPromptEncoder,
)

__all__ = [
    "DiffusionPrior",
    "PromptEncoder",
    "SDSConfig",
    "SDSDUConfig",
    "SDSDUGuidance",
    "SDSGuidance",
    "StubDiffusionPrior",
    "StubPromptEncoder",
]
