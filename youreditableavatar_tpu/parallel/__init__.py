"""Device-mesh parallelism: views over `data`, rasterizer tiles over `tile`.

The reference's only parallel axis is Lightning DDP over independently
sampled camera views plus post-init parameter broadcast (`SURVEY.md` §5.8).
The TPU build makes both axes first-class:

  * `data` — camera views (data parallelism; the reference's axis),
  * `tile` — the rasterizer's screen-tile grid (intra-renderer parallelism
    replacing CUDA thread-blocks), with an all-gather over ICI to assemble
    images and a psum to combine Gaussian-parameter gradients.

Replicated-by-construction initialization from explicit PRNG keys replaces
the reference's rank-0 broadcast (`implicit_sdf.py:255-257`);
`utils.misc.assert_replicated` is the invariant check.
"""

from youreditableavatar_tpu.parallel.mesh import (
    distributed_init,
    make_mesh,
)
from youreditableavatar_tpu.parallel.train_step import (
    make_sharded_render_train_step,
)

__all__ = [
    "distributed_init",
    "make_mesh",
    "make_sharded_render_train_step",
]
