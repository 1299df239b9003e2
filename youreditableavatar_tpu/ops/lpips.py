"""LPIPS perceptual distance: VGG16 features + linear heads in pure JAX.

Capability parity with the vendored LPIPS (`thirdparties/lpips/lpips.py:1-218`
and `tetgs_spatial/utils/perceptual/`): conv1_2/conv2_2/conv3_3/conv4_3/
conv5_3 VGG16 activations, unit-normalized per channel, squared differences
reduced by 1×1 linear heads, averaged over space and layers.

Weights: `convert_torch_vgg16` / `convert_torch_lpips_heads` map the standard
torchvision VGG16 `state_dict` and LPIPS `vgg.pth` lin-head tensors into the
JAX pytree (host-side, once). Without provided weights the net initializes
randomly — random VGG features remain a usable perceptual-ish metric for
relative comparisons, but absolute parity requires converted weights (this
zero-egress build ships the seam, not the weights).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# VGG16 conv architecture: (out_channels, layers per block).
VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# LPIPS taps the last conv of each block (pre-pool, post-relu).
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_vgg16_params(key: jax.Array) -> List[Dict[str, Array]]:
    params = []
    cin = 3
    for cout, n in VGG_BLOCKS:
        for _ in range(n):
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (3, 3, cin, cout)) * np.sqrt(
                2.0 / (9 * cin)
            )
            params.append({"w": w.astype(jnp.float32),
                           "b": jnp.zeros((cout,), jnp.float32)})
            cin = cout
    return params


def init_lpips_heads(key: jax.Array) -> List[Array]:
    heads = []
    for cout, _ in VGG_BLOCKS:
        key, k = jax.random.split(key)
        heads.append(
            jax.nn.softplus(jax.random.normal(k, (cout,)) * 0.1).astype(
                jnp.float32
            )
        )
    return heads


def convert_torch_vgg16(state_dict: Dict[str, Any]) -> List[Dict[str, Array]]:
    """torchvision `vgg16().features` state_dict → param list (OIHW→HWIO)."""
    params = []
    idx = 0
    keys = sorted(
        (k for k in state_dict if k.endswith(".weight") and "features" in k),
        key=lambda k: int(k.split(".")[-2]),
    )
    for wk in keys:
        bk = wk.replace(".weight", ".bias")
        w = np.asarray(state_dict[wk])
        if w.ndim != 4:
            continue
        params.append(
            {
                "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "b": jnp.asarray(np.asarray(state_dict[bk])),
            }
        )
        idx += 1
    return params


def convert_torch_lpips_heads(state_dict: Dict[str, Any]) -> List[Array]:
    """LPIPS `lin{i}.model.1.weight` (C,1,1,1) tensors → (C,) head weights."""
    heads = []
    for i in range(5):
        for pattern in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if pattern in state_dict:
                w = np.asarray(state_dict[pattern]).reshape(-1)
                heads.append(jnp.asarray(np.maximum(w, 0.0)))
                break
    return heads


def _conv(x: Array, p: Dict[str, Array]) -> Array:
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def vgg16_features(params: List[Dict[str, Array]], x: Array) -> List[Array]:
    """(B, H, W, 3) in [-1, 1] → the 5 tapped activations."""
    feats = []
    i = 0
    for _, n in VGG_BLOCKS:
        for j in range(n):
            x = jax.nn.relu(_conv(x, params[i]))
            i += 1
        feats.append(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return feats


def lpips(
    vgg_params: List[Dict[str, Array]],
    heads: List[Array],
    pred: Array,
    target: Array,
) -> Array:
    """Mean LPIPS over a batch; inputs (B, H, W, 3) in [0, 1]."""
    shift = jnp.asarray(SHIFT)
    scale = jnp.asarray(SCALE)

    def norm_input(img):
        return ((img * 2.0 - 1.0) - shift) / scale

    fa = vgg16_features(vgg_params, norm_input(pred))
    fb = vgg16_features(vgg_params, norm_input(target))
    total = 0.0
    for a, b, h in zip(fa, fb, heads):
        a = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        b = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        total = total + jnp.mean(jnp.sum(d * h, axis=-1))
    return total


class LPIPS:
    """Convenience wrapper with optional torch-weight loading."""

    def __init__(
        self,
        vgg_state_dict: Dict[str, Any] | None = None,
        lpips_state_dict: Dict[str, Any] | None = None,
        seed: int = 0,
    ):
        if vgg_state_dict is not None:
            self.vgg = convert_torch_vgg16(vgg_state_dict)
        else:
            self.vgg = init_vgg16_params(jax.random.PRNGKey(seed))
        if lpips_state_dict is not None:
            self.heads = convert_torch_lpips_heads(lpips_state_dict)
        else:
            self.heads = init_lpips_heads(jax.random.PRNGKey(seed + 1))
        self.pretrained = vgg_state_dict is not None

    def __call__(self, pred: Array, target: Array) -> Array:
        if pred.ndim == 3:
            pred, target = pred[None], target[None]
        return lpips(self.vgg, self.heads, pred, target)
