"""Checkpoint/resume: orbax pytree checkpoints with module-sliced restore.

Capability parity with the reference's two regimes (§5.4):

  * Lightning-style spatial checkpoints → orbax `StandardCheckpointer` over
    a state dict {params, opt_state, step, epoch, extra};
  * `load_module_weights` (`utils/misc.py:32-62`) — restoring only a
    submodule subtree by key prefix ("geometry.*" slicing) and replaying
    `update_step(epoch, step, on_load_weights=True)` so step-dependent state
    (e.g. the progressive hash-grid level mask) is reconstructed — here the
    level mask is a pure function of the step, so `set_resume_status`
    amounts to restoring the true step (`systems/base.py:53-76`).

The texture stages' `last.pt` dicts map to `save_simple`/`load_simple` npz.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state(
    path: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a training-state checkpoint (orbax)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = {
        "params": params,
        "step": np.asarray(step),
        "epoch": np.asarray(epoch),
    }
    if opt_state is not None:
        state["opt_state"] = opt_state
    if extra:
        state["extra"] = extra
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_state(path: str, template: Optional[Any] = None) -> Dict[str, Any]:
    """Read a checkpoint; `template` (matching pytree of arrays) restores
    exact dtypes/shardings when provided."""
    ckptr = _checkpointer()
    path = os.path.abspath(path)
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def restore_like(template: Any, restored: Any) -> Any:
    """Rebuild `restored` (orbax's dict-of-dicts form) into `template`'s
    pytree structure, matching children BY NAME, not by flattened order.

    Orbax serializes NamedTuples (e.g. optax optimizer states) as dicts;
    `tree_unflatten(structure(template), tree_leaves(restored))` silently
    permutes leaves whenever a NamedTuple's field order differs from the
    dict's sorted-key iteration order. This walks the template instead:
    NamedTuples are reconstructed field-by-field from the restored dict,
    dicts by key, sequences by index, leaves as-is.
    """
    if restored is None:  # orbax stores empty containers (EmptyState) as None
        return template
    if hasattr(template, "_fields"):  # NamedTuple (optax states)
        fields = template._fields
        if isinstance(restored, dict):
            children = [restore_like(getattr(template, f), restored[f])
                        for f in fields]
        else:  # already a matching tuple
            children = [restore_like(getattr(template, f), r)
                        for f, r in zip(fields, restored)]
        return type(template)(*children)
    if isinstance(template, dict):
        return {k: restore_like(v, restored[k]) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [restore_like(t, r) for t, r in zip(template, restored)]
        return type(template)(seq) if isinstance(template, list) else tuple(seq)
    if template is None:
        return None
    return jax.numpy.asarray(restored)


def load_module_weights(
    path: str,
    module_prefix: str,
    template: Optional[Any] = None,
) -> Any:
    """Restore only a sub-tree of `params` by top-level key prefix.

    Mirrors `load_module_weights(module_name="geometry")`: a checkpoint of
    the whole system yields just the named module's params (e.g.
    `params["geometry"]`), for cross-stage surgery.
    """
    state = load_state(path, template)
    node = state["params"]
    for key in module_prefix.split("."):
        if key:
            node = node[key]
    return node


def save_simple(path: str, **arrays) -> None:
    """Texture-stage style flat checkpoint (`torch.save` dict parity)."""
    flat = {}
    for name, tree in arrays.items():
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        flat[f"__treedef__{name}"] = np.frombuffer(
            str(treedef).encode(), dtype=np.uint8
        )
        for i, leaf in enumerate(leaves):
            flat[f"{name}__{i}"] = np.asarray(leaf)
    np.savez(path, **flat)


def load_simple(path: str, templates: Dict[str, Any]) -> Dict[str, Any]:
    """Load a `save_simple` checkpoint back into template-structured trees."""
    z = np.load(path, allow_pickle=False)
    out = {}
    for name, template in templates.items():
        leaves, treedef = jax.tree_util.tree_flatten(template)
        restored = [
            jax.numpy.asarray(z[f"{name}__{i}"]) for i in range(len(leaves))
        ]
        out[name] = jax.tree_util.tree_unflatten(treedef, restored)
    return out
