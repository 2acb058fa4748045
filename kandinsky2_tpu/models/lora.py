"""LoRA adapters as weight-tree transforms.

The reference applies rank-4 LoRA attention processors to the 2.2 decoder and
prior via diffusers (notebooks/lora_decoder.ipynb).  TPU-native equivalent:
LoRA weights are (down, up) factor pairs keyed by the target kernel's tree
path; ``merge_lora`` folds W += scale * down @ up into the base parameters so
the jitted graph is unchanged (zero runtime cost), and ``unmerge_lora``
reverses it.  ``init_lora`` creates trainable factors for fine-tuning.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set(tree[path[0]], path[1:], value)}


def default_target(path: tuple[str, ...], leaf) -> bool:
    """Attention projections (the reference LoRA targets: diffusers
    LoRAAttnAddedKVProcessor touches to_q/to_k/to_v/add_k/add_v/to_out)."""
    name = "/".join(path)
    return path[-1] == "kernel" and any(
        m in name
        for m in ("to_q", "to_k", "to_v", "add_k_proj", "add_v_proj",
                  "to_out.0", "qkv", "proj_out", "attn1.")
    )


def init_lora(
    params,
    rng: jax.Array,
    rank: int = 4,
    target: Callable = default_target,
) -> Dict[tuple, dict]:
    """Create {path: {down [in,r], up [r,out]}} factor pairs for every
    targeted 2-D kernel."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    loras = {}
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        if leaf.ndim == 2 and target(path, leaf):
            rng, k = jax.random.split(rng)
            loras[path] = {
                "down": jax.random.normal(k, (leaf.shape[0], rank), jnp.float32)
                / leaf.shape[0] ** 0.5,
                "up": jnp.zeros((rank, leaf.shape[1]), jnp.float32),
            }
    return loras


def merge_lora(params, loras: Dict[tuple, dict], scale: float = 1.0):
    """W += scale * down @ up, returning a new parameter tree."""
    out = params
    for path, f in loras.items():
        w = _get(out, path)
        delta = (f["down"].astype(jnp.float32) @ f["up"].astype(jnp.float32))
        out = _set(out, path, (w.astype(jnp.float32) + scale * delta).astype(w.dtype))
    return out


def unmerge_lora(params, loras: Dict[tuple, dict], scale: float = 1.0):
    return merge_lora(params, loras, -scale)
