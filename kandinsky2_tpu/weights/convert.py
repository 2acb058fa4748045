"""Torch checkpoint → flax parameter pytree conversion.

Every flax module in this framework names its submodules exactly like the
torch reference's state_dict paths (dots included), so conversion is purely
mechanical:

    flax path  a/b/c + leaf "kernel"|"scale"|"embedding"  <-  torch "a.b.c.weight"
    flax path  a/b/c + leaf "bias"                        <-  torch "a.b.c.bias"
    flax path  a/b   + any other leaf name                <-  torch "a.b.<leaf>"

with the layout transforms:

    conv2d  OIHW   -> HWIO
    conv1d  OIW(1) -> IO (1x1 convs become Dense)
    linear  OI     -> IO
    norm / bias / embedding / plain parameter: unchanged

This module is the core of the checkpoint-ingestion deliverable (SURVEY §5:
torch .ckpt/.bin -> jax pytrees); it takes plain ``dict[str, numpy array]``
state dicts so loading (torch.load / safetensors) stays at the edges.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

import jax
import numpy as np

WEIGHT_LEAVES = ("kernel", "scale", "embedding")


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module level
    return t.detach().cpu().float().numpy()


def _transform(torch_arr: np.ndarray, leaf_name: str, flax_shape) -> np.ndarray:
    a = np.asarray(torch_arr)
    if leaf_name == "kernel":
        if a.ndim == 4 and len(flax_shape) == 2:
            # 1x1 conv2d represented as Dense: OI11 -> IO
            if a.shape[2] != 1 or a.shape[3] != 1:
                raise ValueError(f"conv->Dense needs 1x1 kernel, got {a.shape}")
            a = a[:, :, 0, 0].T
        elif a.ndim == 4:  # conv2d OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 3:  # conv1d OIW -> Dense IO (kernel width must be 1)
            if a.shape[-1] != 1:
                raise ValueError(f"conv1d kernel width != 1: {a.shape}")
            a = a[:, :, 0].T
        elif a.ndim == 2:  # linear OI -> IO
            a = a.T
    if tuple(a.shape) != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch for {leaf_name}: torch {a.shape} vs flax {tuple(flax_shape)}"
        )
    return a


def torch_key_for(path: tuple[str, ...]) -> str:
    """Map a flax param path (tuple of names, leaf last) to a torch key."""
    *parents, leaf = path
    if leaf in WEIGHT_LEAVES:
        return ".".join(parents + ["weight"])
    if leaf == "bias":
        return ".".join(parents + ["bias"])
    return ".".join(list(parents) + [leaf])


def convert_state_dict(
    state_dict: Mapping[str, object],
    flax_params,
    *,
    prefix: str = "",
    rename: Optional[Callable[[str], str]] = None,
    strict: bool = True,
    dtype=np.float32,
):
    """Fill ``flax_params``-shaped pytree from a torch ``state_dict``.

    ``prefix`` is prepended to every torch key (e.g. "encoder." when loading a
    submodule).  ``rename`` optionally rewrites torch keys for models whose
    torch layout differs structurally.  With ``strict``, missing keys raise.
    """
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    out = {}
    used = set()
    missing = []
    for keypath, leaf in flat:
        names = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        tk = prefix + torch_key_for(names)
        if rename is not None:
            tk = rename(tk)
        if tk not in state_dict:
            missing.append(tk)
            out[names] = np.asarray(leaf)
            continue
        arr = _transform(_to_numpy(state_dict[tk]), names[-1], leaf.shape)
        out[names] = arr.astype(dtype)
        used.add(tk)
    if strict and missing:
        raise KeyError(f"missing torch keys ({len(missing)}): {missing[:10]} ...")

    # rebuild nested dict
    tree = {}
    for names, arr in out.items():
        node = tree
        for n in names[:-1]:
            node = node.setdefault(n, {})
        node[names[-1]] = arr
    return tree


def unused_torch_keys(state_dict, flax_params, *, prefix: str = "", rename=None):
    """Diagnostic: torch keys not consumed by the flax tree."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    consumed = set()
    for keypath, _ in flat:
        names = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        tk = prefix + torch_key_for(names)
        if rename is not None:
            tk = rename(tk)
        consumed.add(tk)
    return [k for k in state_dict if k not in consumed]
