"""Atomic checkpoint save/resume (safetensors).

The reference saves bare ``torch.save(state_dict)`` every N steps with no
resume logic (trainer_2_1_uclip.py:78-79).  Here there are two levels:

* ``save_checkpoint``/``load_checkpoint`` — params-only weight export, a
  flat name->array file (what you ship for inference).
* ``save_train_state``/``restore_train_state`` — the FULL ``TrainState``
  pytree (params, optimizer state, EMA shadow, loss-aware sampler history,
  step counter) serialized leaf-by-leaf, so a crashed run resumes
  bit-exactly (verified by tests/test_checkpoint_resume.py).

All writes are atomic (tmp + rename) with a ``latest`` sidecar marker.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
from safetensors.numpy import load_file, save_file


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/" if prefix or True else k))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_checkpoint(path: str, params, step: int, extra: Optional[dict] = None):
    """Write ``<path>/ckpt_<step>.safetensors`` atomically + ``latest`` marker."""
    os.makedirs(path, exist_ok=True)
    flat = _flatten(jax.device_get(params))
    fname = os.path.join(path, f"ckpt_{step:08d}.safetensors")
    tmp = fname + ".tmp"
    save_file(flat, tmp, metadata={"step": str(step), **(extra or {})})
    os.replace(tmp, fname)
    marker = os.path.join(path, "latest")
    with open(marker + ".tmp", "w") as f:
        json.dump({"step": step, "file": os.path.basename(fname)}, f)
    os.replace(marker + ".tmp", marker)
    return fname


def latest_checkpoint(path: str):
    marker = os.path.join(path, "latest")
    if not os.path.exists(marker):
        return None, 0
    meta = json.load(open(marker))
    return os.path.join(path, meta["file"]), int(meta["step"])


def load_checkpoint(fname: str):
    return _unflatten(load_file(fname))


def save_train_state(path: str, state, step: Optional[int] = None) -> str:
    """Atomically write the FULL train state (every array leaf of the pytree:
    params, opt_state, EMA, sampler history, step) to
    ``<path>/state_<step>.safetensors`` + ``latest_state`` marker."""
    if step is None:
        step = int(jax.device_get(state.step))
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(jax.device_get(state))
    flat = {f"leaf_{i:06d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    fname = os.path.join(path, f"state_{step:08d}.safetensors")
    tmp = fname + ".tmp"
    save_file(flat, tmp, metadata={"step": str(step), "n_leaves": str(len(flat))})
    os.replace(tmp, fname)
    marker = os.path.join(path, "latest_state")
    with open(marker + ".tmp", "w") as f:
        json.dump({"step": step, "file": os.path.basename(fname)}, f)
    os.replace(marker + ".tmp", marker)
    return fname


def latest_train_state(path: str):
    """(filename, step) of the newest full-state checkpoint, or (None, 0)."""
    marker = os.path.join(path, "latest_state")
    if not os.path.exists(marker):
        return None, 0
    meta = json.load(open(marker))
    return os.path.join(path, meta["file"]), int(meta["step"])


def restore_train_state(fname: str, template_state):
    """Restore a full train state into ``template_state``'s structure (the
    value returned by ``init_state(params)``) — leaves are replaced
    positionally, dtypes preserved from disk.  Raises if the saved leaf count
    does not match the template (structure drift)."""
    flat = load_file(fname)
    treedef = jax.tree_util.tree_structure(template_state)
    n = treedef.num_leaves
    if len(flat) != n:
        raise ValueError(
            f"checkpoint {fname} has {len(flat)} leaves but the current "
            f"TrainState has {n} — optimizer/model structure changed since "
            "this state was saved"
        )
    leaves = [flat[f"leaf_{i:06d}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
