"""Atomic checkpoint save/resume for parameter pytrees (safetensors).

The reference saves bare ``torch.save(state_dict)`` every N steps with no
resume logic (trainer_2_1_uclip.py:78-79).  Here checkpoints are flat
safetensors written atomically (tmp + rename) with a sidecar step counter, so
a crashed run resumes exactly.
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
