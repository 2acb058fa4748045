"""Realistic-scale random initialization for bf16-robustness testing.

Random flax defaults (lecun_normal) under-stress bf16: published checkpoints
have torch-default init statistics — kaiming_uniform(a=sqrt(5)) kernels and
N(0,1) embeddings (reference kandinsky2/model/nn.py uses torch module
defaults; zero_module outputs stay zero).  ``torch_init_stats`` resamples a
flax parameter tree to those per-layer statistics so the full pipeline can be
driven in bf16 with activation magnitudes matching a real checkpoint's init —
catching overflow/underflow bugs that tame random weights cannot
(VERDICT round-1 item 10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fan_in(shape) -> int:
    # flax conventions: Dense (in, out); Conv (kh, kw, in, out)
    if len(shape) == 1:
        return int(shape[0])
    return int(np.prod(shape[:-1]))


def torch_init_stats(params, rng):
    """Resample every kernel/embedding to torch-default init statistics.

    * ``kernel`` -> U(-b, b) with b = 1/sqrt(fan_in)  (kaiming_uniform a=√5)
    * ``embedding`` -> N(0, 1)                         (torch nn.Embedding)
    * all-zero leaves stay zero (the reference's zero_module output convs)
    * norms scales/biases and other leaves unchanged
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat))
    out = []
    for (path, leaf), key in zip(flat, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating) or arr.size == 0:
            out.append(leaf)
            continue
        if name == "kernel" and arr.ndim >= 2:
            if jnp.all(arr == 0):  # zero_module outputs stay zero
                out.append(leaf)
                continue
            bound = 1.0 / np.sqrt(_fan_in(arr.shape))
            new = jax.random.uniform(
                key, arr.shape, jnp.float32, -bound, bound
            )
            out.append(new.astype(arr.dtype))
        elif name == "embedding":
            new = jax.random.normal(key, arr.shape, jnp.float32)
            out.append(new.astype(arr.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, [l for l in out])
