"""Exponential moving average of a parameter pytree.

Reference: kandinsky2/train_utils/ema.py:5-66 (shadow buffers with a
warmup-adjusted decay min(decay, (1+n)/(10+n))).  Here the EMA is a pure
pytree op that lives inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay: float, num_updates=None):
    """One EMA step.  ``num_updates`` (traced int) enables the warmup schedule
    min(decay, (1+n)/(10+n)); pass None for a fixed decay."""
    if num_updates is not None:
        n = jnp.asarray(num_updates, jnp.float32)
        decay = jnp.minimum(jnp.asarray(decay, jnp.float32), (1.0 + n) / (10.0 + n))
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )
