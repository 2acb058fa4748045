"""Mixed-precision policy helpers (reference: kandinsky2/model/fp16_util.py).

The torch reference converts conv torsos to fp16 and keeps flattened fp32
master params for the optimizer (fp16_util.py:9-78).  The TPU-native
equivalent: parameters live in fp32 (the optimizer's master copy by
construction), modules compute in bf16 via their ``dtype`` field, and these
helpers cover the remaining conversions:

* ``cast_params`` / ``cast_torso`` — storage-precision casts (e.g. serving a
  bf16 copy while training keeps fp32 masters)
* ``fp32_master_optimizer`` — wrap an optax transform so updates are computed
  against fp32 masters even when the live params are bf16.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def cast_params(params, dtype):
    """Cast every floating leaf (torch fp16_util converts module weights)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )


def cast_torso(params, dtype, keep_fp32: Callable[[str], bool] = None):
    """Cast with per-leaf exceptions, mirroring convert_module_to_f16's
    conv-only policy (fp16_util.py:9-26): norms (scale/bias leaves) stay fp32
    by default."""
    if keep_fp32 is None:
        keep_fp32 = lambda name: name.endswith("scale") or name.endswith("bias")

    def cast(path, a):
        name = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        if not jnp.issubdtype(a.dtype, jnp.floating) or keep_fp32(name):
            return a
        return a.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def fp32_master_optimizer(tx: optax.GradientTransformation):
    """Keep fp32 master copies inside the optimizer state when live params are
    half precision (the make_master_params pattern, fp16_util.py:29-52):
    grads upcast to fp32, update computed on masters, live params re-cast."""

    def init(params):
        masters = cast_params(params, jnp.float32)
        return (masters, tx.init(masters))

    def update(grads, state, params=None):
        masters, inner = state
        grads32 = cast_params(grads, jnp.float32)
        updates32, inner = tx.update(grads32, inner, masters)
        masters = optax.apply_updates(masters, updates32)
        # emit updates in the live params' dtype: new_live - old_live
        def delta(m, p):
            return m.astype(p.dtype) - p

        if params is None:
            raise ValueError("fp32_master_optimizer needs params at update()")
        updates = jax.tree_util.tree_map(delta, masters, params)
        return updates, (masters, inner)

    return optax.GradientTransformation(init, update)
