"""Mixed-precision helpers (the fp16_util inventory row)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from kandinsky2_tpu.train.precision import (
    cast_params,
    cast_torso,
    fp32_master_optimizer,
)


def test_cast_torso_keeps_norms_fp32():
    params = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 4)), "bias": jnp.ones((4,))},
        "norm": {"scale": jnp.ones((4,))},
        "step": jnp.zeros((), jnp.int32),
    }
    out = cast_torso(params, jnp.bfloat16)
    assert out["conv"]["kernel"].dtype == jnp.bfloat16
    assert out["conv"]["bias"].dtype == jnp.float32  # bias kept fp32
    assert out["norm"]["scale"].dtype == jnp.float32
    assert out["step"].dtype == jnp.int32


def test_fp32_master_optimizer_accumulates_small_updates():
    # bf16 cannot represent 1.0 + 1e-3 steps; fp32 masters must accumulate
    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    tx = fp32_master_optimizer(optax.sgd(1e-3))
    state = tx.init(params)
    g = {"w": jnp.ones((4,), jnp.bfloat16)}
    for _ in range(8):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    masters = state[0]["w"]
    np.testing.assert_allclose(np.asarray(masters), 1.0 - 8e-3, atol=1e-5)
    # live params follow the master trajectory in bf16 resolution
    assert float(params["w"][0]) < 1.0
