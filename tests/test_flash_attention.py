"""Pallas flash attention vs the XLA einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky2_tpu.ops.attention import _xla_attention
from kandinsky2_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "B,T,S,H,d",
    [
        (2, 128, 128, 4, 64),   # self-attention
        (1, 300, 387, 2, 64),   # ragged lengths (padding paths)
        (1, 256, 256, 1, 512),  # MoVQ-style single fat head
    ],
)
def test_flash_matches_xla(B, T, S, H, d):
    rng = np.random.RandomState(0)
    q = rng.randn(B, T, H, d).astype(np.float32)
    k = rng.randn(B, S, H, d).astype(np.float32)
    v = rng.randn(B, S, H, d).astype(np.float32)
    expected = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    got = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_bf16():
    rng = np.random.RandomState(1)
    q = rng.randn(1, 130, 2, 64).astype(np.float32)
    k = rng.randn(1, 70, 2, 64).astype(np.float32)
    v = rng.randn(1, 70, 2, 64).astype(np.float32)
    expected = _xla_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16),
    ).astype(jnp.float32)
    got = flash_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), block_q=64, block_k=64, interpret=True,
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-2)


@pytest.mark.parametrize(
    "B,T,S,H,d,bq,bk",
    [
        (1, 64, 48, 2, 32, 32, 32),    # basic
        (1, 300, 387, 2, 64, 128, 128),  # ragged (bwd padding masks)
        (2, 128, 128, 1, 256, 64, 64),   # MoVQ-style fat head
    ],
)
def test_flash_attention_grad(B, T, S, H, d, bq, bk):
    """The Pallas backward kernels (dKV + dQ) match the XLA reference
    gradients, including through q/kv padding."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, T, H, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, d).astype(np.float32))
    # non-uniform cotangent so dq/dk/dv all see structure
    w = jnp.asarray(rng.randn(B, T, H, d).astype(np.float32))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, bq, bk, True) * w).sum()

    def loss_xla(q, k, v):
        return (_xla_attention(q, k, v) * w).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name}"
        )


def test_flash_attention_grad_bf16():
    rng = np.random.RandomState(4)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32), jnp.bfloat16)
    q, k, v = mk(1, 130, 2, 64), mk(1, 70, 2, 64), mk(1, 70, 2, 64)

    gf = jax.grad(
        lambda q, k, v: flash_attention(q, k, v, 64, 64, True)
        .astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: _xla_attention(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-2
        )
