"""Fused Pallas GroupNorm (ops/group_norm.py) vs the literal torch-GroupNorm
oracle: values, FiLM folding, swish, gradients, and routing edges.  Runs the
kernels in interpreter mode on the CPU backend (same policy as the flash
attention tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kandinsky2_tpu.ops.group_norm import (
    pallas_group_norm,
    pallas_group_norm_ok,
    _pick_tn,
)


def _oracle(x, scale, bias, g, eps, film=None, swish=0.0):
    """torch.nn.GroupNorm semantics via the grouped reshape, plus the
    ResBlock FiLM + SiLU chain."""
    B, C = x.shape[0], x.shape[-1]
    y = x.astype(np.float64).reshape(B, -1, g, C // g)
    mean = y.mean(axis=(1, 3), keepdims=True)
    var = y.var(axis=(1, 3), keepdims=True)
    y = (y - mean) / np.sqrt(var + eps)
    y = y.reshape(x.shape) * scale + bias
    if film is not None:
        fs, fb = film
        y = y * (1 + fs[:, None, None, :]) + fb[:, None, None, :]
    if swish:
        y = y / (1 + np.exp(-swish * y)) if swish != 1.0 else y / (
            1 + np.exp(-y))
    return y


@pytest.mark.parametrize("swish", [0.0, 1.0])
def test_values_match_oracle(swish):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 8, 128).astype(np.float32) * 2 + 0.7
    scale = rng.randn(128).astype(np.float32)
    bias = rng.randn(128).astype(np.float32)
    got = np.asarray(
        pallas_group_norm(jnp.asarray(x), jnp.asarray(scale),
                          jnp.asarray(bias), 32, 1e-5, swish=swish)
    )
    want = _oracle(x, scale, bias, 32, 1e-5, swish=swish)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_film_fold_matches_unfused_chain():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 8, 128).astype(np.float32)
    scale = rng.randn(128).astype(np.float32)
    bias = rng.randn(128).astype(np.float32)
    fs = (0.5 * rng.randn(2, 128)).astype(np.float32)
    fb = rng.randn(2, 128).astype(np.float32)
    got = np.asarray(
        pallas_group_norm(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32, 1e-5,
            swish=1.0, film=(jnp.asarray(fs), jnp.asarray(fb)),
        )
    )
    want = _oracle(x, scale, bias, 32, 1e-5, film=(fs, fb), swish=1.0)
    np.testing.assert_allclose(got, want, rtol=4e-5, atol=4e-5)


def test_bf16_activations_fp32_math():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 256).astype(np.float32) * 5).astype(
        jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    y = pallas_group_norm(x, scale, bias, 32, 1e-5)
    assert y.dtype == jnp.bfloat16
    want = _oracle(np.asarray(x, np.float32), np.ones(256, np.float32),
                   np.zeros(256, np.float32), 32, 1e-5)
    np.testing.assert_allclose(np.asarray(y, np.float32), want, atol=0.06)


def test_gradients_match_xla():
    """custom_vjp backward (XLA recompute) == autodiff through the plain
    formulation, for x, scale, bias AND film."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 4, 128).astype(np.float32))
    scale = jnp.asarray(rng.randn(128).astype(np.float32))
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    fs = jnp.asarray((0.1 * rng.randn(2, 128)).astype(np.float32))
    fb = jnp.asarray(rng.randn(2, 128).astype(np.float32))

    def fused_loss(x, s, b, fs, fb):
        return (pallas_group_norm(x, s, b, 32, 1e-5, swish=1.0,
                                  film=(fs, fb)) ** 2).sum()

    def plain_loss(x, s, b, fs, fb):
        B, C = x.shape[0], x.shape[-1]
        y = x.reshape(B, -1, 32, C // 32)
        mean = y.mean(axis=(1, 3), keepdims=True)
        var = y.var(axis=(1, 3), keepdims=True)
        y = ((y - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
        y = y * s + b
        y = y * (1 + fs[:, None, None, :]) + fb[:, None, None, :]
        return (jax.nn.silu(y) ** 2).sum()

    got = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(x, scale, bias, fs, fb)
    want = jax.grad(plain_loss, argnums=(0, 1, 2, 3, 4))(x, scale, bias, fs, fb)
    for gg, gw in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-4, atol=2e-4)


def test_routing_rejects_unfriendly_shapes():
    ok = jnp.zeros((2, 8, 8, 128))
    assert pallas_group_norm_ok(ok, 32)
    assert not pallas_group_norm_ok(jnp.zeros((2, 8, 8, 96)), 32)  # C%128
    assert not pallas_group_norm_ok(jnp.zeros((2, 128)), 32)  # ndim
    assert not pallas_group_norm_ok(jnp.zeros((2, 7, 1, 128)), 32)  # N=7


def test_pick_tn_divides_and_caps():
    assert 9216 % _pick_tn(9216, 384, 2) == 0
    tn = _pick_tn(9216, 1536, 4)
    assert tn and 9216 % tn == 0 and tn * 1536 * 4 <= 2 * 1024 * 1024
    assert _pick_tn(7, 128, 4) is None


def test_groupnorm32_module_routes_to_pallas():
    """GroupNorm32 with an eligible shape produces identical values whether
    the pallas or xla impl is selected."""
    from kandinsky2_tpu.models.layers import GroupNorm32, set_norm_impl

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    m = GroupNorm32(num_groups=32, eps=1e-5, swish=1.0)
    params = m.init(jax.random.PRNGKey(0), x)
    fs = jnp.asarray((0.3 * rng.randn(2, 1, 1, 128)).astype(np.float32))
    fb = jnp.asarray(rng.randn(2, 1, 1, 128).astype(np.float32))
    try:
        set_norm_impl("pallas")
        y_p = m.apply(params, x, film=(fs, fb))
        set_norm_impl("xla")
        y_x = m.apply(params, x, film=(fs, fb))
    finally:
        set_norm_impl("auto")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=2e-5, atol=2e-5)
