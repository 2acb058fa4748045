"""Mixed-precision helpers (the fp16_util inventory row)."""

import functools
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


def _grouped_oracle(x, scale, bias, g, eps):
    """torch.nn.GroupNorm semantics via the literal grouped reshape."""
    B, C = x.shape[0], x.shape[-1]
    y = x.astype(np.float32).reshape(B, -1, g, C // g)
    mean = y.mean(axis=(1, 3), keepdims=True)
    var = y.var(axis=(1, 3), keepdims=True)
    y = (y - mean) / np.sqrt(var + eps)
    return y.reshape(x.shape) * scale + bias


def test_group_norm_matches_grouped_reshape_oracle():
    """The reshape-free formulation (per-channel reductions + [B,C]->[B,G]
    combine; no full-tensor grouped relayout) must equal the literal torch
    GroupNorm computation."""
    from kandinsky2_tpu.models.layers import GroupNorm32

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 64).astype(np.float32) * 3 + 1.5
    m = GroupNorm32(num_groups=32, eps=1e-5)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    scale = rng.randn(64).astype(np.float32)
    bias = rng.randn(64).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = _grouped_oracle(x, scale, bias, 32, 1e-5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_group_norm_stats_mode_close_to_full():
    """'stats' keeps fp32 statistics but normalizes in the activation dtype;
    on bf16 activations it must stay within bf16 rounding of 'full'."""
    from kandinsky2_tpu.models.layers import GroupNorm32, set_norm_precision

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32)).astype(
        jnp.bfloat16)
    m = GroupNorm32(num_groups=32, eps=1e-5)
    params = m.init(jax.random.PRNGKey(0), x)
    full = np.asarray(m.apply(params, x), np.float32)
    set_norm_precision("stats")
    try:
        stats = np.asarray(m.apply(params, x), np.float32)
    finally:
        set_norm_precision("full")
    assert np.isfinite(stats).all()
    # bf16 has ~2-3 significant decimal digits; outputs are O(1)
    np.testing.assert_allclose(stats, full, atol=0.1)
    assert np.abs(stats - full).mean() < 0.02


def test_group_norm_x_barrier_knob_is_parity_neutral():
    """set_norm_x_barrier only changes whether XLA may share the fp32 upcast
    between the stats and normalize passes — same arithmetic, bitwise-equal
    outputs."""
    from kandinsky2_tpu.models.layers import GroupNorm32, set_norm_x_barrier

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32)).astype(
        jnp.bfloat16)
    m = GroupNorm32(num_groups=32, eps=1e-5)
    params = m.init(jax.random.PRNGKey(0), x)
    with_bar = np.asarray(m.apply(params, x), np.float32)
    set_norm_x_barrier(False)
    try:
        without = np.asarray(m.apply(params, x), np.float32)
    finally:
        set_norm_x_barrier(True)
    np.testing.assert_array_equal(with_bar, without)


def _grouped_oracle64(x, scale, bias, g, eps):
    """fp64 grouped-reshape oracle (precision-bound tests)."""
    B, C = x.shape[0], x.shape[-1]
    y = x.astype(np.float64).reshape(B, -1, g, C // g)
    mean = y.mean(axis=(1, 3), keepdims=True)
    var = y.var(axis=(1, 3), keepdims=True)
    y = (y - mean) / np.sqrt(var + eps)
    return (y.reshape(x.shape) * scale + bias).astype(np.float32)


def test_group_norm_one_pass_large_mean_bound():
    """The single-stats-pass E[x²]−mean² form cancels as ε_f32·√N·(mean/std)²;
    the documented bound (layers.py) expects ~4e-3 relative variance error at
    |mean|/std = 100 — verify against an fp64 oracle (outputs ~unit-normal,
    so atol bounds the relative error)."""
    from kandinsky2_tpu.models.layers import GroupNorm32

    rng = np.random.RandomState(7)
    x = (rng.randn(2, 8, 8, 64) + 100.0).astype(np.float32)
    scale = np.ones(64, np.float32)
    bias = np.zeros(64, np.float32)
    m = GroupNorm32(num_groups=32, eps=1e-5)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    want = _grouped_oracle64(x, scale, bias, 32, 1e-5)
    np.testing.assert_allclose(got, want, atol=3e-2)


def test_group_norm_sharded_two_pass_immune_to_large_mean():
    """The sharded (axis_name) path uses the exact two-pass E[(x−mean)²]
    variance: it must stay accurate even at |mean|/std = 3e3, where the
    one-pass form would lose ~half its significant digits (ADVICE r4)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from kandinsky2_tpu.models.layers import GroupNorm32

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("sp",))
    rng = np.random.RandomState(8)
    x = (rng.randn(2, 8, 8, 64) + 3000.0).astype(np.float32)
    scale = rng.rand(64).astype(np.float32) + 0.5
    bias = rng.randn(64).astype(np.float32)
    m = GroupNorm32(num_groups=32, eps=1e-5, axis_name="sp")
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(None, "sp", None, None), out_specs=P(None, "sp", None, None),
        check_vma=False)
    def sharded_norm(xs):
        return m.apply(params, xs)

    got = np.asarray(sharded_norm(jnp.asarray(x)))
    want = _grouped_oracle64(x, scale, bias, 32, 1e-5)
    # residual ~5e-4 is fp32 INPUT quantization (ulp(3000) ≈ 2e-4), not
    # cancellation — the one-pass form here would be off by O(1)
    np.testing.assert_allclose(got, want, atol=2e-3)
