"""FSDP (ZeRO-3 state sharding) and gradient accumulation for the decoder
train step.

FSDP here is the scaling-book recipe: shard every large TrainState leaf
(params, Adam moments, EMA shadow) over the data axis via NamedSharding and
let XLA's SPMD partitioner insert the all-gathers/reduce-scatters — no ZeRO
machinery of our own.  Because it is a pure LAYOUT change under jit, the
update must match the unsharded step to float tolerance; that is the main
pin.  Gradient accumulation scans microbatches with full-batch t/noise drawn
up front, so it too must reproduce the full-batch update.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

pytestmark = pytest.mark.slow

from kandinsky2_tpu.configs import CONFIG_2_1, create_model, deep_copy_config
from kandinsky2_tpu.parallel import fsdp_state_shardings, make_mesh
from kandinsky2_tpu.train.train_unclip import (
    make_fsdp_train_fn,
    make_spdp_train_fn,
    make_unclip_train_step,
)


def tiny_unet_and_cfg():
    cfg = deep_copy_config(CONFIG_2_1)
    mc = cfg["model_config"]
    mc.update(
        num_channels=32, num_res_blocks=1, channel_mult="1,2",
        attention_resolutions="32", num_head_channels=16, model_dim=32,
        text_encoder_in_dim1=16, text_encoder_in_dim2=32,
        image_encoder_in_dim=32, num_image_embs=2, inpainting=False,
    )
    return create_model(**mc, dtype=jnp.float32), cfg


def make_batch(mc, B=8, H=16):
    return {
        "image_latents": jax.random.normal(jax.random.PRNGKey(1), (B, H, H, 4)),
        "full_emb": jax.random.normal(
            jax.random.PRNGKey(2), (B, 7, mc["text_encoder_in_dim1"])
        ),
        "pooled_emb": jax.random.normal(
            jax.random.PRNGKey(3), (B, mc["text_encoder_in_dim2"])
        ),
        "image_emb": jax.random.normal(
            jax.random.PRNGKey(4), (B, mc["image_encoder_in_dim"])
        ),
    }


@pytest.fixture(scope="module")
def setup():
    unet, cfg = tiny_unet_and_cfg()
    mc = cfg["model_config"]
    batch = make_batch(mc)
    params = unet.init(
        jax.random.PRNGKey(0), batch["image_latents"], jnp.zeros((8,)),
        full_emb=batch["full_emb"], pooled_emb=batch["pooled_emb"],
        image_emb=batch["image_emb"],
    )["params"]
    return unet, cfg, batch, params


@pytest.fixture(scope="module")
def baseline_step(setup):
    """One plain (unsharded, no-accum) jitted step — the oracle."""
    unet, cfg, batch, params = setup
    tx = optax.adam(1e-3)
    init_state, train_step = make_unclip_train_step(
        unet, cfg["diffusion_config"], tx, ema_decay=0.999,
        schedule_sampler="loss-second-moment",
    )
    state, metrics = jax.jit(train_step)(
        init_state(params), batch, jax.random.PRNGKey(7)
    )
    return jax.device_get(state), jax.device_get(metrics)


def tree_close(a, b, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    worst = max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(flat_a, flat_b)
    )
    assert worst <= atol, f"max abs diff {worst} > {atol}"


def test_fsdp_matches_unsharded(setup, baseline_step):
    unet, cfg, batch, params = setup
    ref_state, ref_metrics = baseline_step
    mesh = make_mesh(8, model_parallel=1)
    tx = optax.adam(1e-3)
    init_fn, train_fn, _ = make_fsdp_train_fn(
        unet, cfg["diffusion_config"], tx, mesh, ema_decay=0.999,
        schedule_sampler="loss-second-moment", min_elems=1 << 10,
    )
    state = init_fn(jax.tree_util.tree_map(jnp.array, params))

    # the state actually is sharded: some leaf has 'data' in its spec and
    # a strictly smaller addressable shard than the full array
    sharded = [
        p for p in jax.tree_util.tree_leaves(state.params)
        if "data" in str(p.sharding.spec)
    ]
    assert sharded, "no parameter leaf ended up FSDP-sharded"
    big = max(sharded, key=lambda p: p.size)
    local = big.addressable_shards[0].data
    assert local.size * 8 == big.size, (
        f"expected 1/8 shards, got local {local.shape} of {big.shape}"
    )
    # Adam moments shard too — the ZeRO part that actually saves memory
    opt_sharded = [
        p for p in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(p, "sharding") and "data" in str(p.sharding.spec)
    ]
    assert opt_sharded, "no optimizer leaf ended up FSDP-sharded"

    state, metrics = train_fn(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert abs(float(metrics["loss"]) - float(ref_metrics["loss"])) < 1e-5
    tree_close(jax.device_get(state.params), ref_state.params, 2e-5)
    tree_close(jax.device_get(state.ema_params), ref_state.ema_params, 2e-5)


def test_fsdp_tp_compose(setup, baseline_step):
    """TP on the model axis x FSDP on the data axis, (4, 2) mesh."""
    unet, cfg, batch, params = setup
    ref_state, ref_metrics = baseline_step
    mesh = make_mesh(8, model_parallel=2)
    tx = optax.adam(1e-3)
    init_fn, train_fn, _ = make_fsdp_train_fn(
        unet, cfg["diffusion_config"], tx, mesh, ema_decay=None,
        schedule_sampler="loss-second-moment",
        tp=True, min_elems=1 << 10, tp_min_size=64,
    )
    state = init_fn(jax.tree_util.tree_map(jnp.array, params))
    both = [
        p for p in jax.tree_util.tree_leaves(state.params)
        if "model" in str(p.sharding.spec) and "data" in str(p.sharding.spec)
    ]
    assert both, "no leaf carries both the TP and the FSDP shard"
    state, metrics = train_fn(state, batch, jax.random.PRNGKey(7))
    assert abs(float(metrics["loss"]) - float(ref_metrics["loss"])) < 1e-5
    tree_close(jax.device_get(state.params), ref_state.params, 2e-5)


def test_accum_matches_full_batch(setup, baseline_step):
    unet, cfg, batch, params = setup
    ref_state, ref_metrics = baseline_step
    tx = optax.adam(1e-3)
    init_state, train_step = make_unclip_train_step(
        unet, cfg["diffusion_config"], tx, ema_decay=0.999,
        schedule_sampler="loss-second-moment", accum_steps=4,
    )
    state, metrics = jax.jit(train_step)(
        init_state(jax.tree_util.tree_map(jnp.array, params)),
        batch, jax.random.PRNGKey(7),
    )
    assert abs(float(metrics["loss"]) - float(ref_metrics["loss"])) < 1e-5
    tree_close(jax.device_get(state.params), ref_state.params, 2e-5)
    # the loss-aware sampler saw the SAME per-example losses in the SAME
    # order (flattening inverted the microbatch split exactly)
    tree_close(
        jax.device_get(state.sampler_state), ref_state.sampler_state, 1e-5
    )


def test_accum_rejects_indivisible(setup):
    unet, cfg, batch, params = setup
    tx = optax.adam(1e-3)
    init_state, train_step = make_unclip_train_step(
        unet, cfg["diffusion_config"], tx, ema_decay=None, accum_steps=3,
    )
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(train_step)(
            init_state(params), batch, jax.random.PRNGKey(7)
        )


def test_accum_inside_spdp(setup):
    """accum composes with the shard_map'ed spatial x data step."""
    from jax.sharding import Mesh

    unet, cfg, batch, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))
    tx = optax.adam(1e-3)
    init_state, train_fn = make_spdp_train_fn(
        unet, cfg["diffusion_config"], tx, mesh, ema_decay=None,
        accum_steps=2,
    )
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    state, metrics = train_fn(
        init_state(copy(params)), batch, jax.random.PRNGKey(7)
    )
    assert np.isfinite(float(metrics["loss"]))
    # updated params stay bitwise replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
