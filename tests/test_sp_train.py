"""Spatial x data parallel training (train_unclip.make_spdp_train_fn).

Row-sharded training composes the SP UNet path (halo-exchange convs, psum'd
norm statistics, gathered-KV attention — parallel/spatial.py) with sharded
examples on a (data, sp) mesh inside one shard_map'ed train step.  Gradient
exactness of the SP machinery itself is pinned against the single-device
gradient in tests/test_spatial_parallel.py; here we pin the train-step
wiring: finite hybrid loss, loss-aware sampler updates, EMA, and — the part
that silently breaks first — that the updated params remain bitwise
replicated across every device (grads were correctly globalized).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from kandinsky2_tpu.configs import CONFIG_2_1, create_model, deep_copy_config
from kandinsky2_tpu.train.train_unclip import make_spdp_train_fn

pytestmark = pytest.mark.slow


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


@pytest.fixture(scope="module")
def spdp_run():
    """Two SP x DP train steps on a (data=2, sp=4) mesh; shared by the
    assertions below (one compile)."""
    from jax.sharding import Mesh

    unet, cfg = tiny_unet_and_cfg()
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))

    B, H = 4, 16
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (B, H, H, 4))
    mc = cfg["model_config"]
    batch = {
        "image_latents": lat,
        "full_emb": jax.random.normal(
            jax.random.PRNGKey(1), (B, 7, mc["text_encoder_in_dim1"])
        ),
        "pooled_emb": jax.random.normal(
            jax.random.PRNGKey(2), (B, mc["text_encoder_in_dim2"])
        ),
        "image_emb": jax.random.normal(
            jax.random.PRNGKey(3), (B, mc["image_encoder_in_dim"])
        ),
    }
    t = jnp.zeros((B,))
    params = unet.init(
        jax.random.PRNGKey(4), lat, t,
        full_emb=batch["full_emb"], pooled_emb=batch["pooled_emb"],
        image_emb=batch["image_emb"],
    )["params"]

    tx = optax.adam(1e-3)
    init_state, train_fn = make_spdp_train_fn(
        unet, cfg["diffusion_config"], tx, mesh,
        schedule_sampler="loss-second-moment", ema_decay=0.999,
    )
    # the step donates its TrainState (the whole point of the SP path is
    # fitting big states) — hand it copies, keep the originals for asserts
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    state1, metrics1 = train_fn(
        init_state(copy(params)), batch, jax.random.PRNGKey(7)
    )
    state1b, metrics1b = train_fn(
        init_state(copy(params)), batch, jax.random.PRNGKey(7)
    )
    state2, metrics2 = train_fn(copy(state1), batch, jax.random.PRNGKey(7))
    return dict(
        params=params, state1=state1, state2=state2,
        metrics1=metrics1, metrics1b=metrics1b, metrics2=metrics2,
        state1b=state1b,
    )


def test_spdp_step_finite_and_advances(spdp_run):
    m1, m2 = spdp_run["metrics1"], spdp_run["metrics2"]
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, v)
    assert int(spdp_run["state1"].step) == 1
    assert int(spdp_run["state2"].step) == 2
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        spdp_run["params"], spdp_run["state1"].params,
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_spdp_step_deterministic(spdp_run):
    """Same state + batch + rng => identical metrics and params."""
    np.testing.assert_array_equal(
        np.asarray(spdp_run["metrics1"]["loss"]),
        np.asarray(spdp_run["metrics1b"]["loss"]),
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(spdp_run["state1"].params),
        jax.tree_util.tree_leaves(spdp_run["state1b"].params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spdp_params_stay_replicated(spdp_run):
    """Every device must hold the identical updated params — the invariant
    that breaks if the sp/data gradient globalization is wrong (each device
    would then apply a different update and the 'replicated' output would be
    silently divergent)."""
    leaves = jax.tree_util.tree_leaves(spdp_run["state2"].params)
    # spot-check a spread of leaves incl. first/last
    for leaf in [leaves[0], leaves[len(leaves) // 2], leaves[-1]]:
        shards = leaf.addressable_shards
        assert len(shards) == 8
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(np.asarray(s.data), ref)


def test_spdp_ema_and_sampler_state(spdp_run):
    s2 = spdp_run["state2"]
    assert s2.ema_params is not None
    # loss-aware history received both steps' (t, loss) batches
    assert int(jnp.sum(s2.sampler_state.counts)) > 0
    for leaf in jax.tree_util.tree_leaves(s2.ema_params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_spdp_train_step_inpainting():
    """The batch-spec rule shards every 4-D array (inpaint_image/mask
    included) over (data, sp); one inpainting train step runs finite."""
    from jax.sharding import Mesh

    cfg = deep_copy_config(CONFIG_2_1)
    mc = cfg["model_config"]
    mc.update(
        num_channels=32, num_res_blocks=1, channel_mult="1,2",
        attention_resolutions="32", num_head_channels=16, model_dim=32,
        text_encoder_in_dim1=16, text_encoder_in_dim2=32,
        image_encoder_in_dim=32, num_image_embs=2, inpainting=True,
    )
    unet = create_model(**mc, dtype=jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))

    B, H = 4, 16
    lat = jax.random.normal(jax.random.PRNGKey(20), (B, H, H, 4))
    batch = {
        "image_latents": lat,
        "full_emb": jax.random.normal(jax.random.PRNGKey(21), (B, 7, 16)),
        "pooled_emb": jax.random.normal(jax.random.PRNGKey(22), (B, 32)),
        "image_emb": jax.random.normal(jax.random.PRNGKey(23), (B, 32)),
        "inpaint_image": lat * 0.5,
        "inpaint_mask": jnp.ones((B, H, H, 1)),
    }
    params = unet.init(
        jax.random.PRNGKey(24), lat, jnp.zeros((B,)),
        full_emb=batch["full_emb"], pooled_emb=batch["pooled_emb"],
        image_emb=batch["image_emb"],
        inpaint_image=batch["inpaint_image"],
        inpaint_mask=batch["inpaint_mask"],
    )["params"]
    init_state, train_fn = make_spdp_train_fn(
        unet, cfg["diffusion_config"], optax.adam(1e-3), mesh,
        inpainting=True, ema_decay=None,
    )
    state, metrics = train_fn(init_state(params), batch, jax.random.PRNGKey(25))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
