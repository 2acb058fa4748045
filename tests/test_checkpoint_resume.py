"""Full-fidelity train-state checkpointing: a run that saves, "crashes", and
resumes must be BITWISE identical to an uninterrupted run over the same batch
sequence — params, EMA shadow, optimizer state, and loss-aware sampler
history all restored (reference contrast: trainer_2_1_uclip.py:78-79 saves
bare state_dicts with no resume at all)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky2_tpu.configs import CONFIG_2_1, create_model, deep_copy_config
from kandinsky2_tpu.train.checkpoint import (
    latest_train_state,
    restore_train_state,
    save_train_state,
)
from kandinsky2_tpu.train.train_unclip import train_unclip


pytestmark = pytest.mark.slow


def _tiny_setup():
    cfg = deep_copy_config(CONFIG_2_1)
    mc = cfg["model_config"]
    mc.update(
        num_channels=32, num_res_blocks=1, channel_mult="1,2",
        attention_resolutions="32", num_head_channels=16, model_dim=32,
        text_encoder_in_dim1=16, text_encoder_in_dim2=32,
        image_encoder_in_dim=32, num_image_embs=2, inpainting=False,
    )
    unet = create_model(**mc, dtype=jnp.float32)
    B = 2
    lat = jnp.zeros((B, 16, 16, 4))
    t = jnp.zeros((B,))
    cond = dict(
        full_emb=jnp.zeros((B, 7, mc["text_encoder_in_dim1"])),
        pooled_emb=jnp.zeros((B, mc["text_encoder_in_dim2"])),
        image_emb=jnp.zeros((B, mc["image_encoder_in_dim"])),
    )
    params = jax.jit(lambda: unet.init(jax.random.PRNGKey(0), lat, t, **cond))()[
        "params"
    ]
    rng = np.random.RandomState(7)
    batches = [
        dict(
            image_latents=jnp.asarray(rng.randn(B, 16, 16, 4), jnp.float32),
            full_emb=jnp.asarray(rng.randn(B, 7, 16), jnp.float32),
            pooled_emb=jnp.asarray(rng.randn(B, 32), jnp.float32),
            image_emb=jnp.asarray(rng.randn(B, 32), jnp.float32),
        )
        for _ in range(4)
    ]
    return unet, params, cfg["diffusion_config"], batches


def _leaves(state):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(jax.device_get(state))]


def test_kill_and_resume_is_bitwise_identical(tmp_path):
    unet, params, dcfg, batches = _tiny_setup()
    kw = dict(
        unet=unet, diffusion_config=dcfg, prepare_batch=lambda b: b,
        schedule_sampler="loss-second-moment", ema_decay=0.9999,
        num_epochs=1, log_every=1000,
    )

    # uninterrupted: 4 steps in one go
    straight = train_unclip(
        params=params, loader=batches, save_every=1000,
        save_path=str(tmp_path / "straight"), **kw,
    )

    # interrupted: 2 steps, save (save_every=2 triggers mid-loop), "crash",
    # then a fresh invocation resumes from the saved state for 2 more
    resume_dir = str(tmp_path / "resumed")
    train_unclip(
        params=params, loader=batches[:2], save_every=2,
        save_path=resume_dir, **kw,
    )
    fname, step = latest_train_state(resume_dir)
    assert step == 2 and fname is not None
    resumed = train_unclip(
        params=params, loader=batches[2:], save_every=1000,
        save_path=resume_dir, **kw,
    )

    assert int(straight.step) == int(resumed.step) == 4
    for a, b in zip(_leaves(straight), _leaves(resumed)):
        np.testing.assert_array_equal(a, b)


def test_restore_rejects_structure_drift(tmp_path):
    unet, params, dcfg, batches = _tiny_setup()
    import optax

    from kandinsky2_tpu.train.train_unclip import make_unclip_train_step

    init_state, _ = make_unclip_train_step(
        unet, dcfg, optax.sgd(1e-3), schedule_sampler="uniform", ema_decay=None
    )
    state = init_state(params)
    fname = save_train_state(str(tmp_path), state, 1)

    init_state2, _ = make_unclip_train_step(
        unet, dcfg, optax.sgd(1e-3), schedule_sampler="uniform", ema_decay=0.999
    )
    other = init_state2(params)  # extra EMA leaves -> different structure
    with pytest.raises(ValueError, match="leaves"):
        restore_train_state(fname, other)
    # and a faithful template round-trips bitwise
    back = restore_train_state(fname, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(back),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
