"""Training-stack tests: training_losses parity vs the torch reference,
loss-aware resampler semantics, EMA, freeze masks, checkpoint resume, masks."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from kandinsky2_tpu.diffusion import LossType, MeanType, VarType, make_schedule
from kandinsky2_tpu.diffusion.gaussian import training_losses
from kandinsky2_tpu.train import (
    ema_update,
    init_loss_aware,
    loss_aware_update,
    loss_aware_weights,
)
from kandinsky2_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from kandinsky2_tpu.train.masks import get_image_mask
from kandinsky2_tpu.train.train_unclip import decoder_freeze_mask

from ref_loader import ref_model

refmc = ref_model("model_creation")


def test_training_losses_parity():
    """Hybrid MSE+VLB loss vs gaussian_diffusion.training_losses:670-742."""
    rng = np.random.RandomState(0)
    B, C = 3, 4
    x0 = rng.randn(B, C, 8, 8).astype(np.float32)
    noise = rng.randn(B, C, 8, 8).astype(np.float32)
    t = np.array([0, 250, 999])

    W = rng.randn(1, 2 * C, 1, 1).astype(np.float32) * 0.1

    def model_np(x, tt):
        return np.tile(W, (x.shape[0], 1, x.shape[2], x.shape[3])) + np.concatenate(
            [0.3 * x, 0.1 * np.tanh(x)], axis=1
        )

    ref = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing="",
        learn_sigma=True, sigma_small=False, use_kl=False, predict_xstart=False,
        rescale_timesteps=True, rescale_learned_sigmas=True,
        linear_start=0.00085, linear_end=0.012,
    )
    theirs = ref.training_losses(
        lambda x, tt, **kw: torch.tensor(model_np(x.numpy(), tt.numpy())),
        torch.tensor(x0), torch.tensor(t), noise=torch.tensor(noise),
    )

    sched = make_schedule(
        steps=1000, noise_schedule="linear", linear_start=0.00085,
        linear_end=0.012, rescale_timesteps=True,
    )
    ours = training_losses(
        sched,
        lambda x, tt: jnp.asarray(model_np(np.asarray(x), np.asarray(tt))),
        jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise),
        mean_type=MeanType.EPSILON, var_type=VarType.LEARNED_RANGE,
        loss_type=LossType.RESCALED_MSE, channel_axis=1,
    )
    for k in ("loss", "mse", "vb"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), theirs[k].numpy(), atol=2e-4, err_msg=k
        )


def test_loss_aware_resampler_semantics():
    """FIFO history + warmup weights vs a numpy transcription of
    resample.py:115-145."""
    T, H = 6, 3
    state = init_loss_aware(T, H)
    hist = np.zeros((T, H))
    counts = np.zeros(T, int)
    rng = np.random.RandomState(0)
    for _ in range(8):
        ts = rng.randint(0, T, size=(4,))
        losses = rng.rand(4).astype(np.float32)
        state = loss_aware_update(state, jnp.asarray(ts), jnp.asarray(losses))
        for t, l in zip(ts, losses):
            if counts[t] == H:
                hist[t, :-1] = hist[t, 1:]
                hist[t, -1] = l
            else:
                hist[t, counts[t]] = l
                counts[t] += 1
    np.testing.assert_allclose(np.asarray(state.history), hist, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(state.counts), counts)
    w = np.asarray(loss_aware_weights(state))
    if (counts == H).all():
        expected = np.sqrt(np.mean(hist**2, axis=-1))
        expected /= expected.sum()
        expected = expected * (1 - 0.001) + 0.001 / T
        np.testing.assert_allclose(w, expected, atol=1e-6)
    else:
        np.testing.assert_allclose(w, np.ones(T), atol=1e-6)


def test_ema_warmup():
    p = {"a": jnp.ones((3,)) * 2.0}
    e = {"a": jnp.zeros((3,))}
    out = ema_update(e, p, 0.9999, num_updates=0)  # decay -> 0.1
    np.testing.assert_allclose(np.asarray(out["a"]), 1.8, atol=1e-6)
    out = ema_update(e, p, 0.5, num_updates=10_000_000)  # decay stays 0.5
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0, atol=1e-6)


def test_freeze_mask_and_step():
    params = {
        "input_blocks.1.0": {
            "in_layers.2": {"kernel": jnp.ones((3, 3, 4, 4))},
            "emb_layers.1": {"kernel": jnp.ones((4, 4))},
        },
        "input_blocks.1.1": {"qkv": {"kernel": jnp.ones((4, 12))}},
        "out.2": {"kernel": jnp.ones((3, 3, 4, 4))},
    }
    mask = decoder_freeze_mask(params, freeze_resblocks=True, freeze_attention=False)
    assert mask["input_blocks.1.0"]["in_layers.2"]["kernel"] is False
    assert mask["input_blocks.1.0"]["emb_layers.1"]["kernel"] is False
    assert mask["input_blocks.1.1"]["qkv"]["kernel"] is True
    assert mask["out.2"]["kernel"] is True

    from kandinsky2_tpu.train.train_unclip import masked_optimizer

    tx = masked_optimizer(optax.sgd(0.1), mask)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    assert float(jnp.abs(updates["input_blocks.1.0"]["in_layers.2"]["kernel"]).max()) == 0
    assert float(jnp.abs(updates["input_blocks.1.1"]["qkv"]["kernel"]).max()) > 0


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)}, "c": np.ones(4)}
    save_checkpoint(str(tmp_path), params, 42)
    fname, step = latest_checkpoint(str(tmp_path))
    assert step == 42
    loaded = load_checkpoint(fname)
    np.testing.assert_array_equal(loaded["a"]["b"], params["a"]["b"])
    np.testing.assert_array_equal(loaded["c"], params["c"])


def test_image_masks():
    masks = get_image_mask(4, (64, 64), rng=np.random.RandomState(0))
    assert masks.shape == (4, 64, 64)
    assert set(np.unique(masks)).issubset({0.0, 1.0})
    # every mask must actually inpaint something but not everything
    area = masks.mean(axis=(1, 2))
    assert (area > 0.05).all() and (area < 1.0).all()
