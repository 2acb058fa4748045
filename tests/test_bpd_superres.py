"""VLB/BPD evaluation parity vs the reference and SuperRes UNet smoke tests."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.diffusion import MeanType, VarType, make_schedule
from kandinsky2_tpu.diffusion.gaussian import calc_bpd_loop, prior_bpd
from kandinsky2_tpu.models.unet import SuperResText2ImUNet21, SuperResUNetModel

from ref_loader import ref_model

refmc = ref_model("model_creation")


def test_prior_bpd_parity():
    ref = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing="10",
        learn_sigma=True, sigma_small=False, use_kl=False, predict_xstart=False,
        rescale_timesteps=True, rescale_learned_sigmas=True,
    )
    sched = make_schedule(
        steps=1000, noise_schedule="linear", timestep_respacing="10",
        rescale_timesteps=True,
    )
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 4, 8, 8).astype(np.float32)
    theirs = ref._prior_bpd(torch.tensor(x0)).numpy()
    ours = prior_bpd(sched, jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_calc_bpd_loop_shapes_and_total():
    """Scan-based VLB: per-step terms finite, total = sum(vb) + prior term."""
    sched = make_schedule(
        steps=1000, noise_schedule="linear", timestep_respacing="6",
        rescale_timesteps=True,
    )

    def model_fn(x, t):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=1)

    x0 = jnp.asarray(np.random.RandomState(1).randn(2, 4, 8, 8), jnp.float32)
    out = calc_bpd_loop(
        sched, model_fn, x0, jax.random.PRNGKey(0),
        mean_type=MeanType.EPSILON, var_type=VarType.LEARNED_RANGE,
        channel_axis=1,
    )
    assert out["vb"].shape == (2, 6)
    assert out["mse"].shape == (2, 6)
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"]).sum(1) + np.asarray(out["prior_bpd"]),
        rtol=1e-5,
    )
    assert np.isfinite(np.asarray(out["total_bpd"])).all()


@pytest.mark.slow
def test_superres_unets():
    common = dict(
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,), num_head_channels=16,
        out_channels=8,
    )
    # plain SR UNet: in = 2C
    sr = SuperResUNetModel(in_channels=8, **common)
    x = jnp.zeros((1, 16, 16, 4))
    low = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    p = sr.init(jax.random.PRNGKey(0), x, t, low_res=low)
    out = sr.apply(p, x, t, low_res=low)
    assert out.shape == (1, 16, 16, 8)

    # text-conditioned SR variant
    srt = SuperResText2ImUNet21(
        in_channels=8, model_dim=32, image_encoder_in_dim=24,
        text_encoder_in_dim1=20, text_encoder_in_dim2=32, num_image_embs=2,
        pooling_type="from_model", use_encoder_kv=True, **common,
    )
    cond = dict(
        full_emb=jnp.zeros((1, 5, 20)), pooled_emb=jnp.zeros((1, 32)),
        image_emb=jnp.zeros((1, 24)),
    )
    p = srt.init(jax.random.PRNGKey(0), x, t, low_res=low, **cond)
    out = srt.apply(p, x, t, low_res=low, **cond)
    assert out.shape == (1, 16, 16, 8)
    assert bool(jnp.isfinite(out).all())
