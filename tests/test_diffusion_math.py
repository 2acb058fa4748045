"""Parity tests: schedule construction and Gaussian-diffusion math vs the
torch reference (kandinsky2/model/gaussian_diffusion.py, respace.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from kandinsky2_tpu.diffusion import (
    MeanType,
    VarType,
    make_schedule,
    p_mean_variance,
    q_posterior_mean_variance,
    q_sample,
)
from kandinsky2_tpu.diffusion import schedules as S

from ref_loader import ref_model

refgd = ref_model("gaussian_diffusion")
refrespace = ref_model("respace")
refmc = ref_model("model_creation")


def make_ref_diffusion(**kw):
    """Reference SpacedDiffusion via its factory (model_creation.py:86-128)."""
    return refmc.create_gaussian_diffusion(**kw)


@pytest.mark.parametrize(
    "name,start,end",
    [("linear", 0.0001, 0.02), ("linear", 0.00085, 0.012), ("cosine", 0.0001, 0.02)],
)
def test_named_betas(name, start, end):
    ours = S.named_betas(name, 1000, start, end)
    theirs = refgd.get_named_beta_schedule(name, 1000, start, end)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


@pytest.mark.parametrize("counts", ["25", "50", "ddim25", "10,15,20", "100"])
def test_space_timesteps(counts):
    assert S.space_timesteps(1000, counts) == refrespace.space_timesteps(1000, counts)


@pytest.mark.parametrize("respacing", ["25", "ddim50", ""])
def test_respaced_betas_and_map(respacing):
    kw = dict(
        steps=1000,
        learn_sigma=True,
        sigma_small=False,
        noise_schedule="linear",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=True,
        rescale_learned_sigmas=True,
        timestep_respacing=respacing,
        linear_start=0.00085,
        linear_end=0.012,
    )
    ref = make_ref_diffusion(**kw)
    sched = make_schedule(
        steps=1000,
        noise_schedule="linear",
        timestep_respacing=respacing,
        linear_start=0.00085,
        linear_end=0.012,
        rescale_timesteps=True,
    )
    np.testing.assert_allclose(np.asarray(sched.betas), ref.betas, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(sched.timestep_map), ref.timestep_map)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_log_variance_clipped),
        ref.posterior_log_variance_clipped,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1), ref.posterior_mean_coef1, rtol=1e-5
    )
    # timestep mapping + rescale (respace.py:128-133)
    t = np.array([0, sched.num_timesteps - 1])
    ours_t = np.asarray(sched.model_timesteps(jnp.asarray(t)))
    wrapped = refrespace._WrappedModel(
        lambda x, ts: ts, ref.timestep_map, True, 1000
    )
    theirs_t = wrapped(None, torch.tensor(t)).numpy()
    np.testing.assert_allclose(ours_t, theirs_t, rtol=1e-6)


def test_q_sample_and_posterior():
    rng = np.random.RandomState(0)
    x0 = rng.randn(4, 3, 8, 8).astype(np.float32)
    xt = rng.randn(4, 3, 8, 8).astype(np.float32)
    noise = rng.randn(4, 3, 8, 8).astype(np.float32)
    t = np.array([0, 5, 13, 24])

    ref = make_ref_diffusion(
        steps=1000, noise_schedule="cosine", timestep_respacing="25",
        learn_sigma=False, sigma_small=True, use_kl=False, predict_xstart=True,
        rescale_timesteps=False, rescale_learned_sigmas=False,
    )
    sched = make_schedule(steps=1000, noise_schedule="cosine", timestep_respacing="25")

    ours = q_sample(sched, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    theirs = ref.q_sample(torch.tensor(x0), torch.tensor(t), torch.tensor(noise))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)

    om, ov, olv = q_posterior_mean_variance(
        sched, jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t)
    )
    tm, tv, tlv = ref.q_posterior_mean_variance(
        torch.tensor(x0), torch.tensor(xt), torch.tensor(t)
    )
    bt = lambda a: np.broadcast_to(np.asarray(a), x0.shape)
    np.testing.assert_allclose(np.asarray(om), tm.numpy(), atol=1e-5)
    np.testing.assert_allclose(bt(ov), tv.numpy(), atol=1e-6)
    np.testing.assert_allclose(bt(olv), tlv.numpy(), atol=1e-5)


@pytest.mark.parametrize(
    "mean_type,var_type,learn,small,predict_x0",
    [
        (MeanType.EPSILON, VarType.LEARNED_RANGE, True, False, False),
        (MeanType.START_X, VarType.FIXED_SMALL, False, True, True),
        (MeanType.EPSILON, VarType.FIXED_LARGE, False, False, False),
    ],
)
def test_p_mean_variance(mean_type, var_type, learn, small, predict_x0):
    rng = np.random.RandomState(1)
    B, C = 2, 4
    x = rng.randn(B, C, 8, 8).astype(np.float32)
    out_ch = C * 2 if learn else C
    model_out = rng.randn(B, out_ch, 8, 8).astype(np.float32)
    t = np.array([3, 17])

    ref = make_ref_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing="25",
        learn_sigma=learn, sigma_small=small, use_kl=False,
        predict_xstart=predict_x0, rescale_timesteps=False,
        rescale_learned_sigmas=learn, linear_start=0.00085, linear_end=0.012,
    )
    sched = make_schedule(
        steps=1000, noise_schedule="linear", timestep_respacing="25",
        linear_start=0.00085, linear_end=0.012,
    )

    denoise = lambda v: v.clip(-10, 10) if hasattr(v, "clip") else v
    ours = p_mean_variance(
        sched, jnp.asarray(model_out), jnp.asarray(x), jnp.asarray(t),
        mean_type=mean_type, var_type=var_type,
        clip_denoised=False, denoised_fn=denoise,
    )
    theirs = ref.p_mean_variance(
        lambda xx, tt: torch.tensor(model_out),
        torch.tensor(x), torch.tensor(t),
        clip_denoised=False, denoised_fn=lambda v: torch.clamp(v, -10, 10),
    )
    for k in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), theirs[k].numpy(), atol=2e-4, err_msg=k
        )


def test_dynamic_threshold_matches_reference():
    """clip_denoised=True percentile clip (gaussian_diffusion.py:284-294)."""
    rng = np.random.RandomState(2)
    x = (rng.randn(2, 4, 8, 8) * 3).astype(np.float32)
    sched = make_schedule(steps=1000, timestep_respacing="25")
    ours = p_mean_variance(
        sched,
        jnp.asarray(np.concatenate([x, np.zeros_like(x)], 1)),
        jnp.asarray(x),
        jnp.asarray([5, 5]),
        mean_type=MeanType.START_X,
        var_type=VarType.LEARNED_RANGE,
        clip_denoised=True,
    )["pred_xstart"]
    # reference semantics, recomputed in numpy
    s = max(np.percentile(np.abs(x), 99.5, axis=(1, 2, 3))[0], 1.0)
    expected = np.clip(x, -s, s) / s
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-5)
