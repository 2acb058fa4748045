"""End-to-end sampler-loop parity vs the reference using a deterministic toy
model and injected noise, plus independent numpy oracles for the standalone
DDIM/PLMS samplers (which hardcode CUDA in the reference, samplers.py:79)."""

import numpy as np
import torch

import jax.numpy as jnp

from kandinsky2_tpu.diffusion import (
    MeanType,
    VarType,
    ddim_loop,
    ddim_respaced_loop,
    make_ddim_tables,
    make_schedule,
    p_sample_loop,
    plms_loop,
)
from kandinsky2_tpu.diffusion import schedules as S

from ref_loader import ref_model

refmc = ref_model("model_creation")

SHAPE = (2, 4, 8, 8)


def toy_model_np(x, t):
    """Deterministic eps+variance 'model' shared by torch/jax variants."""
    t = np.asarray(t, dtype=np.float32).reshape(-1, 1, 1, 1)
    eps = 0.1 * x + 0.01 * np.sin(t / 37.0)
    var = np.tanh(0.5 * x)
    return np.concatenate([eps, var], axis=1)


def toy_model_jax(x, t):
    t = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    eps = 0.1 * x + 0.01 * jnp.sin(t / 37.0)
    var = jnp.tanh(0.5 * x)
    return jnp.concatenate([eps, var], axis=1)


def toy_model_torch(x, t, **kw):
    t = t.float().reshape(-1, 1, 1, 1)
    eps = 0.1 * x + 0.01 * torch.sin(t / 37.0)
    var = torch.tanh(0.5 * x)
    return torch.cat([eps, var], dim=1)


def test_p_sample_loop_parity(monkeypatch):
    steps = 12
    rng = np.random.RandomState(3)
    x_T = rng.randn(*SHAPE).astype(np.float32)
    noise_seq = rng.randn(steps, *SHAPE).astype(np.float32)

    ref = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing=str(steps),
        learn_sigma=True, sigma_small=False, use_kl=False, predict_xstart=False,
        rescale_timesteps=True, rescale_learned_sigmas=True,
        linear_start=0.00085, linear_end=0.012,
    )
    queue = [torch.tensor(n) for n in noise_seq]
    monkeypatch.setattr(torch, "randn_like", lambda x: queue.pop(0))
    theirs = ref.p_sample_loop(
        toy_model_torch, SHAPE, noise=torch.tensor(x_T),
        clip_denoised=False, denoised_fn=lambda v: torch.clamp(v, -2, 2),
        device="cpu",
    ).numpy()

    sched = make_schedule(
        steps=1000, noise_schedule="linear", timestep_respacing=str(steps),
        linear_start=0.00085, linear_end=0.012, rescale_timesteps=True,
    )
    ours = p_sample_loop(
        toy_model_jax, sched, jnp.asarray(x_T),
        mean_type=MeanType.EPSILON, var_type=VarType.LEARNED_RANGE,
        clip_denoised=False, denoised_fn=lambda v: jnp.clip(v, -2, 2),
        noise_seq=jnp.asarray(noise_seq),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_p_sample_loop_init_step(monkeypatch):
    """img2img ladder truncation (gaussian_diffusion.py:453-455)."""
    steps, init_step = 10, 6
    rng = np.random.RandomState(7)
    x_T = rng.randn(*SHAPE).astype(np.float32)
    noise_seq = rng.randn(init_step, *SHAPE).astype(np.float32)

    ref = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing=str(steps),
        learn_sigma=True, sigma_small=False, use_kl=False, predict_xstart=False,
        rescale_timesteps=True, rescale_learned_sigmas=True,
    )
    queue = [torch.tensor(n) for n in noise_seq]
    monkeypatch.setattr(torch, "randn_like", lambda x: queue.pop(0))
    theirs = ref.p_sample_loop(
        toy_model_torch, SHAPE, noise=torch.tensor(x_T),
        clip_denoised=False, device="cpu", init_step=init_step,
    ).numpy()

    sched = make_schedule(
        steps=1000, noise_schedule="linear", timestep_respacing=str(steps),
        rescale_timesteps=True,
    )
    ours = p_sample_loop(
        toy_model_jax, sched, jnp.asarray(x_T),
        clip_denoised=False, init_step=init_step,
        noise_seq=jnp.asarray(noise_seq),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_ddim_respaced_loop_parity():
    """Deterministic (eta=0) DDIM over a respaced cosine schedule — the
    prior's 'ddimN' path (prior.py:318-326)."""
    B, D = 2, 16

    def model_np(x, t):
        return np.tanh(x) * 0.9 + 0.01 * np.asarray(t, np.float32).reshape(-1, 1)

    def model_jax(x, t):
        return jnp.tanh(x) * 0.9 + 0.01 * t.astype(jnp.float32).reshape(-1, 1)

    ref = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="cosine", timestep_respacing="ddim10",
        learn_sigma=False, sigma_small=True, use_kl=False, predict_xstart=True,
        rescale_timesteps=False, rescale_learned_sigmas=False,
    )
    rng = np.random.RandomState(11)
    x_T = rng.randn(B, D).astype(np.float32)
    theirs = ref.ddim_sample_loop(
        lambda x, t, **kw: torch.tensor(model_np(x.numpy(), t.numpy())),
        (B, D), noise=torch.tensor(x_T), clip_denoised=False,
        denoised_fn=lambda v: torch.clamp(v, -10, 10), device="cpu",
    ).numpy()

    sched = make_schedule(
        steps=1000, noise_schedule="cosine", timestep_respacing="ddim10"
    )
    ours = ddim_respaced_loop(
        model_jax,
        sched, jnp.asarray(x_T),
        mean_type=MeanType.START_X, var_type=VarType.FIXED_SMALL,
        clip_denoised=False, denoised_fn=lambda v: jnp.clip(v, -10, 10),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def _eps_model_np(x, t):
    return 0.2 * x + 0.05 * np.cos(np.asarray(t, np.float32)).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


def _eps_model_jax(x, t):
    return 0.2 * x + 0.05 * jnp.cos(t.astype(jnp.float32)).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


def _numpy_ddim_oracle(alphas_cumprod, ladder, x, eta=0.0):
    """Independent numpy transcription of the standalone DDIM update
    (samplers.py:259-331), eta=0."""
    sigmas, alphas, alphas_prev = S.ddim_sampling_parameters(
        alphas_cumprod, ladder, eta
    )
    total = len(ladder)
    for i, step in enumerate(ladder[::-1]):
        index = total - i - 1
        t = np.full((x.shape[0],), step, np.float32)
        e_t = _eps_model_np(x, t)
        a_t, a_prev = alphas[index], alphas_prev[index]
        pred_x0 = (x - np.sqrt(1.0 - a_t) * e_t) / np.sqrt(a_t)
        dir_xt = np.sqrt(1.0 - a_prev - sigmas[index] ** 2) * e_t
        x = np.sqrt(a_prev) * pred_x0 + dir_xt
    return x


def test_standalone_ddim_loop():
    base = make_schedule(
        steps=1000, noise_schedule="linear", linear_start=0.00085, linear_end=0.012
    )
    acp = np.asarray(base.alphas_cumprod, dtype=np.float64)
    rng = np.random.RandomState(5)
    x_T = rng.randn(*SHAPE).astype(np.float32)

    for init_step in (None, 401):
        ladder = S.ddim_ladder(8, 1000, init_step=init_step)
        expected = _numpy_ddim_oracle(acp, ladder, x_T.copy())
        tables = make_ddim_tables(acp, 8, init_step=init_step)
        ours = ddim_loop(_eps_model_jax, tables, jnp.asarray(x_T))
        np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)


def test_standalone_plms_loop():
    """PLMS vs an independent numpy transcription of samplers.py:474-637."""
    base = make_schedule(
        steps=1000, noise_schedule="linear", linear_start=0.00085, linear_end=0.012
    )
    acp = np.asarray(base.alphas_cumprod, dtype=np.float64)
    ladder = S.ddim_ladder(7, 1000)
    sigmas, alphas, alphas_prev = S.ddim_sampling_parameters(acp, ladder, 0.0)
    rng = np.random.RandomState(6)
    x = rng.randn(*SHAPE).astype(np.float32)
    x_T = x.copy()

    def update(x, e_t, index):
        a_t, a_prev = alphas[index], alphas_prev[index]
        pred_x0 = (x - np.sqrt(1.0 - a_t) * e_t) / np.sqrt(a_t)
        dir_xt = np.sqrt(1.0 - a_prev - sigmas[index] ** 2) * e_t
        return np.sqrt(a_prev) * pred_x0 + dir_xt

    total = len(ladder)
    time_range = ladder[::-1]
    old_eps = []
    for i, step in enumerate(time_range):
        index = total - i - 1
        t = np.full((x.shape[0],), step, np.float32)
        t_next = np.full(
            (x.shape[0],), time_range[min(i + 1, total - 1)], np.float32
        )
        e_t = _eps_model_np(x, t)
        if len(old_eps) == 0:
            x_prev = update(x, e_t, index)
            e_t_next = _eps_model_np(x_prev, t_next)
            e_t_prime = (e_t + e_t_next) / 2
        elif len(old_eps) == 1:
            e_t_prime = (3 * e_t - old_eps[-1]) / 2
        elif len(old_eps) == 2:
            e_t_prime = (23 * e_t - 16 * old_eps[-1] + 5 * old_eps[-2]) / 12
        else:
            e_t_prime = (
                55 * e_t - 59 * old_eps[-1] + 37 * old_eps[-2] - 9 * old_eps[-3]
            ) / 24
        x = update(x, e_t_prime, index)
        old_eps.append(e_t)
        if len(old_eps) >= 4:
            old_eps.pop(0)

    tables = make_ddim_tables(acp, 7)
    ours = plms_loop(_eps_model_jax, tables, jnp.asarray(x_T))
    np.testing.assert_allclose(np.asarray(ours), x, atol=1e-4)
