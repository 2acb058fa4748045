"""The 2.2 paired-timestep schedulers are mathematically the respaced
guided-diffusion process: cross-validate paired_ancestral_loop against
p_sample_loop on an identical timestep subset with injected noise."""

import numpy as np

import jax.numpy as jnp

from kandinsky2_tpu.diffusion import (
    MeanType,
    VarType,
    make_schedule,
    p_sample_loop,
)
from kandinsky2_tpu.diffusion.paired import ddpm_ladder, paired_ancestral_loop
from kandinsky2_tpu.diffusion.schedules import named_betas, respace_betas


def test_unclip_prior_equals_respaced_p_sampler(monkeypatch):
    steps = 100
    n_inf = 5
    ladder = ddpm_ladder(n_inf, steps)  # descending
    subset = sorted(int(t) for t in ladder)
    base_betas = named_betas("cosine", steps)
    acp_base = np.cumprod(1.0 - base_betas)

    # respaced schedule over exactly the ladder's subset
    import kandinsky2_tpu.diffusion.schedules as S
    import kandinsky2_tpu.diffusion.gaussian as G

    monkeypatch.setattr(G._sched, "space_timesteps", lambda n, c: set(subset))
    sched = make_schedule(steps=steps, noise_schedule="cosine",
                          timestep_respacing="ignored")
    assert list(np.asarray(sched.timestep_map)) == subset

    rng = np.random.RandomState(0)
    B, D = 2, 16
    x_T = rng.randn(B, D).astype(np.float32)
    noise_seq = rng.randn(n_inf, B, D).astype(np.float32)

    def model(x, t):
        # x0-prediction toy model; t is in ORIGINAL timestep units for the
        # paired loop and mapped units for the respaced one -- make the model
        # t-independent so both paths see identical functions
        return jnp.tanh(x) * 0.8

    ours_respaced = p_sample_loop(
        model, sched, jnp.asarray(x_T),
        mean_type=MeanType.START_X, var_type=VarType.FIXED_SMALL,
        clip_denoised=False, denoised_fn=lambda v: jnp.clip(v, -10, 10),
        noise_seq=jnp.asarray(noise_seq), channel_axis=-1,
    )
    ours_paired = paired_ancestral_loop(
        model, jnp.asarray(acp_base, jnp.float32), ladder, jnp.asarray(x_T),
        prediction="sample", variance="fixed_small_log", clip_range=10.0,
        noise_seq=jnp.asarray(noise_seq), channel_axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(ours_paired), np.asarray(ours_respaced), atol=2e-4
    )


def test_ddpm22_learned_range_finite():
    ladder = ddpm_ladder(6, 1000)
    from kandinsky2_tpu.diffusion.schedules import named_betas

    acp = np.cumprod(1.0 - named_betas("linear", 1000, 0.00085, 0.012))
    rng = np.random.RandomState(1)
    x_T = rng.randn(1, 8, 8, 4).astype(np.float32)

    def model(x, t):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    out = paired_ancestral_loop(
        model, jnp.asarray(acp, jnp.float32), ladder, jnp.asarray(x_T),
        prediction="epsilon", variance="learned_range", clip_range=2.0,
        noise_seq=jnp.asarray(rng.randn(6, 1, 8, 8, 4).astype(np.float32)),
    )
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() < 10
