"""Paired-timestep ancestral sampling — the 2.2 scheduler family.

The reference's 2.2 hot loops live inside HF diffusers' UnCLIPScheduler
(prior: x0-prediction, fixed_small_log variance, clip ±10, cosine betas) and
DDPMScheduler (decoder: eps-prediction, learned_range variance, clip ±2)
(kandinsky2/kandinsky2_2_model.py:26-42 delegates there).  Both recompute the
effective beta per inference step from the *base* alphas_cumprod at a
(t, prev_t) pair — equivalent to guided-diffusion's respaced posterior but
parameterized by ladders rather than by rebuilding a compressed schedule.

Here that's one scanned pure step over precomputed (t, prev_t) tables.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ddpm_ladder",
    "unclip_ladder",
    "paired_ancestral_loop",
]


def ddpm_ladder(num_inference_steps: int, num_train_steps: int = 1000) -> np.ndarray:
    """diffusers DDPMScheduler.set_timesteps: arange * (T // S), descending."""
    ratio = num_train_steps // num_inference_steps
    return (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64)[::-1]


def unclip_ladder(num_inference_steps: int, num_train_steps: int = 1000) -> np.ndarray:
    """diffusers UnCLIPScheduler.set_timesteps — same uniform striding."""
    return ddpm_ladder(num_inference_steps, num_train_steps)


def paired_ancestral_loop(
    model_fn: Callable,
    base_alphas_cumprod: jnp.ndarray,
    timesteps: np.ndarray,
    x_T: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    prediction: str = "epsilon",  # "epsilon" | "sample"
    variance: str = "learned_range",  # "learned_range" | "fixed_small_log" | "fixed_small"
    clip_range: Optional[float] = 2.0,
    channel_axis: int = -1,
    noise_seq: Optional[jnp.ndarray] = None,
    model_state=None,
) -> jnp.ndarray:
    """Scan the (t, prev_t) ladder.  ``model_fn(x, t)`` returns the
    (guidance-mixed) prediction, with variance channels concatenated when
    ``variance == 'learned_range'``.  With ``model_state`` the stateful
    contract applies: ``model_fn(x, t, state, pos) -> (out, state)`` and the
    state rides the scan carry (deep-branch caching / turbo mode)."""
    ts = np.asarray(timesteps, np.int64)
    prev = np.concatenate([ts[1:], [-1]])
    t_tab = jnp.asarray(ts, jnp.int32)
    prev_tab = jnp.asarray(prev, jnp.int32)
    acp = jnp.asarray(base_alphas_cumprod, jnp.float32)
    B = x_T.shape[0]
    nd = x_T.ndim
    bshape = (B,) + (1,) * (nd - 1)
    stateful = model_state is not None

    def step(carry, pos):
        x, state = carry
        t = t_tab[pos]
        t_prev = prev_tab[pos]
        a_t = acp[t]
        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
        beta = 1.0 - a_t / a_prev
        alpha = a_t / a_prev

        if stateful:
            out, state = model_fn(x, jnp.full((B,), t, jnp.float32), state, pos)
        else:
            out = model_fn(x, jnp.full((B,), t, jnp.float32))
        out = out.astype(jnp.float32)
        if variance == "learned_range":
            out, var_values = jnp.split(out, 2, axis=channel_axis)
        if prediction == "epsilon":
            x0 = (x - jnp.sqrt(1.0 - a_t) * out) / jnp.sqrt(a_t)
        else:
            x0 = out
        if clip_range is not None:
            x0 = jnp.clip(x0, -clip_range, clip_range)

        mean = (
            (beta * jnp.sqrt(a_prev) / (1.0 - a_t)) * x0
            + ((1.0 - a_prev) * jnp.sqrt(alpha) / (1.0 - a_t)) * x
        )
        beta_tilde = (1.0 - a_prev) / (1.0 - a_t) * beta
        if variance == "learned_range":
            min_log = jnp.log(jnp.clip(beta_tilde, 1e-20))
            max_log = jnp.log(jnp.clip(beta, 1e-20))
            frac = (var_values + 1.0) / 2.0
            log_var = frac * max_log + (1.0 - frac) * min_log
            scale = jnp.exp(0.5 * log_var)
        elif variance == "fixed_small_log":
            log_var = jnp.log(jnp.clip(beta_tilde, 1e-20))
            scale = jnp.exp(0.5 * log_var)
        else:  # fixed_small
            scale = jnp.sqrt(jnp.clip(beta_tilde, 1e-20))

        if noise_seq is not None:
            noise = noise_seq[pos]
        else:
            noise = jax.random.normal(
                jax.random.fold_in(rng, pos), x.shape, x.dtype
            )
        has_noise = (t_prev >= 0).astype(x.dtype)
        return (mean + has_noise * scale * noise, state), None

    (x, _), _ = jax.lax.scan(
        step, (x_T.astype(jnp.float32), model_state),
        jnp.arange(len(ts), dtype=jnp.int32),
    )
    return x
