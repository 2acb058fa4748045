"""LoRA fine-tuning as a jitted train step over factor pairs only.

The reference fine-tunes rank-4 LoRA attention processors on the 2.2
decoder UNet and prior through diffusers' tune scripts
(reference: notebooks/lora_decoder.ipynb).  TPU-first design:

* The *only* trainable pytree is the ``{path: {down, up}}`` factor dict from
  ``models.lora.init_lora``; the base parameters are a closed-over constant
  (never donated, never updated), so optimizer state is a few MB.
* Each step merges the factors into the frozen base (``merge_lora`` — a
  handful of rank-r matmuls, negligible next to the UNet forward), runs the
  standard eps-prediction diffusion loss, and differentiates w.r.t. the
  factors alone.  XLA sees one fused program; under a jit-over-Mesh the
  gradient reduction over the 'data' axis is inserted automatically, same
  as the full-parameter trainers.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.lora import merge_lora


@struct.dataclass
class LoraTrainState:
    loras: Any  # {path: {"down", "up"}} — the only trainable leaves
    opt_state: Any
    step: jnp.ndarray


def init_lora_train_state(loras, tx: optax.GradientTransformation):
    return LoraTrainState(
        loras=loras, opt_state=tx.init(loras), step=jnp.zeros((), jnp.int32)
    )


def make_lora_train_step(
    eps_fn: Callable,
    base_params,
    alphas_cumprod: jnp.ndarray,
    tx: optax.GradientTransformation,
):
    """Build the jitted LoRA step.

    ``eps_fn(merged_params, x_t, t, cond) -> eps prediction`` runs the frozen
    architecture with the LoRA-merged parameters; ``cond`` is any pytree of
    conditioning arrays (image embeddings for the 2.2 decoder, text features
    for the prior).  ``alphas_cumprod``: the base (1000-step) schedule.
    """
    acp = jnp.asarray(alphas_cumprod, jnp.float32)
    T = acp.shape[0]

    def train_step(state: LoraTrainState, x0, cond, rng):
        """``rng`` is consumed as-is — fold in the step count on the host
        (``jax.random.fold_in(key, step)``) for fresh noise per step."""
        B = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, T)
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)
        a = acp[t].reshape((B,) + (1,) * (x0.ndim - 1))
        x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

        def loss_fn(loras):
            merged = merge_lora(base_params, loras)
            eps_hat = eps_fn(merged, x_t, t.astype(jnp.float32), cond)
            return jnp.mean(
                (eps_hat.astype(jnp.float32) - noise) ** 2
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.loras)
        updates, opt_state = tx.update(grads, state.opt_state, state.loras)
        loras = optax.apply_updates(state.loras, updates)
        new_state = LoraTrainState(
            loras=loras, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,))


def unet22_eps_fn(unet):
    """eps_fn for LoRA-tuning the 2.2 decoder UNet (the reference's
    tune_decoder_lora target): ``cond`` is the [B, 768] image embedding;
    the model's variance channels are not trained (eps-MSE objective,
    matching the diffusers script)."""

    def eps_fn(params, x_t, t, image_embeds):
        encoder_states, aug_emb, _ = unet.apply(
            {"params": params}, image_embeds,
            method=unet.encode_conditioning,
        )
        out = unet.apply(
            {"params": params}, x_t, t, encoder_states, aug_emb, None,
            method=unet.denoise,
        )
        return out[..., : x_t.shape[-1]]

    return eps_fn
