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
    *,
    data_axis: str = None,
    sp_axis: str = None,
    jit: bool = True,
):
    """Build the jitted LoRA step.

    ``eps_fn(merged_params, x_t, t, cond) -> eps prediction`` runs the frozen
    architecture with the LoRA-merged parameters; ``cond`` is any pytree of
    conditioning arrays (image embeddings for the 2.2 decoder, text features
    for the prior).  ``alphas_cumprod``: the base (1000-step) schedule.

    ``data_axis``/``sp_axis`` name mesh axes for use inside shard_map (see
    ``make_sp_lora_train_fn``): examples sharded over ``data_axis``, latent
    rows over ``sp_axis`` — the SP path for LoRA-tuning at resolutions whose
    backward doesn't fit one chip.  The caller passes an eps_fn built from
    an SP-cloned architecture (``unet22_eps_fn(unet, sp_axis=...)``).
    """
    acp = jnp.asarray(alphas_cumprod, jnp.float32)
    T = acp.shape[0]

    def train_step(state: LoraTrainState, x0, cond, rng):
        """``rng`` is consumed as-is — fold in the step count on the host
        (``jax.random.fold_in(key, step)``) for fresh noise per step."""
        B = x0.shape[0]
        if data_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        rng_t, rng_n = jax.random.split(rng)
        if sp_axis is not None:
            # one t per example across the sp group; independent noise rows
            rng_n = jax.random.fold_in(rng_n, jax.lax.axis_index(sp_axis))
        t = jax.random.randint(rng_t, (B,), 0, T)
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)
        a = acp[t].reshape((B,) + (1,) * (x0.ndim - 1))
        x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

        def loss_fn(loras):
            merged = merge_lora(base_params, loras)
            eps_hat = eps_fn(merged, x_t, t.astype(jnp.float32), cond)
            loss = jnp.mean((eps_hat.astype(jnp.float32) - noise) ** 2)
            if sp_axis is not None:
                # equal row shards: cross-shard mean == the global mean
                loss = jax.lax.pmean(loss, sp_axis)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.loras)
        if sp_axis is not None:
            # recover the exact global gradient from per-shard contributions
            # (same transpose argument as train_unclip; pinned in
            # tests/test_spatial_parallel.py)
            grads = jax.lax.pmean(grads, sp_axis)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.loras)
        loras = optax.apply_updates(state.loras, updates)
        new_state = LoraTrainState(
            loras=loras, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,)) if jit else train_step


def make_sp_lora_train_fn(
    eps_fn: Callable,
    base_params,
    alphas_cumprod: jnp.ndarray,
    tx: optax.GradientTransformation,
    mesh,
    *,
    data_axis: str = "data",
    sp_axis: str = "sp",
):
    """LoRA train step inside shard_map over a ``(data, sp)`` mesh: examples
    sharded over ``data_axis``, latent ROWS over ``sp_axis``, factors and
    frozen base replicated.  The spatial sharding divides the frozen
    backbone's backward activation memory by the sp size — high-resolution
    LoRA tuning past one chip's HBM.  ``eps_fn`` must come from an SP-cloned
    architecture: ``unet22_eps_fn(unet, sp_axis="sp")``.
    """
    from jax.sharding import PartitionSpec as P

    train_step = make_lora_train_step(
        eps_fn, base_params, alphas_cumprod, tx,
        data_axis=data_axis, sp_axis=sp_axis, jit=False,
    )
    f = jax.shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), P(data_axis, sp_axis), P(data_axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f, donate_argnums=(0,))


def unet22_eps_fn(unet, sp_axis: str = None):
    """eps_fn for LoRA-tuning the 2.2 decoder UNet (the reference's
    tune_decoder_lora target): ``cond`` is the [B, 768] image embedding;
    the model's variance channels are not trained (eps-MSE objective,
    matching the diffusers script).  ``sp_axis`` clones the UNet onto its
    row-sharded path for use inside ``make_sp_lora_train_fn``."""
    if sp_axis is not None and getattr(unet, "sp_axis", None) != sp_axis:
        unet = unet.clone(sp_axis=sp_axis, parent=None)

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
