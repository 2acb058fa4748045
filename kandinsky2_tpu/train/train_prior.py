"""Diffusion-prior training (reference: kandinsky2/train_utils/
trainer_prior.py:29-70, train_prior.py).

The prior predicts x0 = the (clip_mean/std-normalized) CLIP image embedding
conditioned on CLIP text features; cosine schedule, MSE loss
(configs.py:113-123).  Same TPU-first shape as the decoder trainer: one jitted
step, optax, EMA, atomic checkpoints.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion import make_schedule
from ..diffusion.gaussian import training_losses
from ..configs import schedule_kwargs
from .ema import ema_update
from .resample import uniform_sample


@struct.dataclass
class PriorTrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


def make_prior_train_step(
    prior,
    diffusion_config: dict,
    tx: optax.GradientTransformation,
    *,
    ema_decay: float = 0.9999,
    data_axis: Optional[str] = None,
):
    """``train_step(state, batch, rng)`` with batch dict:
    image_emb [B, clip_dim] (already clip_mean/std-normalized x0 target),
    txt_feat [B, clip_dim], txt_feat_seq [B, ctx, w], mask [B, ctx]."""
    skw = schedule_kwargs(diffusion_config, "")
    sched = make_schedule(**skw["make_schedule"])

    def init_state(params) -> PriorTrainState:
        return PriorTrainState(
            params=params, opt_state=tx.init(params), ema_params=params,
            step=jnp.zeros((), jnp.int32),
        )

    def train_step(state: PriorTrainState, batch, rng):
        rng_t, rng_n = jax.random.split(jax.random.fold_in(rng, state.step))
        x0 = batch["image_emb"].astype(jnp.float32)
        B = x0.shape[0]
        t, weights = uniform_sample(rng_t, sched.num_timesteps, B)
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)

        def loss_fn(params):
            def model_fn(x_t, t_model):
                return prior.apply(
                    {"params": params}, x_t, t_model,
                    text_emb=batch["txt_feat"], text_enc=batch["txt_feat_seq"],
                    mask=batch["mask"],
                )

            terms = training_losses(
                sched, model_fn, x0, t, noise,
                mean_type=skw["mean_type"], var_type=skw["var_type"],
                loss_type=skw["loss_type"], channel_axis=-1,
            )
            return jnp.mean(terms["loss"] * weights), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(
            state.ema_params, params, ema_decay, num_updates=state.step
        )
        return (
            PriorTrainState(
                params=params, opt_state=opt_state, ema_params=ema_params,
                step=state.step + 1,
            ),
            {"loss": loss},
        )

    return init_state, train_step


def train_prior(
    *,
    prior,
    params,
    diffusion_config: dict,
    loader,
    prepare_batch: Callable,
    tx: Optional[optax.GradientTransformation] = None,
    num_epochs: int = 1,
    save_every: int = 1000,
    save_path: str = "checkpoints/prior",
    ema_decay: float = 0.9999,
    seed: int = 0,
    log_every: int = 50,
):
    """Single-host loop (trainer_prior.py:29-70).  Resume restores the FULL
    TrainState (params, opt_state, EMA, step) — see train_unclip."""
    from .checkpoint import (
        latest_train_state,
        restore_train_state,
        save_checkpoint,
        save_train_state,
    )

    if tx is None:
        tx = optax.adafactor(learning_rate=5e-6)
    init_state, train_step = make_prior_train_step(
        prior, diffusion_config, tx, ema_decay=ema_decay
    )
    state = init_state(params)
    state_file, start_step = latest_train_state(save_path)
    if state_file:
        state = restore_train_state(state_file, state)
    train_step = jax.jit(train_step)
    rng = jax.random.PRNGKey(seed)
    step = start_step
    for _ in range(num_epochs):
        for raw in loader:
            state, metrics = train_step(state, prepare_batch(raw), rng)
            step += 1
            if step % log_every == 0:
                print(f"step {step}: loss {float(metrics['loss']):.5f}", flush=True)
            if step % save_every == 0:
                save_train_state(save_path, state, step)
    save_train_state(save_path, state, step)
    save_checkpoint(save_path, state.params, step)  # inference weight export
    return state
