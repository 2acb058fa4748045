"""Training-timestep importance sampling (reference: kandinsky2/model/
resample.py).

* ``uniform_sample`` — UniformSampler (resample.py:57-63).
* ``LossAwareState`` + ``loss_aware_*`` — LossSecondMomentResampler
  (resample.py:115-145) as a pure pytree state that lives inside the jitted
  train step.  The reference's one distributed call — an all_gather of
  timesteps/losses across ranks so every worker keeps identical history
  (resample.py:77-98) — becomes ``jax.lax.all_gather`` over the mesh's data
  axis inside ``loss_aware_update`` when ``axis_name`` is given.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


def uniform_sample(rng, num_timesteps: int, batch_size: int):
    """(timesteps, importance weights=1)."""
    t = jax.random.randint(rng, (batch_size,), 0, num_timesteps)
    return t, jnp.ones((batch_size,), jnp.float32)


@struct.dataclass
class LossAwareState:
    history: jnp.ndarray  # [T, history_per_term] float32
    counts: jnp.ndarray  # [T] int32
    uniform_prob: float = struct.field(pytree_node=False, default=0.001)


def init_loss_aware(
    num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001
) -> LossAwareState:
    return LossAwareState(
        history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32),
        uniform_prob=uniform_prob,
    )


def loss_aware_weights(state: LossAwareState) -> jnp.ndarray:
    """sqrt second moment of the loss history, uniform until warmed up
    (resample.py:125-132)."""
    T, H = state.history.shape
    warmed = jnp.all(state.counts == H)
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1 - state.uniform_prob) + state.uniform_prob / T
    return jnp.where(warmed, w, jnp.ones((T,), jnp.float32))


def loss_aware_sample(rng, state: LossAwareState, batch_size: int):
    """Importance-sample timesteps; returns (t, 1/(T p_t)) (resample.py:39-54)."""
    w = loss_aware_weights(state)
    p = w / jnp.sum(w)
    t = jax.random.choice(rng, p.shape[0], (batch_size,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights.astype(jnp.float32)


def loss_aware_update(
    state: LossAwareState,
    ts: jnp.ndarray,
    losses: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> LossAwareState:
    """Append per-timestep losses to the history (FIFO once full,
    resample.py:134-142).  With ``axis_name``, first all_gather the batch
    across that mesh axis so all shards update identically
    (resample.py:77-98)."""
    if axis_name is not None:
        ts = jax.lax.all_gather(ts, axis_name).reshape(-1)
        losses = jax.lax.all_gather(losses, axis_name).reshape(-1)
    H = state.history.shape[1]

    def body(i, carry):
        history, counts = carry
        t = ts[i]
        loss = losses[i].astype(jnp.float32)
        c = counts[t]
        full = c == H
        row = history[t]
        shifted = jnp.concatenate([row[1:], jnp.array([loss])])
        appended = row.at[jnp.minimum(c, H - 1)].set(loss)
        history = history.at[t].set(jnp.where(full, shifted, appended))
        counts = counts.at[t].set(jnp.where(full, c, c + 1))
        return history, counts

    history, counts = jax.lax.fori_loop(
        0, ts.shape[0], body, (state.history, state.counts)
    )
    return state.replace(history=history, counts=counts)
