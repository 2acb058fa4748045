"""Progressive step distillation (Salimans & Ho 2022) as one jitted step.

Beyond the reference (which ships no distillation), this is the
training-side counterpart of the few-step samplers: a student copy of the
decoder UNet learns to cover TWO teacher DDIM steps in ONE of its own, so N
rounds of distillation halve the sampling ladder N times (1000 → 500 → …
→ 8-step students).  Production serving stacks this under the opt-in
samplers/turbo.

TPU-first shape: teacher (frozen) and student run inside the same jitted
program; the two teacher evals + one student eval + grad + optimizer update
compile into one XLA executable.  The teacher's 2-step DDIM target is
expressed in x0-space ("target prediction" from the paper's Appendix G),
which is well-conditioned at all SNRs.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class DistillState:
    params: Any  # student parameters (starts as a copy of the teacher)
    opt_state: Any
    step: jnp.ndarray


def init_distill_state(teacher_params, tx: optax.GradientTransformation):
    student = jax.tree_util.tree_map(jnp.array, teacher_params)
    return DistillState(
        params=student, opt_state=tx.init(student),
        step=jnp.zeros((), jnp.int32),
    )


def make_distill_step(
    eps_fn: Callable,
    teacher_params,
    alphas_cumprod,
    tx: optax.GradientTransformation,
    *,
    num_student_steps: int = 500,
    num_train_steps: int = 1000,
):
    """Build the jitted progressive-distillation step.

    ``eps_fn(params, x_t, t, cond) -> eps`` runs the decoder UNet (same
    contract as ``train_lora``).  The student's ladder is the uniform
    ``ddpm_ladder(num_student_steps)`` grid {0, 2d, 4d, ...}; each student
    step [t -> t-2d] must match two teacher DDIM steps [t -> t-d -> t-2d]
    where d = num_train_steps // (2 * num_student_steps) — so the trained
    timesteps are exactly the ladder the distilled student samples on.
    """
    acp = jnp.asarray(alphas_cumprod, jnp.float32)
    if num_train_steps % (2 * num_student_steps) != 0:
        raise ValueError(
            f"num_student_steps={num_student_steps} must divide "
            f"{num_train_steps}//2 exactly — otherwise the high-noise tail "
            "of the process is never trained (pick e.g. "
            f"{num_train_steps // 2}, {num_train_steps // 4}, ...)"
        )
    d = num_train_steps // (2 * num_student_steps)
    if d < 1:
        raise ValueError(
            f"num_student_steps={num_student_steps} too large for a "
            f"{num_train_steps}-step base process"
        )

    def a(t):  # abar, broadcastable over image dims
        return acp[t].reshape((-1, 1, 1, 1))

    def ddim_step(params, x, t, t_next, cond):
        """One deterministic DDIM step t -> t_next (eta=0)."""
        eps = eps_fn(params, x, t.astype(jnp.float32), cond).astype(jnp.float32)
        a_t, a_n = a(t), a(t_next)
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_n) * x0 + jnp.sqrt(1.0 - a_n) * eps

    def train_step(state: DistillState, x0, cond, rng):
        """``rng`` is consumed as-is (fold in the step count on the host)."""
        B = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        # student timesteps: the inference ladder {2d, 4d, ..., 2d(S-1)}
        # (ddpm_ladder grid); teacher chains t -> t-d -> t-2d exactly
        i = jax.random.randint(rng_t, (B,), 1, num_student_steps)
        t = i * 2 * d
        t_mid = t - d
        t_next = t - 2 * d
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)
        a_t = a(t)
        x_t = jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * noise

        # teacher: two DDIM steps, then express the result as an x0 target
        z_mid = ddim_step(teacher_params, x_t, t, t_mid, cond)
        z_next = ddim_step(teacher_params, z_mid, t_mid, t_next, cond)
        a_n = a(t_next)
        # solve z_next = sqrt(a_n) x0* + sqrt(1-a_n) eps*, with eps* implied
        # by (x_t, x0*): eps* = (x_t - sqrt(a_t) x0*) / sqrt(1-a_t)
        denom = jnp.sqrt(a_n) - jnp.sqrt((1.0 - a_n) / (1.0 - a_t)) * jnp.sqrt(a_t)
        x0_target = (
            z_next - jnp.sqrt((1.0 - a_n) / (1.0 - a_t)) * x_t
        ) / denom
        x0_target = jax.lax.stop_gradient(x0_target)

        # truncated-SNR weighting max(1, a/(1-a)) (paper eq. 9)
        w = jnp.maximum(1.0, a_t / (1.0 - a_t))

        def loss_fn(params):
            eps_s = eps_fn(params, x_t, t.astype(jnp.float32), cond)
            x0_s = (x_t - jnp.sqrt(1.0 - a_t) * eps_s.astype(jnp.float32)) / jnp.sqrt(a_t)
            return jnp.mean(w * (x0_s - x0_target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            DistillState(params=params, opt_state=opt_state,
                         step=state.step + 1),
            {"loss": loss},
        )

    return jax.jit(train_step, donate_argnums=(0,))
