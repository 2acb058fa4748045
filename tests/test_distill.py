"""Progressive step distillation: the student descends toward the teacher's
2-step DDIM behavior, teacher stays frozen."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from kandinsky2_tpu.train.distill import (
    init_distill_state,
    make_distill_step,
)
from kandinsky2_tpu.train.train_lora import unet22_eps_fn
from test_lora_train import _dezero


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    from test_pipeline22 import make_pipe

    pipe = make_pipe("text2img")
    pipe.params["unet"] = _dezero(pipe.params["unet"], jax.random.PRNGKey(1))
    tx = optax.adam(1e-4)
    step_fn = make_distill_step(
        unet22_eps_fn(pipe.unet), pipe.params["unet"],
        np.asarray(pipe._decoder_acp), tx, num_student_steps=250,
    )
    new_state = lambda: init_distill_state(
        jax.tree_util.tree_map(jnp.array, pipe.params["unet"]), tx
    )
    return pipe, step_fn, new_state


def test_distill_loss_decreases(setup):
    pipe, step_fn, new_state = setup
    state = new_state()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)) * 0.5, jnp.float32)
    cond = jnp.asarray(rng.normal(size=(2, 32)), jnp.float32)
    teacher_before = jax.tree_util.tree_map(np.asarray, pipe.params["unet"])

    losses = []
    for _ in range(25):  # fixed rng => deterministic objective
        state, m = step_fn(state, x0, cond, jax.random.PRNGKey(5))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[0] > 0, "student(=teacher copy) 1-step != teacher 2-step"
    assert losses[-1] < 0.7 * losses[0], losses

    # teacher untouched
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(teacher_before)[0],
        jax.tree_util.tree_flatten_with_path(pipe.params["unet"])[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distill_ladder_guard(setup):
    pipe, _, _ = setup
    # non-divisible student count would silently skip the high-noise tail
    for bad in (300, 1000):
        with pytest.raises(ValueError, match="divide"):
            make_distill_step(
                unet22_eps_fn(pipe.unet), pipe.params["unet"],
                np.asarray(pipe._decoder_acp), optax.adam(1e-4),
                num_student_steps=bad,
            )


def test_distill_timesteps_match_inference_ladder(setup):
    """The trained student timesteps are exactly the ddpm_ladder grid the
    distilled model samples on (no train/inference timestep bias)."""
    from kandinsky2_tpu.diffusion.paired import ddpm_ladder

    S, T = 250, 1000
    d = T // (2 * S)
    trained = {i * 2 * d for i in range(1, S)}
    ladder = set(int(t) for t in ddpm_ladder(S, T))
    assert trained <= ladder
