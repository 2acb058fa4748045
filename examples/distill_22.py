"""Progressive step distillation of the 2.2 decoder (beyond reference):
a student copy learns to cover two teacher DDIM steps per step, halving the
sampling ladder per round (Salimans & Ho 2022)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from common import argparser, make_pipe22
from kandinsky2_tpu.train.distill import init_distill_state, make_distill_step
from kandinsky2_tpu.train.train_lora import unet22_eps_fn

args = argparser().parse_args()
pipe, kw = make_pipe22(args.small)

if args.small:
    # random-init pipes keep zero_module output convs at 0 (degenerate
    # teacher); give them signal so the distill loss is meaningful
    from test_lora_train import _dezero

    pipe.params["unet"] = _dezero(pipe.params["unet"], jax.random.PRNGKey(1))

tx = optax.adam(1e-5)
step_fn = make_distill_step(
    unet22_eps_fn(pipe.unet), pipe.params["unet"],
    np.asarray(pipe._decoder_acp, np.float64), tx,
    num_student_steps=250,  # 1000-step teacher -> 500-eval (250x2) coverage
)
state = init_distill_state(pipe.params["unet"], tx)

B, lat = 2, (kw["h"] // 8 if args.small else 96)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, lat, lat, 4)) * 0.5, jnp.float32)
emb_dim = pipe.params["unet"]["encoder_hid_proj"]["image_embeds"]["kernel"].shape[0]
cond = jnp.asarray(rng.normal(size=(B, emb_dim)), jnp.float32)

key = jax.random.PRNGKey(2)
steps = args.steps or 10
for i in range(steps):
    state, m = step_fn(state, x0, cond, jax.random.fold_in(key, i))
    if i % max(1, steps // 10) == 0 or i == steps - 1:
        print(f"step {i}: distill loss {float(m['loss']):.5f}")

# swap the student in and sample with half the ladder
pipe.params["unet"] = state.params
imgs = pipe.generate_text2img(
    "a distilled landscape", decoder_steps=kw["decoder_steps"] // 2 or 2,
    prior_steps=kw["prior_steps"], h=kw["h"], w=kw["w"],
)
imgs[0].save(args.out)
print("saved", args.out, imgs[0].size)
