"""Rank-4 LoRA fine-tuning of the 2.2 decoder UNet
(reference: notebooks/lora_decoder.ipynb -> diffusers tune_decoder_lora.py).

Only the {down, up} factor pairs train; the 1.22B base stays frozen, so the
optimizer state is a few MB and the jitted step fits wherever inference does.
Synthetic batch here — swap in MoVQ-encoded latents + ViT-bigG image
embeddings from your dataset for real tuning.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from common import argparser, make_pipe22
from kandinsky2_tpu.models.lora import init_lora, merge_lora
from kandinsky2_tpu.train.train_lora import (
    init_lora_train_state,
    make_lora_train_step,
    unet22_eps_fn,
)

args = argparser().parse_args()
pipe, kw = make_pipe22(args.small)

rank = 4
loras = init_lora(pipe.params["unet"], jax.random.PRNGKey(0), rank=rank)
print(f"{len(loras)} attention kernels adapted at rank {rank}")

tx = optax.adamw(1e-4)
step_fn = make_lora_train_step(
    unet22_eps_fn(pipe.unet), pipe.params["unet"],
    np.asarray(pipe._decoder_acp, np.float64), tx,
)
state = init_lora_train_state(loras, tx)

# synthetic latents (stand-in for MoVQ-encoded training images) + image embs
B, lat = 2, (kw["h"] // 8 if args.small else 96)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, lat, lat, 4)) * 0.5, jnp.float32)
emb_dim = (
    pipe.params["unet"]["encoder_hid_proj"]["image_embeds"]["kernel"].shape[0]
)
cond = jnp.asarray(rng.normal(size=(B, emb_dim)), jnp.float32)

key = jax.random.PRNGKey(1)
steps = args.steps or 10
for i in range(steps):
    state, metrics = step_fn(state, x0, cond, jax.random.fold_in(key, i))
    if i % max(1, steps // 10) == 0 or i == steps - 1:
        print(f"step {i}: loss {float(metrics['loss']):.4f}")

pipe.params["unet"] = merge_lora(pipe.params["unet"], state.loras, scale=1.0)
print("merged trained LoRA into the decoder; generating...")
imgs = pipe.generate_text2img("a portrait in the tuned style", **kw)
imgs[0].save(args.out)
print("saved", args.out, imgs[0].size)
