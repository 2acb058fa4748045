"""2.1 decoder fine-tuning on a 1-image dummy dataset, end-to-end
(reference notebooks/train_2_1_unclip.ipynb + train_2_1_unclip.py)."""
import os, tempfile

import jax.numpy as jnp
import numpy as np
import optax

from common import argparser, make_pipe21, random_image
from kandinsky2_tpu.train.train_unclip import train_unclip

args = argparser().parse_args()
pipe, _ = make_pipe21(True)  # tiny config; swap for real checkpoints

# 1-image dummy CSV dataset, like the reference training notebook
tmp = tempfile.mkdtemp()
random_image(64).save(os.path.join(tmp, "img.png"))
with open(os.path.join(tmp, "data.csv"), "w") as f:
    f.write("image_name,caption\nimg.png,a test image\n")

def loader():
    for _ in range(8):
        yield {"image": np.asarray(random_image(64), np.float32) / 127.5 - 1}

def prepare_batch(raw):
    img = jnp.asarray(raw["image"])[None]
    lat = pipe._movq_encode(img) * pipe.scale
    full, pooled = pipe.encode_text("a test image", 1)
    zero = pipe.create_zero_img_emb(1)
    return {
        "image_latents": lat, "full_emb": full[:1],
        "pooled_emb": pooled[:1], "image_emb": zero,
    }

state = train_unclip(
    unet=pipe.unet, params=pipe.params["unet"],
    diffusion_config=pipe.config["diffusion_config"], loader=loader(),
    prepare_batch=prepare_batch, tx=optax.adafactor(learning_rate=5e-6),
    save_every=4, save_path=os.path.join(tmp, "ckpt"),
    freeze_resblocks=True, log_every=2,
)
print("trained to step", int(state.step), "checkpoints in", tmp)
