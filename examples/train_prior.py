"""Prior fine-tuning on dummy CLIP features (reference train_prior.ipynb)."""
import os, tempfile

import jax.numpy as jnp
import numpy as np
import optax

from common import argparser, make_pipe21
from kandinsky2_tpu.train.train_prior import train_prior

args = argparser().parse_args()
pipe, _ = make_pipe21(True)
hp = pipe.config["prior"]["params"]["model"]["hparams"]

def loader():
    rng = np.random.RandomState(0)
    for _ in range(8):
        yield {
            "image_emb": rng.randn(2, hp["clip_dim"]).astype(np.float32),
            "txt_feat": rng.randn(2, hp["clip_dim"]).astype(np.float32),
            "txt_feat_seq": rng.randn(2, hp["text_ctx"], hp["clip_xf_width"]).astype(np.float32),
            "mask": np.ones((2, hp["text_ctx"]), bool),
        }

tmp = tempfile.mkdtemp()
state = train_prior(
    prior=pipe.prior, params=pipe.params["prior"],
    diffusion_config=pipe.config["prior"]["params"]["diffusion"],
    loader=loader(), prepare_batch=lambda r: {k: jnp.asarray(v) for k, v in r.items()},
    tx=optax.adafactor(learning_rate=5e-6), save_every=4,
    save_path=os.path.join(tmp, "ckpt"), log_every=2,
)
print("trained to step", int(state.step))
