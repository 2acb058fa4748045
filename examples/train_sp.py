"""Spatial x data parallel decoder training: latent ROWS sharded over the
mesh's "sp" axis, examples over "data", inside ONE shard_map'ed train step
(kandinsky2_tpu/train/train_unclip.make_spdp_train_fn).

Row-sharding divides the UNet's backward activation memory by the sp-axis
size — the scale-out path for training at resolutions one chip cannot hold
(the torch reference needs 80 GB GPUs for full-size 768² training;
reference: train_utils/trainer_2_1_uclip.py:39-81).  Gradients are exactly
the single-device gradients (tests/test_spatial_parallel.py).

Run on the virtual CPU mesh (no TPU pod needed to see it work):

    python examples/train_sp.py --cpu 8 --data 2 --sp 4

Synthetic batch here — swap in MoVQ-encoded latents + text/CLIP embeddings
from your dataset for real tuning.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", type=int, default=0, metavar="N",
                help="force an N-device virtual CPU mesh (env vars alone "
                "lose the platform race to the ambient TPU plugin)")
ap.add_argument("--data", type=int, default=1, help="data-parallel axis size")
ap.add_argument("--sp", type=int, default=1, help="spatial (row) axis size")
ap.add_argument("--res", type=int, default=128, help="training image res "
                "(latent = res/8; latent rows must divide sp*2^3)")
ap.add_argument("--steps", type=int, default=5)
ap.add_argument("--full", action="store_true",
                help="real 1.22B UNet config instead of the demo-size one")
args = ap.parse_args()

if args.cpu:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.cpu}"
    )
import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from kandinsky2_tpu.configs import CONFIG_2_1, create_model, deep_copy_config

ndev = args.data * args.sp
devs = jax.devices()
assert len(devs) >= ndev, f"need {ndev} devices, have {len(devs)}"
mesh = Mesh(np.asarray(devs[:ndev]).reshape(args.data, args.sp), ("data", "sp"))

cfg = deep_copy_config(CONFIG_2_1)
mc = cfg["model_config"]
if not args.full:
    mc.update(
        num_channels=32, num_res_blocks=1, channel_mult="1,2",
        attention_resolutions="32", num_head_channels=16, model_dim=32,
        text_encoder_in_dim1=16, text_encoder_in_dim2=32,
        image_encoder_in_dim=32, num_image_embs=2,
    )
mc["inpainting"] = False
unet = create_model(**mc, dtype=jnp.float32)

lat = args.res // 8
levels = len(mc["channel_mult"].split(","))
need = args.sp * 2 ** (levels - 1)
assert lat % need == 0, (
    f"latent height {lat} must divide sp*2^(levels-1) = {need}"
)

B = 2 * args.data
rng = np.random.default_rng(0)
batch = {
    "image_latents": jnp.asarray(
        rng.normal(size=(B, lat, lat, 4)) * 0.5, jnp.float32
    ),
    "full_emb": jnp.asarray(
        rng.normal(size=(B, 77, mc["text_encoder_in_dim1"])), jnp.float32
    ),
    "pooled_emb": jnp.asarray(
        rng.normal(size=(B, mc["text_encoder_in_dim2"])), jnp.float32
    ),
    "image_emb": jnp.asarray(
        rng.normal(size=(B, mc["image_encoder_in_dim"])), jnp.float32
    ),
}

t0 = jnp.zeros((B,))
params = jax.jit(lambda: unet.init(
    jax.random.PRNGKey(0), batch["image_latents"], t0,
    full_emb=batch["full_emb"], pooled_emb=batch["pooled_emb"],
    image_emb=batch["image_emb"],
))()["params"]
n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"UNet {n_par/1e6:.1f}M params, mesh {mesh.devices.shape} (data x sp), "
      f"latent {lat}² rows sharded {args.sp}-way")

from kandinsky2_tpu.train.train_unclip import make_spdp_train_fn

init_state, train_fn = make_spdp_train_fn(
    unet, cfg["diffusion_config"], optax.adafactor(learning_rate=5e-6), mesh,
    schedule_sampler="loss-second-moment", ema_decay=None,
    remat=args.full,  # full-size backward needs rematerialization
)
state = init_state(params)

import time

key = jax.random.PRNGKey(1)
for i in range(args.steps):
    t = time.time()
    state, metrics = train_fn(state, batch, key)
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    print(f"step {int(jax.device_get(state.step))}: {m} "
          f"({time.time()-t:.2f}s)", flush=True)

print("SP training OK")
