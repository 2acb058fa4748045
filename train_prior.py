"""Prior fine-tuning CLI (reference: train_prior.py).

    python train_prior.py --config train_configs/config_prior.yaml
"""

from __future__ import annotations

import argparse

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    args = ap.parse_args()
    cfg = yaml.safe_load(open(args.config))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kandinsky2_tpu.models.prior import PriorTransformer
    from kandinsky2_tpu.models.text_encoders import CLIPTextTower, CLIPViT
    from kandinsky2_tpu.tokenizers import CLIPBPETokenizer
    from kandinsky2_tpu.train.checkpoint import load_checkpoint
    from kandinsky2_tpu.train.data import TextImageDataset, create_loader
    from kandinsky2_tpu.train.train_prior import train_prior
    from train_2_1_unclip import get_obj_from_str

    hp = cfg["model_config"]["model"]["hparams"]
    prior = PriorTransformer(
        text_ctx=hp["text_ctx"], xf_width=hp["xf_width"],
        xf_layers=hp["xf_layers"], xf_heads=hp["xf_heads"],
        xf_final_ln=hp["xf_final_ln"], clip_dim=hp["clip_dim"],
        clip_xf_width=hp["clip_xf_width"], dtype=jnp.bfloat16,
    )
    clip_text = CLIPTextTower(dtype=jnp.bfloat16)
    clip_vision = CLIPViT(dtype=jnp.bfloat16)
    tokenizer = CLIPBPETokenizer(cfg["bpe_path"]) if cfg.get("bpe_path") else None

    B = 1
    params = jax.jit(prior.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, hp["clip_dim"])), jnp.zeros((B,)),
        jnp.zeros((B, hp["clip_dim"])),
        jnp.zeros((B, hp["text_ctx"], hp["clip_xf_width"])),
        jnp.ones((B, hp["text_ctx"]), bool),
    )["params"]
    if cfg.get("params_path"):
        params = load_checkpoint(cfg["params_path"])
    text_params = jax.jit(clip_text.init)(
        jax.random.PRNGKey(1), jnp.zeros((B, 77), jnp.int32)
    )["params"]
    vis_params = jax.jit(clip_vision.init)(
        jax.random.PRNGKey(2), jnp.zeros((B, 224, 224, 3))
    )["params"]
    import torch

    clip_mean, clip_std = (
        torch.load(cfg["clip_mean_std_path"], map_location="cpu",
                   weights_only=False)
        if cfg.get("clip_mean_std_path")
        else (torch.zeros(hp["clip_dim"]), torch.ones(hp["clip_dim"]))
    )
    clip_mean = jnp.asarray(np.asarray(clip_mean.float()))[None]
    clip_std = jnp.asarray(np.asarray(clip_std.float()))[None]

    dtr = cfg["data"]["train"]
    dataset = TextImageDataset(
        csv_path=dtr["df_path"], tokenizer=tokenizer,
        clip_image_size=dtr.get("clip_image_size", 224),
        drop_text_prob=dtr.get("drop_text_prob", 0.1),
        seq_len=hp["text_ctx"], mode="prior",
    )
    loader = create_loader(
        dataset, batch_size=dtr.get("batch_size", 1),
        shuffle=dtr.get("shuffle", True),
    )

    text_fn = jax.jit(lambda t: clip_text.apply({"params": text_params}, t))
    vis_fn = jax.jit(lambda x: clip_vision.apply({"params": vis_params}, x))

    def prepare_batch(raw):
        seq, feat = text_fn(jnp.asarray(raw["tokens"]))
        img_emb = vis_fn(jnp.asarray(raw["clip_image"]))
        # train target is the clip_mean/std-normalized image embedding
        # (trainer_prior.py:44-51)
        return {
            "image_emb": (img_emb - clip_mean) / clip_std,
            "txt_feat": feat, "txt_feat_seq": seq,
            "mask": jnp.asarray(raw["mask"]),
        }

    opt = get_obj_from_str(cfg["optim_params"]["name"])(
        **cfg["optim_params"]["params"]
    )
    train_prior(
        prior=prior, params=params,
        diffusion_config=cfg["model_config"]["diffusion"], loader=loader,
        prepare_batch=prepare_batch, tx=opt,
        num_epochs=cfg.get("num_epochs", 1),
        save_every=cfg.get("save_every", 1000),
        save_path=cfg.get("save_path", "checkpoints/prior"),
    )


if __name__ == "__main__":
    main()
