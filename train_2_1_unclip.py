"""Decoder (unCLIP 2.1) fine-tuning CLI (reference: train_2_1_unclip.py).

    python train_2_1_unclip.py --config train_configs/config_unclip_2_1.yaml

The YAML keeps the reference's field layout; the loop is the jitted TPU
train step from kandinsky2_tpu.train.train_unclip.  Frozen encoders (MoVQ,
XLM-R, CLIP visual) run in ``prepare_batch`` ahead of the step
(trainer_2_1_uclip.py:14-37 semantics); ``drop_first_layer`` reproduces the
inpainting-transfer first-conv surgery (train_2_1_unclip.py:23-29) by simply
re-initializing input_blocks.0.0 when shapes change.
"""

from __future__ import annotations

import argparse
import importlib

import yaml


def get_obj_from_str(path: str):
    """Dotted-path importer (reference model/utils.py:57-59)."""
    module, name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


class StubTokenizer:
    """Deterministic fallback when no tokenizer files are configured
    (smoke tests / CI without downloaded assets)."""

    def __init__(self, vocab_size=64):
        self.vocab_size = vocab_size

    def __call__(self, texts, max_length=77, **kw):
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        n = len(texts)
        ids = np.ones((n, max_length), np.int32)
        mask = np.zeros((n, max_length), np.int32)
        for i, t in enumerate(texts):
            L = min(max_length, 2 + len(t.split()))
            ids[i, :L] = 2 + (np.arange(L) % (self.vocab_size - 4))
            mask[i, :L] = 1
        return {"input_ids": ids, "attention_mask": mask}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu) for smoke runs")
    args = ap.parse_args()
    cfg = yaml.safe_load(open(args.config))

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from kandinsky2_tpu.configs import CONFIG_2_1, deep_copy_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1
    from kandinsky2_tpu.train.checkpoint import load_checkpoint
    from kandinsky2_tpu.train.data import TextImageDataset, create_loader
    from kandinsky2_tpu.train.masks import get_image_mask
    from kandinsky2_tpu.train.train_unclip import train_unclip

    pipe_cfg = deep_copy_config(CONFIG_2_1)
    pipe_cfg["model_config"].update(cfg["model_config"])
    pipe_cfg["image_enc_params"] = cfg["image_enc_params"]
    pipe_cfg["text_enc_params"].update(
        {k: v for k, v in cfg["text_enc_params"].items() if v}
    )
    # optional tower-size overrides (tiny configs for smoke tests / CI)
    for key in ("clip_text_params", "clip_vision_params", "clip_image_size",
                "prior"):
        if key in cfg:
            pipe_cfg[key] = cfg[key]
    from transformers import AutoTokenizer

    tok_name = cfg["data"]["train"].get("tokenizer_name")
    if tok_name:
        tokenizer1 = AutoTokenizer.from_pretrained(tok_name)
    else:
        tokenizer1 = StubTokenizer(
            cfg["text_enc_params"].get("vocab_size", 250002)
        )
    pipe = Kandinsky2_1(
        config=pipe_cfg, tokenizer1=tokenizer1, tokenizer2=None,
        task_type="inpainting" if cfg.get("inpainting") else "text2img",
        dtype=jnp.bfloat16,
    )
    pipe.init_random_params()
    if cfg.get("params_path"):
        pipe.params["unet"] = load_checkpoint(cfg["params_path"])

    dtr = cfg["data"]["train"]
    dataset = TextImageDataset(
        csv_path=dtr["df_path"], image_dir=dtr.get("image_dir", ""),
        tokenizer=tokenizer1,
        clip_image_size=dtr.get("clip_image_size", 224),
        image_size=dtr.get("image_size", 512),
        drop_text_prob=dtr.get("drop_text_prob", 0.5),
        drop_image_prob=dtr.get("drop_image_prob", 0.1),
        seq_len=dtr.get("seq_len", 77), mode="decoder",
    )
    loader = create_loader(
        dataset, batch_size=dtr.get("batch_size", 1),
        shuffle=dtr.get("shuffle", True),
    )
    inpainting = bool(cfg.get("inpainting"))

    def prepare_batch(raw):
        img = jnp.asarray(raw["image"])
        lat = pipe._movq_encode(img) * pipe.scale
        full, pooled = pipe.text_encoder.apply(
            {"params": pipe.params["text_encoder"]},
            jnp.asarray(raw["tokens"]), jnp.asarray(raw["mask"]),
        )
        image_emb = pipe.encode_images(jnp.asarray(raw["clip_image"]))
        batch = {
            "image_latents": lat, "full_emb": full, "pooled_emb": pooled,
            "image_emb": image_emb,
        }
        if inpainting:
            B, lh, lw = lat.shape[0], lat.shape[1], lat.shape[2]
            m = get_image_mask(B, (lh, lw))[..., None].astype("float32")
            batch["inpaint_mask"] = jnp.asarray(m)
            batch["inpaint_image"] = lat * jnp.asarray(m)
        return batch

    opt = get_obj_from_str(cfg["optim_params"]["name"])(
        **cfg["optim_params"]["params"]
    )
    train_unclip(
        unet=pipe.unet, params=pipe.params["unet"],
        diffusion_config=cfg["diffusion_config"], loader=loader,
        prepare_batch=prepare_batch, tx=opt,
        num_epochs=cfg.get("num_epochs", 1),
        save_every=cfg.get("save_every", 1000),
        save_path=cfg.get("save_path", "checkpoints/unclip"),
        schedule_sampler=cfg.get("schedule_sampler", "uniform"),
        inpainting=inpainting,
        freeze_resblocks=cfg["freeze"]["freeze_resblocks"],
        freeze_attention=cfg["freeze"]["freeze_attention"],
        remat=bool(cfg.get("remat", False)),
        # parallel: {data: D, sp: S} -> shard_map'ed spatial x data step;
        # parallel: {fsdp: N} -> ZeRO-sharded TrainState over N devices
        mesh_shape=(
            (cfg["parallel"].get("data", 1), cfg["parallel"].get("sp", 1))
            if cfg.get("parallel") and "fsdp" not in cfg.get("parallel", {})
            else None
        ),
        fsdp=(cfg.get("parallel") or {}).get("fsdp"),
        accum_steps=int(cfg.get("accum_steps", 1)),
    )


if __name__ == "__main__":
    main()
