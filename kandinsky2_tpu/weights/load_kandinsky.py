"""Assemble pipelines from the reference torch checkpoints.

Every model here was built with torch-identical module names, so loading is
``torch.load`` (host, CPU) -> :func:`convert_state_dict` -> flax pytree.
Sources (reference kandinsky2/__init__.py:90-161):

  decoder_fp16.ckpt / inpainting_fp16.ckpt -> Text2ImUNet21
  prior_fp16.ckpt (keys ``model.*``)       -> PriorTransformer
  movq_final.ckpt                          -> MOVQ
  text_encoder/pytorch_model.bin           -> MultilingualCLIP (XLM-R + head)
  ViT-L-14.pt (openai jit archive)         -> CLIPTextTower + CLIPViT
  ViT-L-14_stats.th                        -> (clip_mean, clip_std)
"""

from __future__ import annotations

import os


import numpy as np

from .convert import convert_state_dict


def _torch():
    import torch

    return torch


def _load_sd(path: str):
    torch = _torch()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def load_unet21(path: str, flax_params, inpainting: bool = False):
    sd = _load_sd(path)
    return convert_state_dict(sd, flax_params)


def load_prior21(path: str, flax_params):
    sd = _load_sd(path)
    return convert_state_dict(sd, flax_params, prefix="model.")


def load_movq(path: str, flax_params):
    sd = _load_sd(path)
    return convert_state_dict(sd, flax_params)


def load_text_encoder21(model_dir: str, flax_params):
    """text_encoder/pytorch_model.bin: keys transformer.* +
    LinearTransformation.*; our tree roots at model/..."""
    sd = _load_sd(os.path.join(model_dir, "pytorch_model.bin"))
    return convert_state_dict(
        sd, flax_params, rename=lambda k: k[len("model.") :], strict=False
    )


def load_clip_vit_l14(path: str, text_params, vision_params):
    """OpenAI CLIP jit archive -> (text tower params, vision tower params)."""
    from ..models.text_encoders import clip_rename

    torch = _torch()
    model = torch.jit.load(path, map_location="cpu")
    sd = model.state_dict()
    text_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    vis_sd = {k[len("visual.") :]: v for k, v in sd.items() if k.startswith("visual.")}
    text = convert_state_dict(text_sd, text_params, rename=clip_rename, strict=False)
    vision = convert_state_dict(vis_sd, vision_params, rename=clip_rename, strict=False)
    return text, vision


def load_clip_stats(path: str):
    torch = _torch()
    mean, std = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(mean.float().numpy()), np.asarray(std.float().numpy())


def build_kandinsky20(
    paths: dict,
    task_type: str = "text2img",
    dtype=None,
):
    """paths from weights.hub.fetch_2_0: UNet .pt, vae.ckpt, two HF text
    encoder dirs (kandinsky2/__init__.py:12-87)."""
    import jax
    import jax.numpy as jnp

    from ..pipelines.kandinsky2_0 import Kandinsky2

    dtype = dtype or jnp.bfloat16
    from transformers import AutoTokenizer

    tokenizer1 = AutoTokenizer.from_pretrained(paths["text_encoder1"])
    tokenizer2 = AutoTokenizer.from_pretrained(paths["text_encoder2"])
    pipe = Kandinsky2(
        tokenizer1=tokenizer1, tokenizer2=tokenizer2, task_type=task_type,
        dtype=dtype,
    )
    shapes = pipe.init_random_params()
    params = {
        "unet": convert_state_dict(_load_sd(paths["unet"]), shapes["unet"],
                                   strict=False),
        "image_encoder": convert_state_dict(
            _load_sd(paths["vae"]), shapes["image_encoder"], strict=False
        ),
        "text_encoder1": {
            "model": load_text_encoder21(
                paths["text_encoder1"], shapes["text_encoder1"]["model"]
            )
        },
        "text_encoder2": convert_state_dict(
            _load_sd(os.path.join(paths["text_encoder2"], "pytorch_model.bin")),
            shapes["text_encoder2"], strict=False,
        ),
    }
    pipe.params = jax.tree_util.tree_map(lambda a: jnp.asarray(a), params)
    return pipe


def build_kandinsky21(
    paths: dict,
    task_type: str = "text2img",
    dtype=None,
):
    """paths: dict from weights.hub.fetch_2_1 (or equivalent local files).
    Returns a ready Kandinsky2_1 pipeline."""
    import jax
    import jax.numpy as jnp

    from ..pipelines.kandinsky2_1 import Kandinsky2_1
    from ..tokenizers import CLIPBPETokenizer

    dtype = dtype or jnp.bfloat16
    from transformers import AutoTokenizer

    tokenizer1 = AutoTokenizer.from_pretrained(paths["text_encoder"])
    tokenizer2 = CLIPBPETokenizer(paths["bpe"])
    clip_mean, clip_std = load_clip_stats(paths["clip_stats"])
    pipe = Kandinsky2_1(
        tokenizer1=tokenizer1, tokenizer2=tokenizer2, clip_mean=clip_mean,
        clip_std=clip_std, task_type=task_type, dtype=dtype,
    )
    shapes = pipe.init_random_params()
    params = {
        "unet": load_unet21(paths["decoder"], shapes["unet"],
                            inpainting=task_type == "inpainting"),
        "prior": load_prior21(paths["prior"], shapes["prior"]),
        "movq": load_movq(paths["movq"], shapes["movq"]),
        "text_encoder": {
            "model": load_text_encoder21(
                paths["text_encoder"], shapes["text_encoder"]["model"]
            )
        },
    }
    text_p, vis_p = load_clip_vit_l14(
        paths["clip"], shapes["clip_text"], shapes["clip_vision"]
    )
    params["clip_text"] = text_p
    params["clip_vision"] = vis_p
    pipe.params = jax.tree_util.tree_map(lambda a: jnp.asarray(a), params)
    return pipe
