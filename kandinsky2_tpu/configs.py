"""Model/diffusion configuration (reference: kandinssky2/configs.py) and the
model factory (reference: kandinsky2/model/model_creation.py).

Configs keep the reference's nested-dict shape and field names so reference
YAML/dict configs translate 1:1; the factory maps them to our flax modules.
"""

from __future__ import annotations

import copy
from typing import Any

import jax.numpy as jnp

from .models.unet import (
    InpaintText2ImUNet20,
    InpaintText2ImUNet21,
    Text2ImUNet20,
    Text2ImUNet21,
)

CONFIG_2_0: dict[str, Any] = {
    "model_config": {
        "image_size": 64,
        "num_channels": 384,
        "num_res_blocks": 3,
        "channel_mult": "",
        "num_heads": 1,
        "num_head_channels": 64,
        "num_heads_upsample": -1,
        "attention_resolutions": "32,16,8",
        "dropout": 0,
        "model_dim": 768,
        "use_scale_shift_norm": True,
        "resblock_updown": True,
        "use_fp16": False,
        "cache_text_emb": True,
        "text_encoder_in_dim1": 1024,
        "text_encoder_in_dim2": 640,
        "pooling_type": "from_model",
        "in_channels": 4,
        "out_channels": 8,
        "up": False,
        "inpainting": False,
    },
    "diffusion_config": {
        "learn_sigma": True,
        "sigma_small": False,
        "steps": 1000,
        "noise_schedule": "linear",
        "timestep_respacing": "",
        "use_kl": False,
        "predict_xstart": False,
        "rescale_timesteps": True,
        "rescale_learned_sigmas": True,
        "linear_start": 0.0001,
        "linear_end": 0.02,
    },
    "image_enc_params": {
        "name": "AutoencoderKL",
        "scale": 0.0512,
        "params": {
            "embed_dim": 4,
            "ddconfig": {
                "double_z": True,
                "z_channels": 4,
                "resolution": 256,
                "in_channels": 3,
                "out_ch": 3,
                "ch": 128,
                "ch_mult": [1, 2, 4, 4],
                "num_res_blocks": 2,
                "attn_resolutions": [],
                "dropout": 0.0,
            },
        },
    },
    "text_enc_params1": {"model_path": "", "model_name": "multiclip"},
    "text_enc_params2": {"model_path": "", "model_name": "MT5EncoderModel"},
    "tokenizer_name1": "",
    "tokenizer_name2": "",
}

CONFIG_2_1: dict[str, Any] = {
    "clip_name": "ViT-L/14",
    "clip_image_size": 224,
    "tokenizer_name": "",
    "image_enc_params": {
        "name": "MOVQ",
        "scale": 1,
        "ckpt_path": "",
        "params": {
            "embed_dim": 4,
            "n_embed": 16384,
            "ddconfig": {
                "double_z": False,
                "z_channels": 4,
                "resolution": 256,
                "in_channels": 3,
                "out_ch": 3,
                "ch": 128,
                "ch_mult": [1, 2, 2, 4],
                "num_res_blocks": 2,
                "attn_resolutions": [32],
                "dropout": 0.0,
            },
        },
    },
    "text_enc_params": {
        "model_path": "",
        "model_name": "multiclip",
        "in_features": 1024,
        "out_features": 768,
    },
    "prior": {
        "clip_mean_std_path": "ViT-L-14_stats.th",
        "params": {
            "model": {
                "type": "prior",
                "diffusion_sampler": "uniform",
                "hparams": {
                    "text_ctx": 77,
                    "xf_width": 2048,
                    "xf_layers": 20,
                    "xf_heads": 32,
                    "xf_final_ln": True,
                    "xf_padding": False,
                    "text_drop": 0.2,
                    "clip_dim": 768,
                    "clip_xf_width": 768,
                },
            },
            "diffusion": {
                "steps": 1000,
                "learn_sigma": False,
                "sigma_small": True,
                "noise_schedule": "cosine",
                "use_kl": False,
                "predict_xstart": True,
                "rescale_learned_sigmas": False,
                "timestep_respacing": "",
            },
        },
    },
    "model_config": {
        "version": "2.1",
        "image_size": 64,
        "num_channels": 384,
        "num_res_blocks": 3,
        "channel_mult": "",
        "num_heads": 1,
        "num_head_channels": 64,
        "num_heads_upsample": -1,
        "attention_resolutions": "32,16,8",
        "dropout": 0,
        "model_dim": 768,
        "use_scale_shift_norm": True,
        "resblock_updown": True,
        "use_fp16": True,
        "cache_text_emb": True,
        "text_encoder_in_dim1": 1024,
        "text_encoder_in_dim2": 768,
        "image_encoder_in_dim": 768,
        "num_image_embs": 10,
        "pooling_type": "from_model",
        "in_channels": 4,
        "out_channels": 8,
        "use_flash_attention": False,
    },
    "diffusion_config": {
        "learn_sigma": True,
        "sigma_small": False,
        "steps": 1000,
        "noise_schedule": "linear",
        "timestep_respacing": "",
        "use_kl": False,
        "predict_xstart": False,
        "rescale_timesteps": True,
        "rescale_learned_sigmas": True,
        "linear_start": 0.00085,
        "linear_end": 0.012,
    },
}


def parse_channel_mult(channel_mult: str, image_size: int):
    """model_creation.py:34-44."""
    if channel_mult == "":
        return {256: (1, 1, 2, 2, 4, 4), 128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4)}[
            image_size
        ]
    return tuple(int(m) for m in channel_mult.split(","))


def parse_attention_ds(attention_resolutions: str, image_size: int):
    """model_creation.py:46-48: pixel resolutions -> downsample rates."""
    return tuple(image_size // int(r) for r in attention_resolutions.split(","))


def create_model(
    *,
    image_size,
    num_channels,
    num_res_blocks,
    channel_mult,
    attention_resolutions,
    num_heads,
    num_head_channels,
    num_heads_upsample,
    use_scale_shift_norm,
    dropout=0.0,
    model_dim,
    resblock_updown,
    use_fp16,
    cache_text_emb=True,
    text_encoder_in_dim1,
    text_encoder_in_dim2,
    pooling_type,
    in_channels,
    out_channels,
    up=False,
    inpainting=False,
    version="2.0",
    image_encoder_in_dim=768,
    num_image_embs=10,
    use_flash_attention=False,
    dtype=None,
    **_unused,
):
    """Config dict -> UNet flax module (model_creation.py:9-83).  ``dtype``
    overrides the use_fp16 flag (bf16 is the TPU-native half precision)."""
    if dtype is None:
        dtype = jnp.bfloat16 if use_fp16 else jnp.float32
    cm = parse_channel_mult(channel_mult, image_size)
    ds = parse_attention_ds(attention_resolutions, image_size)
    common = dict(
        model_channels=num_channels,
        out_channels=out_channels,
        num_res_blocks=num_res_blocks,
        attention_resolutions=ds,
        channel_mult=cm,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_encoder_kv=True,
        model_dim=model_dim,
        text_encoder_in_dim1=text_encoder_in_dim1,
        text_encoder_in_dim2=text_encoder_in_dim2,
        pooling_type=pooling_type,
        dtype=dtype,
    )
    eff_in = in_channels * 2 + 1 if inpainting else in_channels
    if version == "2.1":
        cls = InpaintText2ImUNet21 if inpainting else Text2ImUNet21
        return cls(
            in_channels=eff_in,
            image_encoder_in_dim=image_encoder_in_dim,
            num_image_embs=num_image_embs,
            **common,
        )
    if version == "2.0":
        cls = InpaintText2ImUNet20 if inpainting else Text2ImUNet20
        return cls(in_channels=eff_in, **common)
    raise ValueError(f"unknown version {version}")


def schedule_kwargs(diffusion_config: dict, timestep_respacing=None) -> dict:
    """diffusion_config dict -> make_schedule kwargs + sampler types
    (model_creation.py:86-128)."""
    from .diffusion import LossType, MeanType, VarType

    dc = diffusion_config
    if dc.get("use_kl"):
        loss_type = LossType.RESCALED_KL
    elif dc.get("rescale_learned_sigmas"):
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    mean_type = MeanType.START_X if dc.get("predict_xstart") else MeanType.EPSILON
    if dc.get("learn_sigma"):
        var_type = VarType.LEARNED_RANGE
    else:
        var_type = VarType.FIXED_SMALL if dc.get("sigma_small") else VarType.FIXED_LARGE
    respacing = (
        timestep_respacing
        if timestep_respacing is not None
        else dc.get("timestep_respacing", "")
    )
    return dict(
        make_schedule=dict(
            steps=dc.get("steps", 1000),
            noise_schedule=dc.get("noise_schedule", "linear"),
            timestep_respacing=respacing,
            linear_start=dc.get("linear_start", 0.0001),
            linear_end=dc.get("linear_end", 0.02),
            rescale_timesteps=dc.get("rescale_timesteps", False),
        ),
        mean_type=mean_type,
        var_type=var_type,
        loss_type=loss_type,
    )


def deep_copy_config(cfg: dict) -> dict:
    return copy.deepcopy(cfg)
