"""Kandinsky 2.2 checkpoint ingestion (diffusers-format repos).

The 2.2 weights live in HF diffusers repos (kandinsky2_2_model.py:24-42):
kandinsky-community/kandinsky-2-2-prior (image_encoder, text_encoder, prior)
and .../kandinsky-2-2-decoder[-inpaint] / -controlnet-depth (unet, movq).

Our UNet22/PriorTransformer22/HFCLIPVision/HFCLIPText modules are named after
the diffusers state_dicts, so those convert mechanically.  The 2.2 MoVQ is a
diffusers ``VQModel`` whose block naming differs from the CompVis layout our
MOVQ uses; ``movq22_rename`` maps between them.

NOTE: the exact diffusers key inventory cannot be validated offline (zero
egress); the rename table follows diffusers' published VQModel structure and
is exercised against real checkpoints when network access exists.
"""

from __future__ import annotations

import os
import re

from .convert import convert_state_dict


def _load_diffusers_sd(repo_dir: str, subfolder: str):
    """Load a diffusers model state dict from a local snapshot dir
    (safetensors preferred, .bin fallback)."""
    base = os.path.join(repo_dir, subfolder)
    st = os.path.join(base, "diffusion_pytorch_model.safetensors")
    if not os.path.exists(st):
        st = os.path.join(base, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return load_file(st)
    import torch

    for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return torch.load(p, map_location="cpu", weights_only=False)
    raise FileNotFoundError(f"no model weights under {base}")


def movq22_rename(torch_key: str) -> str:
    """Map our CompVis-style MOVQ keys to diffusers VQModel keys.

    diffusers VQModel (kandinsky movq):
      encoder.down_blocks.{i}.resnets.{j}.{norm1,conv1,norm2,conv2,conv_shortcut}
      encoder.down_blocks.{i}.downsamplers.0.conv
      encoder.mid_block.resnets.{0,1}.*, encoder.mid_block.attentions.0.*
      decoder.up_blocks.{i}.resnets.{j}.* (spatial norms as norm1/norm2 with
      conv_y/conv_b inside MOVQ's SpatialNorm), decoder.mid_block.*
    """
    k = torch_key
    k = re.sub(r"^(encoder|decoder)\.down\.(\d+)\.block\.(\d+)\.",
               r"\1.down_blocks.\2.resnets.\3.", k)
    k = re.sub(r"^(encoder|decoder)\.down\.(\d+)\.attn\.(\d+)\.",
               r"\1.down_blocks.\2.attentions.\3.", k)
    k = re.sub(r"^(encoder|decoder)\.down\.(\d+)\.downsample\.conv\.",
               r"\1.down_blocks.\2.downsamplers.0.conv.", k)
    # decoder up levels are reversed between the layouts
    m = re.match(r"^decoder\.up\.(\d+)\.(block|attn|upsample)\.(.*)$", k)
    if m:
        level = 3 - int(m.group(1))
        kind, rest = m.group(2), m.group(3)
        if kind == "block":
            k = f"decoder.up_blocks.{level}.resnets.{rest}".replace(
                "resnets.", "resnets.", 1
            )
            k = re.sub(r"resnets\.(\d+)\.", r"resnets.\1.", k)
        elif kind == "attn":
            k = f"decoder.up_blocks.{level}.attentions.{rest}"
        else:
            k = f"decoder.up_blocks.{level}.upsamplers.0.{rest}"
    k = re.sub(r"^(encoder|decoder)\.mid\.block_([12])\.",
               lambda m: f"{m.group(1)}.mid_block.resnets.{int(m.group(2))-1}.", k)
    k = re.sub(r"^(encoder|decoder)\.mid\.attn_1\.",
               r"\1.mid_block.attentions.0.", k)
    k = re.sub(r"\bnin_shortcut\b", "conv_shortcut", k)
    k = re.sub(r"\bnorm_out\b", "conv_norm_out", k)
    # attention projection names (diffusers >=0.18 uses to_q/to_k/to_v/to_out)
    k = re.sub(r"\.q\.(weight|bias)$", r".to_q.\1", k)
    k = re.sub(r"\.k\.(weight|bias)$", r".to_k.\1", k)
    k = re.sub(r"\.v\.(weight|bias)$", r".to_v.\1", k)
    k = re.sub(r"\.proj_out\.(weight|bias)$", r".to_out.0.\1", k)
    return k


def load_unet22(repo_dir: str, flax_params, subfolder: str = "unet"):
    sd = _load_diffusers_sd(repo_dir, subfolder)
    return convert_state_dict(sd, flax_params, strict=False)


def load_prior22(repo_dir: str, flax_params, subfolder: str = "prior"):
    sd = _load_diffusers_sd(repo_dir, subfolder)
    return convert_state_dict(sd, flax_params, strict=False)


def load_movq22(repo_dir: str, flax_params, subfolder: str = "movq"):
    sd = _load_diffusers_sd(repo_dir, subfolder)
    return convert_state_dict(sd, flax_params, rename=movq22_rename, strict=False)


def load_image_encoder22(repo_dir: str, flax_params,
                         subfolder: str = "image_encoder"):
    sd = _load_diffusers_sd(repo_dir, subfolder)
    return convert_state_dict(sd, flax_params, strict=False)


def load_text_encoder22(repo_dir: str, flax_params,
                        subfolder: str = "text_encoder"):
    sd = _load_diffusers_sd(repo_dir, subfolder)
    return convert_state_dict(sd, flax_params, strict=False)


def build_kandinsky22(
    prior_dir: str,
    decoder_dir: str,
    task_type: str = "text2img",
    dtype=None,
    tokenizer=None,
):
    """Assemble a Kandinsky2_2 pipeline from local diffusers snapshots.

    The module layout (block types, widths, the ImageProjection token count,
    the prior's embedding layout) is read from the snapshots' config.json
    files — NOT hardcoded — via weights/configs22.py; num_image_tokens is
    additionally grounded in the actual unet weight shapes."""
    import jax
    import jax.numpy as jnp

    from ..pipelines.kandinsky2_2 import Kandinsky2_2
    from .configs22 import pipeline_overrides

    if tokenizer is None and os.path.isdir(os.path.join(prior_dir, "tokenizer")):
        from ..tokenizers.clip_bpe import CLIPBPETokenizer

        tokenizer = CLIPBPETokenizer.from_hf_dir(
            os.path.join(prior_dir, "tokenizer")
        )
    unet_sd = _load_diffusers_sd(decoder_dir, "unet")
    overrides = pipeline_overrides(
        prior_dir, decoder_dir, task_type, unet_sd=unet_sd
    )
    pipe = Kandinsky2_2(
        task_type=task_type, tokenizer=tokenizer, dtype=dtype or jnp.bfloat16,
        overrides=overrides,
    )
    shapes = pipe.init_random_params()
    params = {
        "unet": convert_state_dict(unet_sd, shapes["unet"], strict=False),
        "movq": load_movq22(decoder_dir, shapes["movq"]),
        "prior": load_prior22(prior_dir, shapes["prior"]),
        "image_encoder": load_image_encoder22(prior_dir, shapes["image_encoder"]),
        "text_encoder": load_text_encoder22(prior_dir, shapes["text_encoder"]),
    }
    pipe.params = jax.tree_util.tree_map(lambda a: jnp.asarray(a), params)
    return pipe
