"""Kandinsky 2.2 module hyperparameters FROM checkpoint configs, not code.

The reference's 2.2 architecture choices live in the diffusers snapshots'
``config.json`` files (kandinsky2/kandinsky2_2_model.py:26-42 instantiates
diffusers pipelines which read them).  This module is the single place that
maps those schemas onto our flax modules:

* ``load_model_config(repo_dir, subfolder)`` — read the real ``config.json``
  from a downloaded snapshot; fall back to the vendored fixtures under
  ``fixtures22/`` (the published values) when offline.
* ``*_overrides(cfg)`` — translate a diffusers/HF config dict into
  constructor kwargs for UNet22 / PriorTransformer22 / MOVQ /
  HFCLIPText / HFCLIPVision.
* ``derive_num_image_tokens(sd, cross_attention_dim)`` — the ImageProjection
  token count is NOT a config.json field in diffusers; the ground truth is
  the checkpoint tensor ``encoder_hid_proj.image_embeds.weight`` of shape
  ``[num_tokens * cross_attention_dim, encoder_hid_dim]``.  Deriving it from
  the weights makes the riskiest offline assumption self-correcting at load
  time.

Changing a fixture value (e.g. ``num_image_tokens``, ``up_block_types`` or
the prior's embedding order) flows through to the built model without code
edits — asserted by tests/test_configs22.py.
"""

from __future__ import annotations

import json
import os
from typing import Optional

_FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures22")

# our non-diffusers extension keys, allowed in fixtures/overrides
_EXT_UNET = ("num_image_tokens",)
_EXT_PRIOR = ("embedding_order",)


def load_model_config(
    repo_dir: Optional[str], subfolder: str, fixture: Optional[str] = None
) -> dict:
    """config dict for ``<repo_dir>/<subfolder>/config.json``; falls back to
    the vendored fixture ``fixtures22/<fixture or subfolder>.json``."""
    if repo_dir is not None:
        p = os.path.join(repo_dir, subfolder, "config.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    name = fixture or subfolder
    p = os.path.join(_FIXTURES, f"{name}.json")
    with open(p) as f:
        return json.load(f)


def unet22_overrides(cfg: dict, num_image_tokens: Optional[int] = None) -> dict:
    """diffusers UNet2DConditionModel config -> UNet22 kwargs."""
    out = dict(
        in_channels=cfg["in_channels"],
        out_channels=cfg["out_channels"],
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg["layers_per_block"],
        attention_head_dim=cfg["attention_head_dim"],
        cross_attention_dim=cfg["cross_attention_dim"],
        encoder_hid_dim=cfg["encoder_hid_dim"],
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        eps=cfg.get("norm_eps", 1e-5),
        controlnet_hint=cfg.get("addition_embed_type") == "image_hint",
    )
    if num_image_tokens is not None:
        out["num_image_tokens"] = num_image_tokens
    elif "num_image_tokens" in cfg:
        out["num_image_tokens"] = cfg["num_image_tokens"]
    return out


def prior22_overrides(cfg: dict) -> dict:
    """diffusers PriorTransformer config -> PriorTransformer22 kwargs."""
    out = dict(
        num_attention_heads=cfg["num_attention_heads"],
        attention_head_dim=cfg["attention_head_dim"],
        num_layers=cfg["num_layers"],
        embedding_dim=cfg["embedding_dim"],
        num_embeddings=cfg["num_embeddings"],
        additional_embeddings=cfg["additional_embeddings"],
    )
    if "embedding_order" in cfg:
        out["embedding_order"] = tuple(cfg["embedding_order"])
    return out


def movq22_overrides(cfg: dict) -> dict:
    """diffusers VQModel config -> MOVQ kwargs.  Attention placement is
    derived from the block types: an Attn* encoder block at level ``i`` of a
    256-px codec attends at resolution ``256 / 2**i``."""
    ch0 = cfg["block_out_channels"][0]
    resolution = 256  # pixel resolution the ch_mult ladder is defined at
    attn_res = tuple(
        resolution // (2**i)
        for i, t in enumerate(cfg["down_block_types"])
        if "Attn" in t
    )
    return dict(
        z_channels=cfg["latent_channels"],
        embed_dim=cfg["vq_embed_dim"],
        n_embed=cfg["num_vq_embeddings"],
        ch=ch0,
        ch_mult=tuple(c // ch0 for c in cfg["block_out_channels"]),
        num_res_blocks=cfg["layers_per_block"],
        attn_resolutions=attn_res,
        resolution=resolution,
        out_ch=cfg["out_channels"],
    )


def clip_text_overrides(cfg: dict) -> dict:
    """HF CLIPTextConfig -> HFCLIPText kwargs."""
    eot = cfg.get("eos_token_id", 49407)
    # some HF exports carry the generic eos_token_id=2; CLIP BPE's actual
    # end-of-text id is vocab_size-1 and that's where pooling happens
    if eot == 2:
        eot = cfg["vocab_size"] - 1
    return dict(
        vocab_size=cfg["vocab_size"],
        context_length=cfg["max_position_embeddings"],
        hidden=cfg["hidden_size"],
        layers=cfg["num_hidden_layers"],
        heads=cfg["num_attention_heads"],
        intermediate=cfg["intermediate_size"],
        projection_dim=cfg["projection_dim"],
        act=cfg.get("hidden_act", "gelu"),
        eps=cfg.get("layer_norm_eps", 1e-5),
        eot_token_id=eot,
    )


def clip_vision_overrides(cfg: dict) -> dict:
    """HF CLIPVisionConfig -> HFCLIPVision kwargs."""
    from ..models.text_encoders import exact_gelu, quick_gelu

    act = quick_gelu if cfg.get("hidden_act") == "quick_gelu" else exact_gelu
    return dict(
        image_size=cfg["image_size"],
        patch_size=cfg["patch_size"],
        hidden=cfg["hidden_size"],
        layers=cfg["num_hidden_layers"],
        heads=cfg["num_attention_heads"],
        intermediate=cfg["intermediate_size"],
        projection_dim=cfg["projection_dim"],
        act=act,
        eps=cfg.get("layer_norm_eps", 1e-5),
    )


def derive_num_image_tokens(sd: dict, cross_attention_dim: int) -> Optional[int]:
    """Read the ImageProjection token count off the actual checkpoint:
    ``encoder_hid_proj.image_embeds.weight`` is
    [num_tokens * cross_attention_dim, encoder_hid_dim]."""
    for key in (
        "encoder_hid_proj.image_embeds.weight",
        "encoder_hid_proj.image_projection.weight",
    ):
        if key in sd:
            rows = sd[key].shape[0]
            if rows % cross_attention_dim:
                raise ValueError(
                    f"{key} rows={rows} not divisible by "
                    f"cross_attention_dim={cross_attention_dim}"
                )
            return rows // cross_attention_dim
    return None


def pipeline_overrides(
    prior_dir: Optional[str],
    decoder_dir: Optional[str],
    task_type: str = "text2img",
    unet_sd: Optional[dict] = None,
) -> dict:
    """Full ``overrides`` dict for ``pipelines.Kandinsky2_2`` from the
    snapshot configs (or fixtures when offline).  ``unet_sd``, when given,
    grounds num_image_tokens in the actual weight shapes."""
    unet_fixture = {
        "text2img": "decoder__unet",
        "img2img": "decoder__unet",
        "inpainting": "decoder-inpaint__unet",
        "controlnet": "controlnet__unet",
    }[task_type]
    unet_cfg = load_model_config(decoder_dir, "unet", unet_fixture)
    n_tokens = None
    if unet_sd is not None:
        n_tokens = derive_num_image_tokens(
            unet_sd, unet_cfg["cross_attention_dim"]
        )
    return {
        "unet": unet22_overrides(unet_cfg, num_image_tokens=n_tokens),
        "movq": movq22_overrides(
            load_model_config(decoder_dir, "movq", "decoder__movq")
        ),
        "prior": prior22_overrides(
            load_model_config(prior_dir, "prior", "prior__prior")
        ),
        "text_encoder": clip_text_overrides(
            load_model_config(prior_dir, "text_encoder", "prior__text_encoder")
        ),
        "image_encoder": clip_vision_overrides(
            load_model_config(prior_dir, "image_encoder", "prior__image_encoder")
        ),
    }
