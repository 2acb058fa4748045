"""Full-architecture checkpoint-key parity: our FULL-SIZE flax trees must map
1:1 onto the torch reference's state_dict keys (meta-device instantiation, so
no weights are allocated).  Tiny-config parity tests cannot catch block-index
or depth mistakes at the real channel_mult/(res-block count); this can."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.configs import CONFIG_2_1, create_model
from kandinsky2_tpu.models.movq import MOVQ
from kandinsky2_tpu.models.prior import PriorTransformer
from kandinsky2_tpu.weights.convert import torch_key_for

from ref_loader import ref_model, ref_vqgan


def flax_torch_keys(shapes_tree):
    flat = jax.tree_util.tree_flatten_with_path(shapes_tree)[0]
    keys = set()
    for keypath, _ in flat:
        names = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        keys.add(torch_key_for(names))
    return keys


def test_unet21_fullsize_keys():
    refmc = ref_model("model_creation")
    cfg = dict(CONFIG_2_1["model_config"])
    cfg["inpainting"] = False
    cfg["up"] = False
    with torch.device("meta"):
        ref = refmc.create_model(**cfg)
    ref_keys = set(ref.state_dict().keys())

    ours = create_model(**cfg, dtype=jnp.float32)
    B = 1
    shapes = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros((B, 8, 8, 4)), jnp.zeros((B,)),
            full_emb=jnp.zeros((B, 77, cfg["text_encoder_in_dim1"])),
            pooled_emb=jnp.zeros((B, cfg["text_encoder_in_dim2"])),
            image_emb=jnp.zeros((B, cfg["image_encoder_in_dim"])),
        )
    )["params"]
    our_keys = flax_torch_keys(shapes)
    missing = ref_keys - our_keys
    extra = our_keys - ref_keys
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:8]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:8]}"


def test_prior_fullsize_keys():
    refprior = ref_model("prior")
    hp = CONFIG_2_1["prior"]["params"]["model"]["hparams"]
    with torch.device("meta"):
        ref = refprior.PriorTransformer(
            text_ctx=hp["text_ctx"], xf_width=hp["xf_width"],
            xf_layers=hp["xf_layers"], xf_heads=hp["xf_heads"],
            xf_final_ln=hp["xf_final_ln"], xf_padding=hp["xf_padding"],
            clip_dim=hp["clip_dim"], clip_xf_width=hp["clip_xf_width"],
        )
    ref_keys = set(ref.state_dict().keys())
    ours = PriorTransformer(
        text_ctx=hp["text_ctx"], xf_width=hp["xf_width"],
        xf_layers=hp["xf_layers"], xf_heads=hp["xf_heads"],
        xf_final_ln=hp["xf_final_ln"], clip_dim=hp["clip_dim"],
        clip_xf_width=hp["clip_xf_width"],
    )
    B = 1
    shapes = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros((B, hp["clip_dim"])),
            jnp.zeros((B,)), jnp.zeros((B, hp["clip_dim"])),
            jnp.zeros((B, hp["text_ctx"], hp["clip_xf_width"])),
            jnp.ones((B, hp["text_ctx"]), bool),
        )
    )["params"]
    our_keys = flax_torch_keys(shapes)
    assert our_keys == ref_keys, (
        sorted(ref_keys - our_keys)[:8], sorted(our_keys - ref_keys)[:8]
    )


def test_movq_fullsize_keys():
    refae = ref_vqgan("autoencoder")
    ie = CONFIG_2_1["image_enc_params"]["params"]
    with torch.device("meta"):
        ref = refae.MOVQ(ie["ddconfig"], n_embed=ie["n_embed"],
                         embed_dim=ie["embed_dim"])
    ref_keys = set(ref.state_dict().keys())
    dd = ie["ddconfig"]
    ours = MOVQ(
        z_channels=dd["z_channels"], embed_dim=ie["embed_dim"],
        n_embed=ie["n_embed"], ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]),
        num_res_blocks=dd["num_res_blocks"],
        attn_resolutions=tuple(dd["attn_resolutions"]),
        resolution=dd["resolution"],
    )
    shapes = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )["params"]
    our_keys = flax_torch_keys(shapes)
    assert our_keys == ref_keys, (
        sorted(ref_keys - our_keys)[:8], sorted(our_keys - ref_keys)[:8]
    )


def test_xlmr_fullsize_keys():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    from kandinsky2_tpu.models.text_encoders import TextEncoder

    cfg = XLMRobertaConfig()  # base dims differ but key NAMES scale-invariant
    cfg.num_hidden_layers = 24
    with torch.device("meta"):
        ref = XLMRobertaModel(cfg, add_pooling_layer=False)
    ref_keys = {f"model.transformer.{k}" for k in ref.state_dict().keys()}
    ref_keys |= {"model.LinearTransformation.weight",
                 "model.LinearTransformation.bias"}
    ours = TextEncoder(model_name="multiclip")
    shapes = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32),
            jnp.ones((1, 77), jnp.int32),
        )
    )["params"]
    our_keys = flax_torch_keys(shapes)
    # HF includes embeddings.position_ids buffer in some versions; ignore
    ref_keys = {k for k in ref_keys if not k.endswith("position_ids")}
    assert our_keys == ref_keys, (
        sorted(ref_keys - our_keys)[:8], sorted(our_keys - ref_keys)[:8]
    )
