"""The 2.2 layout is config-driven: vendored diffusers config.json fixtures
(weights/fixtures22) map onto the flax modules through weights/configs22.py,
and changing a fixture value (num_image_tokens, block types, the prior's
embedding order) flows through to the built model WITHOUT code edits
(VERDICT r1 item 3; reference anchor kandinsky2_2_model.py:26-42)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from kandinsky2_tpu.models.prior22 import PriorTransformer22
from kandinsky2_tpu.models.unet22 import UNet22
from kandinsky2_tpu.weights.configs22 import (
    clip_text_overrides,
    clip_vision_overrides,
    derive_num_image_tokens,
    load_model_config,
    movq22_overrides,
    pipeline_overrides,
    prior22_overrides,
    unet22_overrides,
)

TINY_UNET_CFG = {
    "in_channels": 4,
    "out_channels": 8,
    "block_out_channels": [32, 64],
    "layers_per_block": 1,
    "attention_head_dim": 16,
    "cross_attention_dim": 32,
    "encoder_hid_dim": 48,
    "down_block_types": ["ResnetDownsampleBlock2D", "SimpleCrossAttnDownBlock2D"],
    "up_block_types": ["SimpleCrossAttnUpBlock2D", "ResnetUpsampleBlock2D"],
    "norm_eps": 1e-5,
    "addition_embed_type": "image",
}


def _init_unet(cfg, **extra):
    unet = UNet22(**unet22_overrides(cfg, **extra))
    x = jnp.zeros((1, 8, 8, cfg["in_channels"]))
    emb = jnp.zeros((1, cfg["encoder_hid_dim"]))
    params = jax.jit(
        lambda: unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), emb)
    )()["params"]
    return unet, params


def test_fixtures_match_published_values():
    ov = pipeline_overrides(None, None, "text2img")
    assert ov["unet"]["block_out_channels"] == (384, 768, 1280, 1536)
    assert ov["unet"]["controlnet_hint"] is False
    assert ov["prior"]["num_layers"] == 20
    assert ov["prior"]["embedding_dim"] == 1280
    assert ov["text_encoder"]["hidden"] == 1280
    assert ov["text_encoder"]["eot_token_id"] == 49407
    assert ov["image_encoder"]["hidden"] == 1664
    assert ov["movq"]["ch_mult"] == (1, 2, 2, 4)
    assert ov["movq"]["attn_resolutions"] == (32,)
    ov_cn = pipeline_overrides(None, None, "controlnet")
    assert ov_cn["unet"]["controlnet_hint"] is True
    assert ov_cn["unet"]["in_channels"] == 8
    ov_in = pipeline_overrides(None, None, "inpainting")
    assert ov_in["unet"]["in_channels"] == 9


@pytest.mark.slow
def test_num_image_tokens_flows_from_config():
    """Editing num_image_tokens in the config changes the built
    ImageProjection weights — no code change."""
    cfg = dict(TINY_UNET_CFG, num_image_tokens=3)
    _, p3 = _init_unet(cfg)
    w3 = p3["encoder_hid_proj"]["image_embeds"]["kernel"]
    assert w3.shape == (48, 3 * 32)

    cfg["num_image_tokens"] = 5
    _, p5 = _init_unet(cfg)
    w5 = p5["encoder_hid_proj"]["image_embeds"]["kernel"]
    assert w5.shape == (48, 5 * 32)


def test_num_image_tokens_derived_from_checkpoint_shape():
    """The real source of truth: the checkpoint tensor shape."""
    sd = {"encoder_hid_proj.image_embeds.weight": np.zeros((7 * 32, 48))}
    assert derive_num_image_tokens(sd, 32) == 7
    assert derive_num_image_tokens({}, 32) is None
    # and it overrides whatever the config says
    ov = unet22_overrides(dict(TINY_UNET_CFG, num_image_tokens=3),
                          num_image_tokens=7)
    assert ov["num_image_tokens"] == 7


@pytest.mark.slow
def test_block_types_drive_attention_placement():
    """down/up_block_types from the config decide which levels carry
    attention modules."""
    _, params = _init_unet(TINY_UNET_CFG)
    assert "down_blocks.1.attentions.0" in params
    assert "down_blocks.0.attentions.0" not in params
    assert "up_blocks.0.attentions.0" in params
    assert "up_blocks.1.attentions.0" not in params

    flipped = dict(
        TINY_UNET_CFG,
        down_block_types=["SimpleCrossAttnDownBlock2D", "ResnetDownsampleBlock2D"],
        up_block_types=["ResnetUpsampleBlock2D", "SimpleCrossAttnUpBlock2D"],
    )
    _, params = _init_unet(flipped)
    assert "down_blocks.0.attentions.0" in params
    assert "down_blocks.1.attentions.0" not in params
    assert "up_blocks.1.attentions.0" in params
    assert "up_blocks.0.attentions.0" not in params


def _run_prior(order):
    kw = prior22_overrides(
        {
            "num_attention_heads": 2, "attention_head_dim": 8, "num_layers": 1,
            "embedding_dim": 16, "num_embeddings": 5, "additional_embeddings": 4,
            **({"embedding_order": order} if order else {}),
        }
    )
    prior = PriorTransformer22(**kw)
    x = jnp.ones((1, 16)) * 0.1
    t = jnp.zeros((1,))
    proj = jnp.ones((1, 16)) * 0.2
    enc = jnp.ones((1, 5, 24)) * 0.3
    mask = jnp.ones((1, 5), bool)
    params = jax.jit(
        lambda: prior.init(jax.random.PRNGKey(3), x, t, proj, enc, mask)
    )()
    # non-trivial weights so position permutations actually change the output
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.prod(a.shape) ** 0.5, params
    )
    return np.asarray(prior.apply(params, x, t, proj, enc, mask))


@pytest.mark.slow
def test_prior_embedding_order_is_config():
    """Permuting the additional-embedding order in the config changes the
    sequence layout (and therefore the output) — layout is data, not code."""
    default = _run_prior(None)
    explicit = _run_prior(["text", "proj", "time", "x", "prd"])
    np.testing.assert_array_equal(default, explicit)
    permuted = _run_prior(["text", "time", "proj", "x", "prd"])
    assert not np.allclose(default, permuted)
    # prd need not be last: the readout follows its configured position
    prd_mid = _run_prior(["text", "prd", "proj", "time", "x"])
    assert prd_mid.shape == default.shape and np.isfinite(prd_mid).all()


def test_hf_encoder_overrides():
    tcfg = load_model_config(None, "text_encoder", "prior__text_encoder")
    ov = clip_text_overrides(dict(tcfg, eos_token_id=2))
    assert ov["eot_token_id"] == tcfg["vocab_size"] - 1  # generic id remapped
    vcfg = load_model_config(None, "image_encoder", "prior__image_encoder")
    vov = clip_vision_overrides(vcfg)
    assert vov["layers"] == 48 and vov["patch_size"] == 14


def test_movq_attention_from_block_types():
    cfg = load_model_config(None, "movq", "decoder__movq")
    moved = dict(cfg, down_block_types=[
        "DownEncoderBlock2D", "AttnDownEncoderBlock2D",
        "DownEncoderBlock2D", "AttnDownEncoderBlock2D",
    ])
    ov = movq22_overrides(moved)
    assert ov["attn_resolutions"] == (128, 32)
