"""End-to-end smoke tests of the Kandinsky 2.1 pipeline on a tiny random
config: every task (text2img, img2img, inpainting, mix_images) and every
sampler family produce finite images of the right size."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from kandinsky2_tpu.configs import CONFIG_2_1, deep_copy_config
from kandinsky2_tpu.pipelines import Kandinsky2_1


def tiny_config():
    cfg = deep_copy_config(CONFIG_2_1)
    mc = cfg["model_config"]
    mc.update(
        num_channels=32, num_res_blocks=1, channel_mult="1,2",
        attention_resolutions="32", num_head_channels=16, model_dim=32,
        text_encoder_in_dim1=24, text_encoder_in_dim2=32,
        image_encoder_in_dim=32, num_image_embs=2,
    )
    cfg["prior"]["params"]["model"]["hparams"].update(
        text_ctx=8, xf_width=64, xf_layers=2, xf_heads=4, clip_dim=32,
        clip_xf_width=48,
    )
    cfg["clip_text_params"] = dict(
        vocab_size=64, context_length=8, width=48, layers=2, heads=4,
        embed_dim=32,
    )
    cfg["clip_vision_params"] = dict(
        image_size=28, patch_size=14, width=32, layers=2, heads=4,
        embed_dim=32,
    )
    cfg["clip_image_size"] = 28
    cfg["text_enc_params"].update(
        in_features=24, out_features=32, layers=2, heads=4, intermediate=48,
        vocab_size=64, max_positions=40,
    )
    ie = cfg["image_enc_params"]["params"]
    ie["n_embed"] = 32
    # 4 levels => the x8 latent<->pixel factor the pipeline geometry assumes
    ie["ddconfig"].update(ch=32, ch_mult=[1, 1, 1, 2], num_res_blocks=1,
                          attn_resolutions=[8], resolution=64)
    return cfg


class StubHFTokenizer:
    """Mimics the HF tokenizer call used by encode_text."""

    def __call__(self, texts, max_length=77, **kw):
        n = len(texts)
        ids = np.ones((n, max_length), np.int32)
        mask = np.zeros((n, max_length), np.int32)
        for i, t in enumerate(texts):
            L = min(max_length, 2 + len(t.split()))
            ids[i, :L] = 2 + (np.arange(L) % 60)
            mask[i, :L] = 1
        return {"input_ids": ids, "attention_mask": mask}


class StubBPETokenizer:
    def padded_tokens_and_mask(self, texts, ctx):
        n = len(texts)
        toks = np.zeros((n, ctx), np.int32)
        mask = np.zeros((n, ctx), bool)
        for i, t in enumerate(texts):
            L = min(ctx, 2 + len(t))
            toks[i, :L] = 1 + (np.arange(L) % 60)
            mask[i, :L] = True
        return toks, mask


@pytest.fixture(scope="module")
def pipe():
    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    return p


@pytest.mark.slow
def test_text2img_hires_staged(pipe):
    """Two-stage hires: low-res full ladder -> upsample -> truncated refine;
    distinct prompts keep their own stage-1 image through the handoff."""
    imgs = pipe.generate_text2img_hires(
        ["a red cat", "a very different blue dog painting"],
        num_steps=6, h=128, w=128, low_scale=0.5, strength=0.5,
        sampler="ddim_sampler",
    )
    assert len(imgs) == 2
    for im in imgs:
        a = np.asarray(im, np.float32)
        assert a.shape == (128, 128, 3) and np.isfinite(a).all()


@pytest.mark.slow
def test_img2img_per_batch_init_images(pipe):
    src_a = Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    src_b = Image.fromarray(
        (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    imgs = pipe.generate_img2img(
        ["a cat", "a dog"], [src_a, src_b], strength=0.6, num_steps=4,
        h=64, w=64, sampler="ddim_sampler",
    )
    assert len(imgs) == 2
    with pytest.raises(ValueError, match="init images"):
        pipe.generate_img2img(
            ["a cat", "a dog"], [src_a], strength=0.6, num_steps=4,
            h=64, w=64,
        )
    with pytest.raises(ValueError, match="out of range"):
        pipe.generate_img2img("a cat", src_a, strength=1.0, num_steps=4,
                              h=64, w=64)


@pytest.fixture(scope="module")
def inpaint_pipe():
    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), task_type="inpainting",
        dtype=jnp.float32,
    )
    p.init_random_params()
    return p


@pytest.mark.parametrize("sampler", ["p_sampler", "ddim_sampler", "plms_sampler"])
def test_text2img(pipe, sampler):
    imgs = pipe.generate_text2img(
        "a red cat", num_steps=4, batch_size=1, h=64, w=64,
        sampler=sampler, prior_steps="3",
    )
    assert len(imgs) == 1
    arr = np.asarray(imgs[0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()


def test_text2img_prompt_list(pipe):
    """A list of distinct prompts runs as one program with per-row
    conditioning: batch inferred, rows differ."""
    pipe.set_seed(0)
    imgs = pipe.generate_text2img(
        ["a red cat", "a very different extremely long blue dog prompt"],
        num_steps=4, h=64, w=64, sampler="ddim_sampler", prior_steps="3",
    )
    assert len(imgs) == 2
    a, b = (np.asarray(im, np.float32) for im in imgs)
    assert a.shape == b.shape == (64, 64, 3)
    assert not np.allclose(a, b), "distinct prompts must give distinct rows"


@pytest.mark.slow
def test_text2img_nonsquare_and_negative(pipe):
    imgs = pipe.generate_text2img(
        "a cat", num_steps=4, batch_size=2, h=96, w=64,
        sampler="ddim_sampler", prior_steps="3",
        negative_prior_prompt="ugly", negative_decoder_prompt="blurry",
    )
    assert len(imgs) == 2 and np.asarray(imgs[0]).shape == (96, 64, 3)


@pytest.mark.slow
def test_img2img(pipe):
    src = Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    imgs = pipe.generate_img2img(
        "a dog", src, strength=0.6, num_steps=4, h=64, w=64,
        sampler="ddim_sampler", prior_steps="3",
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


@pytest.mark.slow
def test_mix_images(pipe):
    src = Image.fromarray(
        (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    imgs = pipe.mix_images(
        ["a cat", src], [0.3, 0.7], num_steps=4, h=64, w=64,
        sampler="ddim_sampler", prior_steps="3",
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


@pytest.mark.slow
def test_inpainting(inpaint_pipe):
    src = Image.fromarray(
        (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    mask = np.ones((64, 64), np.float32)
    mask[16:48, 16:48] = 0
    imgs = inpaint_pipe.generate_inpainting(
        "a bird", src, mask, num_steps=4, h=64, w=64, sampler="p_sampler",
        prior_steps="3",
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


@pytest.mark.slow
def test_text2img_prior_ddim(pipe):
    """Prior 'ddimN' respacing through the full pipeline
    (prior.py:318-326 path)."""
    imgs = pipe.generate_text2img(
        "a red cat", num_steps=4, batch_size=1, h=64, w=64,
        sampler="ddim_sampler", prior_steps="ddim4",
    )
    arr = np.asarray(imgs[0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()
