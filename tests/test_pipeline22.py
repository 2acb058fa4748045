"""Smoke tests of the Kandinsky 2.2 stack on a tiny random config: all tasks
(text2img, img2img, mix, inpainting, controlnet) and LoRA merging."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from kandinsky2_tpu.models.lora import init_lora, merge_lora, unmerge_lora
from kandinsky2_tpu.pipelines.kandinsky2_2 import Kandinsky2_2

TINY = dict(
    image_encoder=dict(
        image_size=28, patch_size=14, hidden=32, layers=2, heads=4,
        intermediate=64, projection_dim=32,
    ),
    text_encoder=dict(
        vocab_size=64, context_length=8, hidden=32, layers=2, heads=4,
        intermediate=64, projection_dim=32, eot_token_id=63,
    ),
    prior=dict(
        num_attention_heads=4, attention_head_dim=16, num_layers=2,
        embedding_dim=32, num_embeddings=8,
    ),
    unet=dict(
        block_out_channels=(32, 64), layers_per_block=1,
        attention_head_dim=32, cross_attention_dim=32, encoder_hid_dim=32,
        num_image_tokens=2,
    ),
    movq=dict(
        z_channels=4, embed_dim=4, n_embed=32, ch=32, ch_mult=(1, 1, 1, 2),
        num_res_blocks=1, attn_resolutions=(8,), resolution=64,
    ),
)


class StubBPE:
    def padded_tokens_and_mask(self, texts, ctx):
        n = len(texts)
        toks = np.zeros((n, ctx), np.int32)
        mask = np.zeros((n, ctx), bool)
        for i, t in enumerate(texts):
            L = min(ctx, 2 + len(t))
            toks[i, : L - 1] = 1 + (np.arange(L - 1) % 60)
            toks[i, L - 1] = 63  # eot
            mask[i, :L] = True
        return toks, mask


def make_pipe(task):
    p = Kandinsky2_2(
        task_type=task, tokenizer=StubBPE(), dtype=jnp.float32, overrides=TINY
    )
    p.init_random_params()
    return p


@pytest.fixture(scope="module")
def pipe():
    return make_pipe("text2img")


def test_text2img_22(pipe):
    imgs = pipe.generate_text2img(
        "a red cat", batch_size=1, decoder_steps=4, prior_steps=3, h=64, w=64
    )
    arr = np.asarray(imgs[0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()


def test_mix_images_22(pipe):
    src = Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    imgs = pipe.mix_images(
        ["a cat", src], [0.5, 0.5], decoder_steps=3, prior_steps=3, h=64, w=64
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


@pytest.mark.slow
def test_img2img_22():
    pipe = make_pipe("img2img")
    src = Image.fromarray(
        (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    imgs = pipe.generate_img2img(
        "a dog", src, strength=0.5, decoder_steps=4, prior_steps=3, h=64, w=64
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


@pytest.mark.slow
def test_inpainting_22():
    pipe = make_pipe("inpainting")
    src = Image.fromarray(
        (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1  # repaint center
    imgs = pipe.generate_inpainting(
        "a bird", src, mask, decoder_steps=4, prior_steps=3, h=64, w=64
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


@pytest.mark.slow
def test_controlnet_22():
    pipe = make_pipe("controlnet")
    hint = np.random.RandomState(3).rand(64, 64, 3).astype(np.float32)
    imgs = pipe.generate_controlnet(
        "a house", hint, decoder_steps=3, prior_steps=3, h=64, w=64
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


def test_lora_merge_roundtrip(pipe):
    params = pipe.params["unet"]
    loras = init_lora(params, jax.random.PRNGKey(0), rank=2)
    assert loras, "no attention kernels targeted"
    # up factors are zero-initialized: merging changes nothing
    merged = merge_lora(params, loras)
    l0 = jax.tree_util.tree_leaves(params)[0]
    m0 = jax.tree_util.tree_leaves(merged)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(m0))
    # non-zero up: merge then unmerge is identity
    loras = {
        k: {"down": v["down"], "up": jnp.ones_like(v["up"]) * 0.01}
        for k, v in loras.items()
    }
    merged = merge_lora(params, loras, scale=0.5)
    restored = unmerge_lora(merged, loras, scale=0.5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and at least one kernel actually changed after merge
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(merged)[0],
        )
    )
    assert changed


def test_img2img_22_strength_guard(pipe):
    src = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(ValueError, match="no refine steps"):
        pipe.generate_img2img(
            "a cat", src, strength=0.01, decoder_steps=6, prior_steps=3,
            h=64, w=64,
        )


@pytest.mark.slow
def test_text2img_22_hires_staged(pipe):
    """Two-stage hires on 2.2: distinct prompts keep their own stage-1
    image through the handoff; the prior runs once (embs reused)."""
    imgs = pipe.generate_text2img_hires(
        ["a red cat", "a very different blue dog"],
        decoder_steps=6, prior_steps=3, h=128, w=128, low_scale=0.5,
        strength=0.5, sampler="dpmpp",
    )
    assert len(imgs) == 2
    for im in imgs:
        a = np.asarray(im, np.float32)
        assert a.shape == (128, 128, 3) and np.isfinite(a).all()


def test_text2img_22_prompt_list(pipe):
    """Distinct prompts batch into one program; batch inferred from the list."""
    imgs = pipe.generate_text2img(
        ["a red cat", "a totally different long blue dog prompt"],
        decoder_steps=4, prior_steps=3, h=64, w=64,
    )
    assert len(imgs) == 2
    a = np.asarray(imgs[0], np.float32)
    assert a.shape == (64, 64, 3) and np.isfinite(a).all()


def test_prior_emb2emb_22(pipe):
    """PriorEmb2Emb (diffusers KandinskyV22PriorEmb2EmbPipeline family):
    PIL and raw-embedding inputs, batch tiling, end-to-end to the decoder."""
    src = Image.fromarray(
        (np.random.RandomState(7).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    emb = pipe.run_prior_emb2emb(src, "a cat", strength=0.6, prior_steps=5)
    D = pipe.prior.embedding_dim
    assert emb.shape == (1, D)
    assert np.isfinite(np.asarray(emb)).all()
    # raw de-normalized embedding input, tiled to batch 2, dpmpp sampler
    emb2 = pipe.run_prior_emb2emb(
        np.asarray(emb)[0], ["a cat", "a dog"], strength=0.8, prior_steps=5,
        sampler="dpmpp",
    )
    assert emb2.shape == (2, D)
    assert np.isfinite(np.asarray(emb2)).all()
    # the embeds drive the decoder exactly like run_prior output
    neg = pipe.get_zero_embed(1)
    imgs = pipe._decode_loop(
        jnp.concatenate([neg, emb], axis=0), 1, 3, 4.0, 64, 64
    )
    assert np.asarray(imgs[0]).shape == (64, 64, 3)


def test_prior_emb2emb_strength_guard(pipe):
    with pytest.raises(ValueError, match="no prior steps"):
        pipe.run_prior_emb2emb(
            jnp.zeros((1, pipe.prior.embedding_dim)), "x", strength=0.01,
            prior_steps=5,
        )


def test_prior_emb2emb_qsample_start(monkeypatch):
    """Hand-computed q_sample start: with the ancestral loop stubbed to
    identity and the start noise zeroed, the output must be exactly
    denorm(sqrt(acp[t0]) * norm(emb)) at the strength-derived t0 — pinning
    the normalize -> re-noise -> denormalize plumbing."""
    import kandinsky2_tpu.pipelines.kandinsky2_2 as K22

    p = make_pipe("text2img")
    D = p.prior.embedding_dim
    p.params["prior"]["clip_mean"] = jnp.full((1, D), 0.3, jnp.float32)
    p.params["prior"]["clip_std"] = jnp.full((1, D), 2.0, jnp.float32)
    monkeypatch.setattr(
        K22, "paired_ancestral_loop",
        lambda model_fn, acp, ladder, x_T, rng=None, **kw: x_T,
    )
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    prior_steps, strength = 4, 0.5
    emb = jnp.asarray(np.random.RandomState(9).randn(1, D), jnp.float32)
    got = p.run_prior_emb2emb(
        emb, "a cat", strength=strength, prior_steps=prior_steps,
    )
    from kandinsky2_tpu.diffusion.paired import unclip_ladder

    full = unclip_ladder(prior_steps)
    t0 = int(full[prior_steps - int(prior_steps * strength):][0])
    a = float(np.sqrt(np.asarray(p._prior_acp)[t0]))
    want = (a * (np.asarray(emb) - 0.3) / 2.0) * 2.0 + 0.3
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.slow
def test_controlnet_img2img_22():
    """Notebook flow (kandinsky2_2_controlnet.ipynb): hint derived from the
    init photo, decoder starts from the re-noised init latent, prior embeds
    precomputed via emb2emb."""
    from kandinsky2_tpu.depth import make_hint

    pipe = make_pipe("controlnet")
    src = Image.fromarray(
        (np.random.RandomState(11).rand(64, 64, 3) * 255).astype(np.uint8)
    )
    emb = pipe.run_prior_emb2emb(
        pipe.encode_image(src), "a house", strength=0.85, prior_steps=4
    )
    embs = jnp.concatenate([pipe.get_zero_embed(1), emb], axis=0)
    imgs = pipe.generate_controlnet(
        "a house", image=src, strength=0.5, image_embeds=embs,
        decoder_steps=4, h=64, w=64,
    )
    arr = np.asarray(imgs[0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()
    # hint auto-derivation matches make_hint(src)
    with pytest.raises(ValueError, match="hint= or image="):
        pipe.generate_controlnet("a house", decoder_steps=3, h=64, w=64)
    with pytest.raises(ValueError, match="no refine steps"):
        pipe.generate_controlnet(
            "a house", image=src, strength=0.01, image_embeds=embs,
            decoder_steps=4, h=64, w=64,
        )
    assert make_hint(src, h=64, w=64).shape == (64, 64, 3)
