"""Noise injection through every public entry point (SURVEY §7 RNG parity).

Day-one fidelity validation feeds torch-generated noise tensors through the
public API; these tests pin the contract that makes that comparison sound:

* with all noise injected, the trajectory is INDEPENDENT of the pipeline RNG
  (re-seeding the pipeline between two calls changes nothing);
* the 2.1 fused one-program path and the staged path consume injected noise
  identically (same image either way);
* malformed injections fail loud at the API boundary.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
from test_pipeline22 import TINY, StubBPE
from kandinsky2_tpu.pipelines import Kandinsky2_1
from kandinsky2_tpu.pipelines.kandinsky2_2 import Kandinsky2_2


@pytest.fixture(scope="module")
def pipe21():
    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    return p


@pytest.fixture(scope="module")
def pipe22():
    p = Kandinsky2_2(
        task_type="text2img", tokenizer=StubBPE(), dtype=jnp.float32,
        overrides=TINY,
    )
    p.init_random_params()
    return p


def _reseeded_equal(pipe, call):
    """Run ``call()`` under two different pipeline seeds; images equal?"""
    pipe.set_seed(0)
    a = call()
    pipe.set_seed(987654)
    b = call()
    return np.array_equal(np.asarray(a[0]), np.asarray(b[0]))


# ---------------------------------------------------------------------------
# 2.1
# ---------------------------------------------------------------------------

def test_21_fused_matches_staged_with_injected_noise(pipe21):
    """The fused one-XLA-program text2img and the staged path run the same
    math; with x_T and the prior x_T injected (deterministic ddim prior +
    ddim decoder), both must yield the same image."""
    rs = np.random.RandomState(0)
    hp = pipe21.config["prior"]["params"]["model"]["hparams"]
    kw = dict(num_steps=4, h=64, w=64, sampler="ddim_sampler",
              prior_steps="ddim3",
              noise=rs.randn(1, 8, 8, 4).astype(np.float32),
              prior_noise=rs.randn(1, hp["clip_dim"]).astype(np.float32))
    fused = pipe21.generate_text2img("a red cat", fused=True, **kw)
    staged = pipe21.generate_text2img("a red cat", fused=False, **kw)
    af = np.asarray(fused[0], np.float32)
    as_ = np.asarray(staged[0], np.float32)
    # same math, differently-fused XLA programs: tiny float drift allowed
    assert np.abs(af - as_).max() <= 2.0


def test_21_text2img_injection_overrides_rng(pipe21):
    """Full injection on the default fused path (stochastic "3"-style prior
    ladder included): re-seeding the pipeline changes nothing."""
    rs = np.random.RandomState(1)
    hp = pipe21.config["prior"]["params"]["model"]["hparams"]
    kw = dict(num_steps=4, h=64, w=64, sampler="ddim_sampler",
              prior_steps="3",
              noise=rs.randn(1, 8, 8, 4).astype(np.float32),
              prior_noise=rs.randn(1, hp["clip_dim"]).astype(np.float32),
              prior_noise_seq=rs.randn(3, 1, hp["clip_dim"]).astype(np.float32))
    assert _reseeded_equal(
        pipe21, lambda: pipe21.generate_text2img("a red cat", **kw))


def test_21_psampler_noise_seq_overrides_rng(pipe21):
    """p_sampler decoder with x_T + per-step ancestral noise injected."""
    rs = np.random.RandomState(2)
    hp = pipe21.config["prior"]["params"]["model"]["hparams"]
    steps = 4
    kw = dict(num_steps=steps, h=64, w=64, sampler="p_sampler",
              prior_steps="3",
              noise=rs.randn(1, 8, 8, 4).astype(np.float32),
              noise_seq=rs.randn(steps, 1, 8, 8, 4).astype(np.float32),
              prior_noise=rs.randn(1, hp["clip_dim"]).astype(np.float32),
              prior_noise_seq=rs.randn(3, 1, hp["clip_dim"]).astype(np.float32))
    assert _reseeded_equal(
        pipe21, lambda: pipe21.generate_text2img("a red cat", **kw))


def test_21_noise_shape_validation(pipe21):
    with pytest.raises(ValueError, match="expected"):
        pipe21.generate_text2img(
            "x", num_steps=4, h=64, w=64, prior_steps="ddim3",
            noise=np.zeros((1, 4, 4, 4), np.float32),
        )
    with pytest.raises(ValueError, match="noise_seq only applies"):
        pipe21.generate_text2img(
            "x", num_steps=4, h=64, w=64, prior_steps="ddim3",
            sampler="ddim_sampler",
            noise_seq=np.zeros((4, 1, 8, 8, 4), np.float32),
        )
    with pytest.raises(ValueError, match="noise_seq only applies"):
        pipe21.generate_clip_emb(
            "x", prior_steps="ddim3",
            noise_seq=np.zeros((3, 1, 32), np.float32),
        )


@pytest.mark.slow
def test_21_img2img_and_mix_injection(pipe21):
    rs = np.random.RandomState(3)
    src = Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8))
    hp = pipe21.config["prior"]["params"]["model"]["hparams"]
    renoise = rs.randn(1, 8, 8, 4).astype(np.float32)
    prior_noise = rs.randn(1, hp["clip_dim"]).astype(np.float32)
    assert _reseeded_equal(pipe21, lambda: pipe21.generate_img2img(
        "a cat", src, strength=0.6, num_steps=4, h=64, w=64,
        sampler="ddim_sampler", prior_steps="ddim3", noise=renoise,
        prior_noise=prior_noise,
    ))
    # mix_images: decoder x_T injected, prior-by-prompt stays RNG-driven
    x_T = rs.randn(1, 8, 8, 4).astype(np.float32)
    imgs = pipe21.mix_images(
        [src, src], [0.5, 0.5], num_steps=4, h=64, w=64, noise=x_T,
        sampler="ddim_sampler",
    )
    assert _reseeded_equal(pipe21, lambda: pipe21.mix_images(
        [src, src], [0.5, 0.5], num_steps=4, h=64, w=64, noise=x_T,
        sampler="ddim_sampler",
    ))
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()


# ---------------------------------------------------------------------------
# 2.2
# ---------------------------------------------------------------------------

def test_22_full_injection_overrides_rng(pipe22):
    """ddpm prior + ddpm decoder with all four noise streams injected."""
    rs = np.random.RandomState(4)
    D = pipe22.prior.embedding_dim
    dsteps, psteps = 4, 3
    kw = dict(
        decoder_steps=dsteps, prior_steps=psteps, h=64, w=64,
        noise=rs.randn(1, 8, 8, 4).astype(np.float32),
        noise_seq=rs.randn(dsteps, 1, 8, 8, 4).astype(np.float32),
        prior_noise=rs.randn(1, D).astype(np.float32),
        prior_noise_seq=rs.randn(psteps, 1, D).astype(np.float32),
    )
    assert _reseeded_equal(
        pipe22, lambda: pipe22.generate_text2img("a red cat", **kw))


def test_22_run_prior_injection(pipe22):
    rs = np.random.RandomState(5)
    D = pipe22.prior.embedding_dim
    noise = rs.randn(1, D).astype(np.float32)
    nseq = rs.randn(3, 1, D).astype(np.float32)
    pipe22.set_seed(0)
    a = pipe22.run_prior("a cat", prior_steps=3, noise=noise, noise_seq=nseq)
    pipe22.set_seed(4242)
    b = pipe22.run_prior("a cat", prior_steps=3, noise=noise, noise_seq=nseq)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="expected"):
        pipe22.run_prior("a cat", prior_steps=3,
                         noise=np.zeros((2, D), np.float32))
    with pytest.raises(ValueError, match="noise_seq only applies"):
        pipe22.run_prior("a cat", prior_steps=3, sampler="dpmpp",
                         noise_seq=nseq)


def test_22_emb2emb_injection(pipe22):
    rs = np.random.RandomState(6)
    D = pipe22.prior.embedding_dim
    emb = rs.randn(1, D).astype(np.float32)
    noise = rs.randn(1, D).astype(np.float32)
    nseq = rs.randn(2, 1, D).astype(np.float32)
    pipe22.set_seed(0)
    a = pipe22.run_prior_emb2emb(emb, "a cat", strength=0.7, prior_steps=3,
                                 noise=noise, noise_seq=nseq)
    pipe22.set_seed(777)
    b = pipe22.run_prior_emb2emb(emb, "a cat", strength=0.7, prior_steps=3,
                                 noise=noise, noise_seq=nseq)
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_22_inpaint_controlnet_injection():
    rs = np.random.RandomState(7)
    src = Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8))
    for task in ("inpainting", "controlnet"):
        p = Kandinsky2_2(task_type=task, tokenizer=StubBPE(),
                         dtype=jnp.float32, overrides=TINY)
        p.init_random_params()
        D = p.prior.embedding_dim
        kw = dict(
            decoder_steps=4, prior_steps=3, h=64, w=64,
            noise=rs.randn(1, 8, 8, 4).astype(np.float32),
            noise_seq=rs.randn(4, 1, 8, 8, 4).astype(np.float32),
            prior_noise=rs.randn(1, D).astype(np.float32),
        )
        # the positive prior's ancestral steps still draw from the RNG
        # unless prior_noise_seq is injected — add it for strict equality
        kw["prior_noise_seq"] = rs.randn(3, 1, D).astype(np.float32)
        if task == "inpainting":
            mask = np.zeros((64, 64), np.float32)
            mask[16:48, 16:48] = 1
            call = lambda: p.generate_inpainting(
                "a cat", src, mask, **kw)
        else:
            hint = rs.rand(64, 64, 3).astype(np.float32)
            call = lambda: p.generate_controlnet("a cat", hint=hint, **kw)
        assert _reseeded_equal(p, call)


def test_22_per_row_masks():
    """Serving-tier contract: distinct users' inpainting masks ride one
    batched call, one mask per row — and each row's mask actually applies
    to that row."""
    rs = np.random.RandomState(8)
    p = Kandinsky2_2(task_type="inpainting", tokenizer=StubBPE(),
                     dtype=jnp.float32, overrides=TINY)
    p.init_random_params()
    src = Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8))
    m1 = np.zeros((64, 64), np.float32); m1[:32] = 1
    m2 = np.zeros((64, 64), np.float32); m2[32:] = 1
    imgs = p.generate_inpainting(
        ["a cat", "a dog"], [src, src], [m1, m2], decoder_steps=3,
        prior_steps=2, h=64, w=64,
    )
    assert len(imgs) == 2
    with pytest.raises(ValueError, match="masks"):
        p.generate_inpainting(
            ["a", "b", "c"], [src, src, src], [m1, m2], decoder_steps=3,
            prior_steps=2, h=64, w=64,
        )


def test_21_per_row_masks(pipe21):
    """2.1 inpainting accepts per-row images + masks too."""
    from kandinsky2_tpu.configs import deep_copy_config

    rs = np.random.RandomState(9)
    icfg = deep_copy_config(pipe21.config)
    icfg["model_config"]["inpainting"] = True
    icfg["model_config"]["in_channels"] = 4
    p = Kandinsky2_1(config=icfg, tokenizer1=StubHFTokenizer(),
                     tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
                     task_type="inpainting")
    p.init_random_params()
    src = Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8))
    m1 = np.ones((64, 64), np.float32); m1[:32] = 0
    m2 = np.ones((64, 64), np.float32); m2[32:] = 0
    imgs = p.generate_inpainting(
        ["a cat", "a dog"], [src, src], [m1, m2], num_steps=4, h=64, w=64,
        prior_steps="ddim2",
    )
    assert len(imgs) == 2
    with pytest.raises(ValueError, match="masks"):
        p.generate_inpainting(
            ["a", "b", "c"], [src, src, src], [m1, m2], num_steps=4,
            h=64, w=64, prior_steps="ddim2",
        )
