"""DeepCache-style turbo sampling: deep-branch caching across diffusion steps.

Correctness invariants:
* ``denoise_cached`` with refresh=True equals plain ``denoise`` exactly (the
  cached torso is a re-association of the same ops).
* With refresh=False it reuses the injected cache (output responds to the
  cache, not to the deep branch).
* Pipeline-level turbo_interval runs produce finite images for every sampler
  family and differ from the exact trajectory (the expected drift).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky2_tpu.models.unet import deep_cache_spec
from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config

from kandinsky2_tpu.pipelines import Kandinsky2_1


pytestmark = pytest.mark.slow


def _randomize_zero_kernels(params, key):
    """Flax zero-inits the reference's zero_module convs (proj_out,
    out_layers.3, out.2), which makes a random-init UNet's output constant —
    these tests need the output to actually depend on the torso."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(key, len(leaves))
    new = [
        0.02 * jax.random.normal(k, l.shape, l.dtype)
        if l.ndim >= 2 and bool(jnp.all(l == 0)) else l
        for l, k in zip(leaves, ks)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


@pytest.fixture(scope="module")
def pipe():
    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    p.params["unet"] = _randomize_zero_kernels(
        p.params["unet"], jax.random.PRNGKey(42)
    )
    return p


def _cond(pipe, B):
    mc = pipe.config["model_config"]
    rng = jax.random.PRNGKey(3)
    ks = jax.random.split(rng, 4)
    full = jax.random.normal(ks[0], (B, 77, mc["text_encoder_in_dim1"]))
    pooled = jax.random.normal(ks[1], (B, mc["text_encoder_in_dim2"]))
    img = jax.random.normal(ks[2], (B, mc["image_encoder_in_dim"]))
    return pipe.unet.apply(
        {"params": pipe.params["unet"]}, full, pooled, img,
        method=pipe.unet.encode_conditioning,
    ), ks[3]


def test_refresh_equals_plain_denoise(pipe):
    B = 2
    (xf_proj, xf_out), k = _cond(pipe, B)
    x = jax.random.normal(k, (B, 8, 8, 4))
    t = jnp.full((B,), 11.0)
    plain = pipe.unet.apply(
        {"params": pipe.params["unet"]}, x, t, xf_proj, xf_out,
        method=pipe.unet.denoise,
    )
    ds, ch = deep_cache_spec(pipe.unet)
    cache0 = jnp.zeros((B, 8 // ds, 8 // ds, ch))
    cached, new_cache = pipe.unet.apply(
        {"params": pipe.params["unet"]}, x, t, xf_proj, xf_out, cache0,
        jnp.asarray(True), method=pipe.unet.denoise_cached,
    )
    # same math, re-associated under lax.cond: XLA fuses the two programs
    # differently, leaving only float noise (measured max |diff| ~4e-7)
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), rtol=0, atol=1e-5
    )
    assert new_cache.shape == cache0.shape
    assert not np.allclose(np.asarray(new_cache), 0)


def test_no_refresh_uses_cache(pipe):
    B = 1
    (xf_proj, xf_out), k = _cond(pipe, B)
    x = jax.random.normal(k, (B, 8, 8, 4))
    t = jnp.full((B,), 11.0)
    ds, ch = deep_cache_spec(pipe.unet)

    def run(cache):
        out, _ = pipe.unet.apply(
            {"params": pipe.params["unet"]}, x, t, xf_proj, xf_out, cache,
            jnp.asarray(False), method=pipe.unet.denoise_cached,
        )
        return np.asarray(out)

    a = run(jnp.zeros((B, 8 // ds, 8 // ds, ch)))
    b = run(jnp.ones((B, 8 // ds, 8 // ds, ch)))
    assert not np.allclose(a, b), "output must depend on the injected cache"


@pytest.mark.parametrize("sampler", ["ddim_sampler", "plms_sampler", "p_sampler"])
def test_turbo_pipeline_finite(pipe, sampler):
    pipe.set_seed(5)
    exact = pipe.generate_text2img(
        "a red cat", num_steps=6, h=64, w=64, sampler=sampler,
        prior_steps="3",
    )
    pipe.set_seed(5)
    turbo = pipe.generate_text2img(
        "a red cat", num_steps=6, h=64, w=64, sampler=sampler,
        prior_steps="3", turbo_interval=3,
    )
    e = np.asarray(exact[0], np.float32)
    t = np.asarray(turbo[0], np.float32)
    assert t.shape == (64, 64, 3) and np.isfinite(t).all()
    # same seed, same schedule: turbo tracks the exact trajectory loosely
    # (random tiny weights drift more than trained ones; just bound it)
    assert np.mean(np.abs(e - t)) < 80.0


# ---------------------------------------------------------------------------
# 2.2 (diffusers-layout UNet) turbo
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pipe22():
    from test_pipeline22 import TINY
    from test_pipeline21 import StubBPETokenizer as BPE

    from kandinsky2_tpu.pipelines.kandinsky2_2 import Kandinsky2_2

    p = Kandinsky2_2(tokenizer=BPE(), dtype=jnp.float32, overrides=TINY)
    p.init_random_params()
    p.params["unet"] = _randomize_zero_kernels(
        p.params["unet"], jax.random.PRNGKey(43)
    )
    return p


def test_refresh_equals_plain_denoise_22(pipe22):
    from kandinsky2_tpu.models.unet22 import deep_cache_spec22

    B = 2
    emb = jax.random.normal(jax.random.PRNGKey(9), (B, 32))
    enc, aug, _ = pipe22.unet.apply(
        {"params": pipe22.params["unet"]}, emb,
        method=pipe22.unet.encode_conditioning,
    )
    x = jax.random.normal(jax.random.PRNGKey(10), (B, 8, 8, 4))
    t = jnp.full((B,), 500.0)
    plain = pipe22.unet.apply(
        {"params": pipe22.params["unet"]}, x, t, enc, aug, None,
        method=pipe22.unet.denoise,
    )
    ds, ch = deep_cache_spec22(pipe22.unet)
    cache0 = jnp.zeros((B, 8 // ds, 8 // ds, ch))
    cached, new_cache = pipe22.unet.apply(
        {"params": pipe22.params["unet"]}, x, t, enc, aug, None, cache0,
        jnp.asarray(True), method=pipe22.unet.denoise_cached,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), rtol=0, atol=1e-5
    )
    assert new_cache.shape == cache0.shape


def test_turbo_pipeline22_finite(pipe22):
    pipe22.set_seed(6)
    imgs = pipe22.generate_text2img(
        "a red cat", decoder_steps=6, prior_steps=3, h=64, w=64,
        turbo_interval=3,
    )
    arr = np.asarray(imgs[0], np.float32)
    assert arr.shape == (64, 64, 3) and np.isfinite(arr).all()
