"""Spatial (row-sharded) parallel decode vs the single-device decoder.

The SP path (parallel/spatial.py) must be numerically the plain decoder:
halo-exchange convs reproduce zero padding, psum'd GroupNorm statistics span
the full image, and local-rows-vs-gathered-KV attention is an exact softmax.
Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from kandinsky2_tpu.models.movq import MOVQ
from kandinsky2_tpu.parallel.spatial import (
    halo_exchange_rows,
    spatial_decode,
)

# Latent 16x16 -> image 64x64 through two upsamples; attention at both the
# bottleneck (16) and one up level (32) so the gathered-KV path is exercised
# at a sharded resolution.
MOVQ_KW = dict(
    z_channels=4, embed_dim=4, n_embed=64, ch=32, ch_mult=(1, 2, 2),
    num_res_blocks=1, attn_resolutions=(16, 32), resolution=64,
)


@pytest.fixture(scope="module")
def movq_and_params():
    movq = MOVQ(**MOVQ_KW)
    params = movq.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    return movq, params


def sp_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


def test_halo_exchange_matches_zero_pad():
    """Sharded halo rows == the rows a zero-padded full array would see."""
    mesh = sp_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 3))

    f = jax.shard_map(
        lambda b: halo_exchange_rows(b, "sp"),
        mesh=mesh,
        in_specs=jax.sharding.PartitionSpec(None, "sp", None, None),
        out_specs=jax.sharding.PartitionSpec(None, "sp", None, None),
        check_vma=False,
    )
    got = np.asarray(f(x))  # (2, 4*(4+2), 8, 3): per-device blocks of Hl+2
    ref = np.pad(np.asarray(x), ((0, 0), (1, 1), (0, 0), (0, 0)))
    for d in range(4):
        block = got[:, d * 6:(d + 1) * 6]
        np.testing.assert_array_equal(block, ref[:, d * 4:d * 4 + 6])


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 8])
def test_spatial_decode_code_matches_single_device(movq_and_params, n):
    movq, params = movq_and_params
    codes = jax.random.randint(jax.random.PRNGKey(2), (2, 16, 16), 0, 64)

    ref = movq.apply({"params": params}, codes, method=MOVQ.decode_code)
    got = spatial_decode(movq, params, codes, sp_mesh(n), axis="sp")
    assert got.shape == ref.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_spatial_decode_quant_matches_single_device(movq_and_params):
    movq, params = movq_and_params
    quant = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))

    ref = movq.apply({"params": params}, quant, method=MOVQ.decode)
    got = spatial_decode(movq, params, quant, sp_mesh(8), axis="sp",
                         method="decode")
    # reassociation noise: psum'd norm statistics + halo-conv lowering differ
    # from the single-device reduction order at ~1e-5 on N(0,1) latents
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_spatial_decode_rejects_indivisible_rows(movq_and_params):
    movq, params = movq_and_params
    codes = jnp.zeros((1, 12, 16), jnp.int32)
    with pytest.raises(ValueError, match="divide"):
        spatial_decode(movq, params, codes, sp_mesh(8), axis="sp")


@pytest.mark.slow
def test_spatial_decode_kl_vae_matches_single_device():
    """The 2.0 family's KL-VAE shares the Decoder: SP path must match too."""
    from kandinsky2_tpu.models.movq import AutoencoderKL

    ae = AutoencoderKL(z_channels=4, embed_dim=4, ch=32, ch_mult=(1, 2, 2),
                       num_res_blocks=1, attn_resolutions=(16,), resolution=64)
    params = ae.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)))["params"]
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 4))

    ref = ae.apply({"params": params}, z, method=AutoencoderKL.decode)
    got = spatial_decode(ae, params, z, sp_mesh(8), axis="sp", method="decode")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_pipeline_decode_latents_sp_matches_plain():
    """Kandinsky2_1.decode_latents: the sp_mesh path returns the same images
    as the single-device path (same post-processing, same scale)."""
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    lat = np.asarray(
        jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 4))
    )
    plain = p.decode_latents(lat)
    sp = p.decode_latents(lat, sp_mesh=sp_mesh(8))
    assert len(plain) == len(sp) == 1
    a, b = np.asarray(plain[0], np.int32), np.asarray(sp[0], np.int32)
    assert a.shape == b.shape == (128, 128, 3)
    # uint8 quantization absorbs the ~1e-4 float drift almost everywhere
    assert np.mean(np.abs(a - b) > 1) < 0.01


@pytest.mark.slow
def test_spatial_encode_matches_single_device(movq_and_params):
    """Row-sharded encode (one-sided halos through the asymmetric-pad
    stride-2 downsamples) == the single-device encoder."""
    from kandinsky2_tpu.parallel.spatial import spatial_encode

    movq, params = movq_and_params
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))

    ref = movq.apply({"params": params}, x, method=MOVQ.encode)
    got = spatial_encode(movq, params, x, sp_mesh(4), axis="sp")
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_spatial_encode_rejects_odd_shards(movq_and_params):
    movq, params = movq_and_params
    x = jnp.zeros((1, 72, 64, 3))  # 72 / 8 = 9 rows: odd at the first level
    from kandinsky2_tpu.parallel.spatial import spatial_encode

    with pytest.raises(ValueError, match="multiple"):
        spatial_encode(movq, params, x, sp_mesh(8), axis="sp")


@pytest.mark.slow
@pytest.mark.parametrize("updown", [True, False])
def test_spatial_unet_matches_single_device(updown):
    """Row-sharded UNet forward == single-device forward: halo convs through
    conv_in/ResBlocks/Downsample/out head, psum'd GroupNorms, FiLM, and
    gathered-KV attention with encoder tokens concatenated."""
    from jax.sharding import PartitionSpec as P
    from kandinsky2_tpu.models.unet import UNetModel

    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=8, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=1,
        num_head_channels=16, resblock_updown=updown, use_encoder_kv=True,
    )
    B, H = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(8), (B, H, H, 4))
    t = jnp.asarray([3.0, 7.0])
    enc = jax.random.normal(jax.random.PRNGKey(9), (B, 5, 32))
    params = unet.init(jax.random.PRNGKey(10), x, t, enc)["params"]
    ref = unet.apply({"params": params}, x, t, enc)

    mesh = sp_mesh(4)
    sp = unet.clone(sp_axis="sp", parent=None)
    f = jax.shard_map(
        lambda p, xx, tt, ee: sp.apply({"params": p}, xx, tt, ee),
        mesh=mesh,
        in_specs=(P(), P(None, "sp", None, None), P(), P()),
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )
    got = f(params, x, t, enc)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_pipeline_generate_sp_matches_plain():
    """Full 2.1 denoise+decode with sp_mesh == the plain program: same noise,
    same CFG image prompt, deterministic sampler (ddim)."""
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    B = 1
    emb = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(11), (B, 32)),
         jnp.zeros((B, 32))], axis=0
    )
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(12), (B, 16, 16, 4)))

    kw = dict(prompt="a cat", img_prompt=emb, batch_size=B, h=128, w=128,
              sampler="ddim_sampler", num_steps=4, noise=noise)
    plain = p.generate_img(**kw)
    sp = p.generate_img(**kw, sp_mesh=sp_mesh(4))
    a, b = np.asarray(plain[0], np.int32), np.asarray(sp[0], np.int32)
    assert a.shape == b.shape == (128, 128, 3)
    assert np.mean(np.abs(a - b) > 1) < 0.01


@pytest.mark.slow
def test_pipeline_generate_sp_rejects_bad_rows():
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    emb = jnp.zeros((2, 32))
    with pytest.raises(ValueError, match="sp_axis"):
        p.generate_img(prompt="x", img_prompt=emb, batch_size=1, h=64, w=64,
                       sampler="ddim_sampler", num_steps=2,
                       sp_mesh=sp_mesh(8))


@pytest.mark.slow
def test_pipeline22_decode_loop_sp_matches_plain():
    """2.2 decoder loop + MoVQ decode with sp_mesh == the plain program
    (fixed CFG embeds and x_T, deterministic dpmpp sampler)."""
    from test_pipeline22 import make_pipe

    p = make_pipe("text2img")
    B = 1
    embs = jax.random.normal(jax.random.PRNGKey(13), (2 * B, 32))
    x_T = jax.random.normal(jax.random.PRNGKey(14), (B, 16, 16, 4))

    kw = dict(image_embeds=embs, batch_size=B, steps=4, guidance=4.0,
              h=128, w=128, x_T=x_T, sampler="dpmpp")
    plain = p._decode_loop(**kw)
    sp = p._decode_loop(**kw, sp_mesh=sp_mesh(4))
    a, b = np.asarray(plain[0], np.int32), np.asarray(sp[0], np.int32)
    assert a.shape == b.shape == (128, 128, 3)
    assert np.mean(np.abs(a - b) > 1) < 0.01


@pytest.mark.slow
def test_pipeline_generate_sp_turbo_finite():
    """sp_mesh composes with turbo_interval: the deep-cache state shards its
    rows; output finite and image-shaped."""
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    emb = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(15), (1, 32)),
         jnp.zeros((1, 32))], axis=0
    )
    out = p.generate_img(
        prompt="x", img_prompt=emb, batch_size=1, h=128, w=128,
        sampler="ddim_sampler", num_steps=4, turbo_interval=2,
        sp_mesh=sp_mesh(4),
    )
    a = np.asarray(out[0])
    assert a.shape == (128, 128, 3)


@pytest.mark.slow
def test_pipeline21_inpainting_sp_matches_plain():
    """generate_inpainting(sp_mesh=...) == plain: the latent-blend
    denoised_fn and the mask ride the row sharding."""
    from PIL import Image

    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), task_type="inpainting",
        dtype=jnp.float32,
    )
    p.init_random_params()
    p.set_seed(3)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(128, 128, 3) * 255).astype(np.uint8)
    )
    mask = np.ones((128, 128), np.float32)
    mask[40:90, 30:100] = 0.0
    kw = dict(num_steps=4, h=128, w=128, sampler="ddim_sampler")
    plain = p.generate_inpainting("a cat", img, mask, **kw)
    p.set_seed(3)  # same x_T draw for the sharded run
    sp = p.generate_inpainting("a cat", img, mask, **kw, sp_mesh=sp_mesh(4))
    a, b = np.asarray(plain[0], np.int32), np.asarray(sp[0], np.int32)
    assert a.shape == b.shape == (128, 128, 3)
    assert np.mean(np.abs(a - b) > 1) < 0.01


@pytest.mark.slow
def test_pipeline22_hires_sp_finite():
    """generate_text2img_hires(sp_mesh=...): the full-res refine stage
    shards; the low stage drops sharding automatically when its latent
    height doesn't divide.  Output finite and image-shaped."""
    from test_pipeline22 import make_pipe

    p = make_pipe("text2img")
    out = p.generate_text2img_hires(
        "a cat", batch_size=1, decoder_steps=4, prior_steps=2,
        h=128, w=128, low_scale=0.5, sampler="dpmpp", sp_mesh=sp_mesh(4),
    )
    a = np.asarray(out[0])
    assert a.shape == (128, 128, 3)


@pytest.mark.slow
def test_pipeline21_sp_psampler_finite_and_mesh_keyed():
    """2.1 p_sampler under SP (dynamic-threshold percentile gathered across
    row shards), and the jit cache keys on mesh IDENTITY: a second mesh of
    the same size must compile its own program, not silently reuse a
    shard_map closed over the first mesh's devices."""
    from jax.sharding import Mesh
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    p = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    p.init_random_params()
    emb = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(61), (1, 32)),
         jnp.zeros((1, 32))], axis=0
    )
    kw = dict(prompt="x", img_prompt=emb, batch_size=1, h=128, w=128,
              sampler="p_sampler", num_steps=4)
    mesh_a = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    mesh_b = Mesh(np.asarray(jax.devices()[4:8]), ("sp",))
    out_a = p.generate_img(**kw, sp_mesh=mesh_a)
    n_after_a = len(p._jit_cache)
    out_b = p.generate_img(**kw, sp_mesh=mesh_b)
    assert len(p._jit_cache) > n_after_a, (
        "same-size mesh with different devices must not reuse the cached "
        "shard_map"
    )
    for out in (out_a, out_b):
        assert np.asarray(out[0]).shape == (128, 128, 3)


@pytest.mark.slow
def test_pipeline20_generate_sp_matches_plain():
    """Full 2.0 denoise + KL-VAE decode with sp_mesh == the plain program:
    deterministic DDIM (eta=0), fixed noise.  Exercises the SP path through
    the older UNet (dual text streams) and the 4-level KL-VAE decoder."""
    from test_pipeline20 import StubHFTok, tiny_config20
    from kandinsky2_tpu.pipelines.kandinsky2_0 import Kandinsky2

    p = Kandinsky2(
        config=tiny_config20(), tokenizer1=StubHFTok(),
        tokenizer2=StubHFTok(), dtype=jnp.float32,
    )
    p.init_random_params()
    noise = np.asarray(
        jax.random.normal(jax.random.PRNGKey(51), (1, 16, 16, 4))
    )
    kw = dict(prompt="a cat", batch_size=1, h=128, w=128, num_steps=4,
              sampler="ddim_sampler", ddim_eta=0.0, noise=noise)
    plain = p.generate_img(**kw)
    sp = p.generate_img(**kw, sp_mesh=sp_mesh(4))
    a, b = np.asarray(plain[0], np.int32), np.asarray(sp[0], np.int32)
    assert a.shape == b.shape == (128, 128, 3)
    assert np.mean(np.abs(a - b) > 1) < 0.01


@pytest.mark.slow
def test_pipeline20_generate_sp_psampler_finite():
    """2.0 p_sampler under SP: the in-sampler dynamic threshold gathers its
    percentile across row shards and each shard draws its own ancestral
    noise; output finite and image-shaped."""
    from test_pipeline20 import StubHFTok, tiny_config20
    from kandinsky2_tpu.pipelines.kandinsky2_0 import Kandinsky2

    p = Kandinsky2(
        config=tiny_config20(), tokenizer1=StubHFTok(),
        tokenizer2=StubHFTok(), dtype=jnp.float32,
    )
    p.init_random_params()
    out = p.generate_img(
        prompt="x", batch_size=1, h=128, w=128, num_steps=4,
        sampler="p_sampler", sp_mesh=sp_mesh(4),
    )
    a = np.asarray(out[0])
    assert a.shape == (128, 128, 3)


def test_dynamic_threshold_axis_matches_global():
    """The gathered-percentile dynamic threshold under row sharding equals
    the single-device threshold exactly."""
    from jax.sharding import PartitionSpec as P
    from kandinsky2_tpu.diffusion.gaussian import dynamic_threshold

    x = jax.random.normal(jax.random.PRNGKey(52), (2, 16, 8, 4)) * 3.0
    ref = dynamic_threshold(x)
    f = jax.shard_map(
        lambda b: dynamic_threshold(b, axis_name="sp"),
        mesh=sp_mesh(4),
        in_specs=P(None, "sp", None, None),
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )
    got = f(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-6
    )


def _plain_attention(q, k, v):
    B, H, W, C = q.shape
    ql = q.reshape(B, H * W, C)
    kl = k.reshape(B, H * W, C)
    vl = v.reshape(B, H * W, C)
    logits = jnp.einsum("btc,bsc->bts", ql, kl) * (C ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vl.dtype)
    return jnp.einsum("bts,bsc->btc", w, vl).reshape(B, H, W, C)


@pytest.mark.parametrize("impl", ["gathered", "ring"])
def test_sp_attention_impls_match_single_device(impl):
    """Both SP attention implementations are the exact full softmax."""
    from jax.sharding import PartitionSpec as P
    from kandinsky2_tpu.parallel.spatial import sp_attention_rows

    mesh = sp_mesh(4)
    B, H, W, C = 2, 8, 4, 16
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (B, H, W, C))
        for i in (31, 32, 33)
    )
    ref = _plain_attention(q, k, v)
    f = jax.shard_map(
        lambda a, b, c: sp_attention_rows(a, b, c, "sp", impl=impl),
        mesh=mesh,
        in_specs=P(None, "sp", None, None),
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )
    got = f(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_ring_attention_query_chunking_and_dtype():
    """Ring attention with a q_chunk that doesn't divide the local rows
    (padding path) still matches, and bf16 inputs come back bf16."""
    from jax.sharding import PartitionSpec as P
    from kandinsky2_tpu.parallel.spatial import sp_ring_attention_rows

    mesh = sp_mesh(4)
    B, H, W, C = 1, 8, 6, 8  # local rows 2x6 = 12 tokens; q_chunk 5 pads
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (B, H, W, C))
        for i in (41, 42, 43)
    )
    ref = _plain_attention(q, k, v)
    f = jax.shard_map(
        lambda a, b, c: sp_ring_attention_rows(a, b, c, "sp", q_chunk=5),
        mesh=mesh,
        in_specs=P(None, "sp", None, None),
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )
    got = f(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )

    bf = jax.shard_map(
        lambda a, b, c: sp_ring_attention_rows(a, b, c, "sp"),
        mesh=mesh,
        in_specs=P(None, "sp", None, None),
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_sp_ring_attention_mh_matches_reference():
    """Multi-head ring attention (spatial K/V ringed, replicated encoder
    prefix folded first) == the plain softmax over [encoder; spatial] keys,
    with qkv_attention's 1/sqrt(sqrt(c)) scaling — values AND gradients."""
    from jax.sharding import PartitionSpec as P
    from kandinsky2_tpu.ops.attention import qkv_attention
    from kandinsky2_tpu.parallel.spatial import sp_ring_attention_mh

    mesh = sp_mesh(4)
    B, T, H, c, E = 2, 24, 3, 8, 5
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(70 + i), (B, T, H, c))
        for i in range(3)
    )
    ek, ev = (
        jax.random.normal(jax.random.PRNGKey(73 + i), (B, E, H, c))
        for i in range(2)
    )

    def ref_fn(q, k, v, ek, ev):
        out = qkv_attention(
            q, jnp.concatenate([ek, k], axis=1),
            jnp.concatenate([ev, v], axis=1),
        )
        return out, jnp.sum(out ** 2)

    ref, ref_loss = ref_fn(q, k, v, ek, ev)
    ref_grads = jax.grad(lambda *a: ref_fn(*a)[1], argnums=(0, 1, 2, 3, 4))(
        q, k, v, ek, ev
    )

    def sp_fn(q, k, v, ek, ev):
        out = sp_ring_attention_mh(q, k, v, "sp", extra_k=ek, extra_v=ev,
                                   q_chunk=4)
        loss = jax.lax.psum(jnp.sum(out ** 2), "sp")
        grads = jax.grad(
            lambda *a: jax.lax.psum(
                jnp.sum(sp_ring_attention_mh(
                    a[0], a[1], a[2], "sp", extra_k=a[3], extra_v=a[4],
                    q_chunk=4,
                ) ** 2), "sp"),
            argnums=(0, 1, 2, 3, 4),
        )(q, k, v, ek, ev)
        # psum-transpose scales every cotangent by the axis size: sharded
        # inputs (q/k/v rows) divide it back out, replicated inputs (ek/ev)
        # pmean (sum of per-device contributions / n)
        n = jax.lax.axis_size("sp")
        grads = (grads[0] / n, grads[1] / n, grads[2] / n,
                 jax.lax.pmean(grads[3], "sp"), jax.lax.pmean(grads[4], "sp"))
        return out, loss, grads

    row = P(None, "sp", None, None)
    f = jax.shard_map(
        sp_fn, mesh=mesh,
        in_specs=(row, row, row, P(), P()),
        out_specs=(row, P(), (row, row, row, P(), P())),
        check_vma=False,
    )
    got, got_loss, got_grads = f(q, k, v, ek, ev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_spatial_unet_ring_attention_matches_single_device(monkeypatch):
    """The UNet's SP attention routed through the ring (threshold forced to
    0) still equals the single-device forward."""
    from jax.sharding import PartitionSpec as P
    from kandinsky2_tpu.models.unet import UNetModel
    from kandinsky2_tpu.parallel import spatial

    monkeypatch.setattr(spatial, "RING_THRESHOLD_TOKENS", 1)
    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=8, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=1,
        num_head_channels=16, resblock_updown=True, use_encoder_kv=True,
    )
    B, H = 1, 16
    x = jax.random.normal(jax.random.PRNGKey(80), (B, H, H, 4))
    t = jnp.asarray([5.0])
    enc = jax.random.normal(jax.random.PRNGKey(81), (B, 5, 32))
    params = unet.init(jax.random.PRNGKey(82), x, t, enc)["params"]
    ref = unet.apply({"params": params}, x, t, enc)

    sp = unet.clone(sp_axis="sp", parent=None)
    f = jax.shard_map(
        lambda p, xx, tt, ee: sp.apply({"params": p}, xx, tt, ee),
        mesh=sp_mesh(4),
        in_specs=(P(), P(None, "sp", None, None), P(), P()),
        out_specs=P(None, "sp", None, None),
        check_vma=False,
    )
    got = f(params, x, t, enc)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_spatial_unet_gradients_match_single_device():
    """Gradients flow through the SP machinery (ppermute halos, psum'd
    norm stats, gathered KV) and match the single-device gradients — the
    basis for row-sharded high-resolution training."""
    from jax.sharding import PartitionSpec as P
    from kandinsky2_tpu.models.unet import UNetModel

    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=1,
        num_head_channels=16, resblock_updown=True, use_encoder_kv=True,
    )
    B, H = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(16), (B, H, H, 4))
    t = jnp.asarray([3.0, 7.0])
    enc = jax.random.normal(jax.random.PRNGKey(17), (B, 5, 32))
    tgt = jax.random.normal(jax.random.PRNGKey(18), (B, H, H, 4))
    params = unet.init(jax.random.PRNGKey(19), x, t, enc)["params"]
    # GLIDE zero-init convs produce exactly-zero upstream grads; de-zero
    params = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 0.01) if not jnp.any(a) else a, params
    )

    def loss_plain(p):
        out = unet.apply({"params": p}, x, t, enc)
        return jnp.mean((out - tgt) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(loss_plain)(params)

    mesh = sp_mesh(4)
    sp = unet.clone(sp_axis="sp", parent=None)

    def loss_sp(p, xx, tgt_l):
        out = sp.apply({"params": p}, xx, t, enc)
        # sum of per-shard SSE psum'd == global SSE; divide by global count
        sse = jax.lax.psum(jnp.sum((out - tgt_l) ** 2), "sp")
        return sse / (B * H * H * 4)

    def sharded_value_and_grad(p, xx, tgt_full):
        # Under check_vma=False the forward psum transposes to an identity
        # scaled by the axis size: each device's param cotangent comes out
        # as N x (its local contribution, halo cross-terms included).  A
        # pmean over the axis therefore recovers the exact global gradient.
        loss, grads = jax.value_and_grad(loss_sp)(p, xx, tgt_full)
        return loss, jax.lax.pmean(grads, "sp")

    f = jax.shard_map(
        sharded_value_and_grad,
        mesh=mesh,
        in_specs=(P(), P(None, "sp", None, None), P(None, "sp", None, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    sp_loss, sp_grads = f(params, x, tgt)
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_sp = jax.tree_util.tree_leaves(sp_grads)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3
        )
