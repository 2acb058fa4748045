"""Parity: MoVQ / KL-VAE codecs vs the torch reference (kandinsky2/vqgan/*)
with tiny random-initialized configs and mechanically-converted weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.models import movq as jmovq
from kandinsky2_tpu.weights.convert import convert_state_dict, unused_torch_keys

from ref_loader import ref_vqgan

refae = ref_vqgan("autoencoder")

TINY = dict(
    double_z=False,
    z_channels=4,
    resolution=16,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[8],
    dropout=0.0,
)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def movq_pair():
    torch.manual_seed(0)
    ref = refae.MOVQ(TINY, n_embed=64, embed_dim=4).eval()
    ours = jmovq.MOVQ(
        z_channels=4, embed_dim=4, n_embed=64, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(8,), resolution=16,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = ours.init(jax.random.PRNGKey(0), x)["params"]
    sd = {k: v for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd, params)
    assert not unused_torch_keys(sd, params)
    return ref, ours, {"params": params}


def test_movq_encode(movq_pair):
    ref, ours, variables = movq_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        theirs = ref.encode(torch.tensor(nchw(x))).numpy()
    got = ours.apply(variables, jnp.asarray(x), method=ours.encode)
    np.testing.assert_allclose(nhwc(theirs), np.asarray(got), atol=2e-4)


def test_movq_decode(movq_pair):
    ref, ours, variables = movq_pair
    rng = np.random.RandomState(1)
    quant = rng.randn(2, 8, 8, 4).astype(np.float32)
    with torch.no_grad():
        theirs = ref.decode(torch.tensor(nchw(quant))).numpy()
    got = ours.apply(variables, jnp.asarray(quant), method=ours.decode)
    np.testing.assert_allclose(nhwc(theirs), np.asarray(got), atol=5e-4)


def test_vector_quantizer(movq_pair):
    ref, ours, variables = movq_pair
    rng = np.random.RandomState(2)
    z = (rng.randn(1, 8, 8, 4) * 0.05).astype(np.float32)
    with torch.no_grad():
        zq_t, _, (_, _, idx_t) = ref.quantize(torch.tensor(nchw(z)))
    vq = jmovq.VectorQuantizer(64, 4)
    zq_j, idx_j = vq.apply(
        {"params": variables["params"]["quantize"]}, jnp.asarray(z)
    )
    np.testing.assert_allclose(nhwc(zq_t.numpy()), np.asarray(zq_j), atol=1e-5)
    np.testing.assert_array_equal(idx_t.numpy(), np.asarray(idx_j).reshape(-1))


def test_autoencoder_kl():
    torch.manual_seed(3)
    cfg = dict(TINY, double_z=True, attn_resolutions=[])
    ref = refae.AutoencoderKL(cfg, embed_dim=4).eval()
    ours = jmovq.AutoencoderKL(
        z_channels=4, embed_dim=4, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(), resolution=16,
    )
    x0 = jnp.zeros((1, 16, 16, 3))
    params = ours.init(jax.random.PRNGKey(0), x0)["params"]
    params = convert_state_dict(dict(ref.state_dict()), params)
    variables = {"params": params}

    rng = np.random.RandomState(4)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        post = ref.encode(torch.tensor(nchw(x)))
    mean_j, logvar_j = ours.apply(variables, jnp.asarray(x), method=ours.encode)
    np.testing.assert_allclose(nhwc(post.mean.numpy()), np.asarray(mean_j), atol=2e-4)
    np.testing.assert_allclose(
        nhwc(post.logvar.numpy()), np.asarray(logvar_j), atol=2e-4
    )

    z = rng.randn(2, 8, 8, 4).astype(np.float32)
    with torch.no_grad():
        dec_t = ref.decode(torch.tensor(nchw(z))).numpy()
    dec_j = ours.apply(variables, jnp.asarray(z), method=ours.decode)
    np.testing.assert_allclose(nhwc(dec_t), np.asarray(dec_j), atol=5e-4)


def test_folded_upsample_conv_equivalence():
    """FoldedUpsampleConv (one lhs-dilated conv) computes exactly
    conv3x3(pad=1)(nearest_2x(x)) — same params, same arithmetic; the
    movq/unet Upsample modules route through it on the unsharded path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from kandinsky2_tpu.models.layers import (
        FoldedUpsampleConv,
        conv2d,
        upsample_nearest_2x,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 9, 7, 16)).astype(np.float32))
    folded = FoldedUpsampleConv(24)
    params = folded.init(jax.random.PRNGKey(1), x)["params"]
    # perturb so the kernel is non-degenerate in every tap
    params = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.normal(0, 0.05, a.shape), a.dtype),
        params,
    )
    got = folded.apply({"params": params}, x)

    naive = conv2d(24, "c")
    want = naive.apply({"params": params}, upsample_nearest_2x(x))
    assert got.shape == want.shape == (2, 18, 14, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)


def test_spatial_norm_resize_commute():
    """SpatialNorm runs conv_y/conv_b at zq's native resolution and nearest-
    resizes the RESULTS (a gather of a tiny tensor that fuses into the
    modulate pass, instead of a full-resolution dense output materialized in
    HBM).  A 1x1 conv commutes bitwise with nearest resize — every upsampled
    pixel duplicates one source pixel's exact linear map — so this must equal
    the reference formulation conv(resize(zq)) exactly, not within tolerance
    (movq_modules.py:34-68)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kandinsky2_tpu.models.layers import GroupNorm32, dense, resize_nearest
    from kandinsky2_tpu.models.movq import SpatialNorm

    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.normal(0, 1, (2, 24, 16, 64)).astype(np.float32))
    zq = jnp.asarray(rng.normal(0, 1, (2, 6, 4, 4)).astype(np.float32))

    sn = SpatialNorm()
    params = sn.init(jax.random.PRNGKey(0), f, zq)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype), params
    )
    got = sn.apply({"params": params}, f, zq)

    # reference formulation: resize first, then the 1x1 convs at full res
    zq_full = resize_nearest(zq, f.shape[1:3])
    norm_f = GroupNorm32(num_groups=32, eps=1e-6).apply(
        {"params": params["norm_layer"]}, f
    )
    conv_y = dense(64, "y").apply({"params": params["conv_y"]}, zq_full)
    conv_b = dense(64, "b").apply({"params": params["conv_b"]}, zq_full)
    want = norm_f * conv_y + conv_b

    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
