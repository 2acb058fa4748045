"""MoVQ / VQGAN latent codecs, TPU-native (NHWC, flax).

Reimplements the reference's three latent codecs (kandinsky2/vqgan/):

* ``Encoder`` / ``Decoder``  — CompVis conv encoder/decoder (vqgan_blocks.py:253,370)
* ``MOVQDecoder``            — decoder whose every norm is a SpatialNorm
                               modulated by the quantized latent (movq_modules.py:34-68,228)
* ``VectorQuantizer``        — L2 nearest-codebook lookup (quntize.py:80-131)
* ``MOVQ`` / ``AutoencoderKL`` / ``VQModelInterface`` facades (autoencoder.py)

Module names mirror the torch state_dict exactly so weights convert
mechanically.  All spatial tensors are NHWC.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    GroupNorm32,
    conv2d,
    dense,
    resize_nearest,
    upsample_nearest_2x,
)

Dtype = Any


def swish(x):
    return x * jax.nn.sigmoid(x)


class SpatialNorm(nn.Module):
    """norm(f) * conv_y(zq) + conv_b(zq), zq nearest-resized to f
    (movq_modules.py:34-68).

    Under spatial parallelism (``sp_axis`` set, parallel/spatial.py) the
    nearest resize stays device-local — integer-factor row maps keep equal
    row shards aligned — and only the norm statistics cross devices."""

    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, f: jnp.ndarray, zq: jnp.ndarray) -> jnp.ndarray:
        norm_f = GroupNorm32(
            num_groups=32, eps=1e-6, axis_name=self.sp_axis, name="norm_layer"
        )(f)
        # The 1x1 convs commute BITWISE with the nearest resize (each output
        # pixel duplicates one source pixel's exact linear map), so run them
        # at zq's native resolution and resize the results: the per-norm
        # [H, W, C] modulation maps are then gathers of tiny low-res tensors
        # that fuse into the modulate pass instead of materialized dense
        # outputs — at 768² decode that was a 151 MB write + re-read per
        # conv per SpatialNorm (~4 GB of the decode's HBM traffic).
        conv_y = dense(f.shape[-1], "conv_y", self.dtype)
        conv_b = dense(f.shape[-1], "conv_b", self.dtype)
        y = resize_nearest(conv_y(zq), f.shape[1:3])
        b = resize_nearest(conv_b(zq), f.shape[1:3])
        return norm_f * y + b


def _norm(spatial: bool, name: str, dtype, x, zq=None, sp_axis=None):
    """GroupNorm(32, eps=1e-6) or SpatialNorm depending on whether this codec
    is zq-modulated (movq_modules.Normalize vs vqgan_blocks.Normalize).
    Constructed inline so the flax path equals the torch module path."""
    if spatial:
        return SpatialNorm(dtype=dtype, sp_axis=sp_axis, name=name)(x, zq)
    return GroupNorm32(num_groups=32, eps=1e-6, axis_name=sp_axis, name=name)(x)


def _conv3(features: int, name: str, dtype, sp_axis=None):
    """3x3 conv; halo-exchange variant when rows are device-sharded."""
    if sp_axis is None:
        return conv2d(features, name, dtype=dtype)
    from ..parallel.spatial import sp_conv3x3

    return sp_conv3x3(features, name, sp_axis, dtype=dtype)


class ResnetBlock(nn.Module):
    """vqgan_blocks.ResnetBlock:129 / movq_modules.ResnetBlock:120 (temb is
    always absent in these codecs: temb_ch=0)."""

    in_channels: int
    out_channels: int
    spatial_norm: bool = False
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, zq=None):
        h = _norm(self.spatial_norm, "norm1", self.dtype, x, zq, self.sp_axis)
        h = swish(h)
        h = _conv3(self.out_channels, "conv1", self.dtype, self.sp_axis)(h)
        h = _norm(self.spatial_norm, "norm2", self.dtype, h, zq, self.sp_axis)
        h = swish(h)
        h = _conv3(self.out_channels, "conv2", self.dtype, self.sp_axis)(h)
        if self.in_channels != self.out_channels:
            x = dense(self.out_channels, "nin_shortcut", self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full spatial self-attention (vqgan_blocks.py:196-239 /
    movq_modules.py:182-225); fp32 softmax."""

    spatial_norm: bool = False
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, zq=None):
        B, H, W, C = x.shape
        h = _norm(self.spatial_norm, "norm", self.dtype, x, zq, self.sp_axis)
        if self.sp_axis is not None:
            from ..parallel.spatial import sp_attention_rows

            q = dense(C, "q", self.dtype)(h)
            k = dense(C, "k", self.dtype)(h)
            v = dense(C, "v", self.dtype)(h)
            out = sp_attention_rows(q, k, v, self.sp_axis)
            return x + dense(C, "proj_out", self.dtype)(out)
        q = dense(C, "q", self.dtype)(h).reshape(B, H * W, C)
        k = dense(C, "k", self.dtype)(h).reshape(B, H * W, C)
        v = dense(C, "v", self.dtype)(h).reshape(B, H * W, C)
        # Logits materialize in the ACTIVATION dtype: the reference runs
        # softmax(bmm(q,k)) in the model's half precision with no fp32
        # upcast at all (vqgan_blocks.py:226-229), so a bf16 HBM buffer is
        # faithful — and at 96² latents the [9216, 9216] logits tensor is
        # the decode's largest HBM term (340 MB fp32 → 170 MB bf16).  The
        # MXU still accumulates the dot in fp32 and the softmax still
        # computes in fp32 on top (beyond-reference precision).
        scale = C ** -0.25
        logits = jnp.einsum("btc,bsc->bts", q * scale, k * scale)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bts,bsc->btc", w, v).reshape(B, H, W, C)
        out = dense(C, "proj_out", self.dtype)(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad strided conv downsample (vqgan_blocks.py:109-126).

    Under spatial parallelism the bottom-only height pad becomes a one-row
    halo from the device below (zeros at the global bottom edge); local rows
    must be even so output shards stay equal."""

    channels: int
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.sp_axis is None:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        else:
            from ..parallel.spatial import halo_below_rows

            x = halo_below_rows(x, self.sp_axis)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
        return conv2d(self.channels, "conv", stride=2, padding=0, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (vqgan_blocks.py:93-106), folded into one
    lhs-dilated conv on the unsharded path (layers.FoldedUpsampleConv —
    same arithmetic, no materialized 2x tensor)."""

    channels: int
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.sp_axis is None:
            from .layers import FoldedUpsampleConv

            return FoldedUpsampleConv(
                self.channels, dtype=self.dtype, name="conv"
            )(x)
        return _conv3(self.channels, "conv", self.dtype, self.sp_axis)(
            upsample_nearest_2x(x)
        )


class Encoder(nn.Module):
    """Conv encoder (vqgan_blocks.Encoder:253-367)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = False
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        num_res = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        h = _conv3(self.ch, "conv_in", self.dtype, self.sp_axis)(x)
        curr_res = self.resolution
        for i_level in range(num_res):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    block_in, block_out, dtype=self.dtype, sp_axis=self.sp_axis,
                    name=f"down.{i_level}.block.{i_block}",
                )(h)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(
                        dtype=self.dtype, sp_axis=self.sp_axis,
                        name=f"down.{i_level}.attn.{i_block}",
                    )(h)
            if i_level != num_res - 1:
                h = Downsample(
                    block_in, dtype=self.dtype, sp_axis=self.sp_axis,
                    name=f"down.{i_level}.downsample",
                )(h)
                curr_res //= 2
        h = ResnetBlock(
            block_in, block_in, dtype=self.dtype, sp_axis=self.sp_axis,
            name="mid.block_1",
        )(h)
        h = AttnBlock(dtype=self.dtype, sp_axis=self.sp_axis, name="mid.attn_1")(h)
        h = ResnetBlock(
            block_in, block_in, dtype=self.dtype, sp_axis=self.sp_axis,
            name="mid.block_2",
        )(h)
        h = GroupNorm32(
            num_groups=32, eps=1e-6, axis_name=self.sp_axis, name="norm_out"
        )(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _conv3(out_ch, "conv_out", self.dtype, self.sp_axis)(h)


class Decoder(nn.Module):
    """Conv decoder; ``spatial_norm=True`` makes it the MOVQDecoder
    (vqgan_blocks.Decoder:370-499 / movq_modules.MOVQDecoder:228-357)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    spatial_norm: bool = False
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, z, zq=None):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        h = _conv3(block_in, "conv_in", self.dtype, self.sp_axis)(z)
        h = ResnetBlock(
            block_in, block_in, self.spatial_norm, self.dtype, self.sp_axis,
            name="mid.block_1",
        )(h, zq)
        h = AttnBlock(
            self.spatial_norm, self.dtype, self.sp_axis, name="mid.attn_1"
        )(h, zq)
        h = ResnetBlock(
            block_in, block_in, self.spatial_norm, self.dtype, self.sp_axis,
            name="mid.block_2",
        )(h, zq)
        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    block_in, block_out, self.spatial_norm, self.dtype,
                    self.sp_axis, name=f"up.{i_level}.block.{i_block}",
                )(h, zq)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(
                        self.spatial_norm, self.dtype, self.sp_axis,
                        name=f"up.{i_level}.attn.{i_block}",
                    )(h, zq)
            if i_level != 0:
                h = Upsample(
                    block_in, dtype=self.dtype, sp_axis=self.sp_axis,
                    name=f"up.{i_level}.upsample",
                )(h)
                curr_res *= 2
        h = _norm(self.spatial_norm, "norm_out", self.dtype, h, zq, self.sp_axis)
        h = swish(h)
        return _conv3(self.out_ch, "conv_out", self.dtype, self.sp_axis)(h)


class VectorQuantizer(nn.Module):
    """L2 nearest-codebook lookup with straight-through estimator
    (quntize.py:80-131)."""

    n_e: int = 16384
    e_dim: int = 4

    def setup(self):
        # torch path: quantize.embedding.weight (an nn.Embedding)
        self.embedding = nn.Embed(
            self.n_e,
            self.e_dim,
            embedding_init=nn.initializers.uniform(scale=2.0 / self.n_e),
            param_dtype=jnp.float32,
            name="embedding",
        )

    def __call__(self, z):
        # z: NHWC with C == e_dim.  Fused argmin(‖z‖²+‖e‖²−2z·e) + gather.
        emb = self.embedding.embedding
        flat = z.reshape(-1, self.e_dim).astype(jnp.float32)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(emb**2, axis=1)[None, :]
            - 2.0 * flat @ emb.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(z.shape).astype(z.dtype)
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, idx.reshape(z.shape[:-1])

    def lookup(self, indices):
        return self.embedding(indices)


class MOVQ(nn.Module):
    """MoVQ facade (autoencoder.py:160-201): ``encode`` returns the
    *pre-quantization* latent (the 2.1 pipeline never quantizes on encode,
    autoencoder.py:176-180); ``decode`` modulates the decoder with the latent
    itself."""

    z_channels: int = 4
    embed_dim: int = 4
    n_embed: int = 16384
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    out_ch: int = 3
    dtype: Dtype = jnp.float32
    # Mesh axis name for row-sharded (spatially parallel) encode/decode;
    # see parallel/spatial.py.
    sp_axis: Optional[str] = None

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.z_channels, double_z=False, dtype=self.dtype,
            sp_axis=self.sp_axis, name="encoder",
        )
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            spatial_norm=True, dtype=self.dtype, sp_axis=self.sp_axis,
            name="decoder",
        )
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, name="quantize")
        self.quant_conv = dense(self.embed_dim, "quant_conv", self.dtype)
        self.post_quant_conv = dense(self.z_channels, "post_quant_conv", self.dtype)

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, quant):
        quant2 = self.post_quant_conv(quant)
        return self.decoder(quant2, zq=quant)

    def decode_code(self, code):
        quant = self.quantize.lookup(code).astype(self.dtype)
        return self.decode(quant)

    def __call__(self, x):
        h = self.encode(x)
        # The 2.1 inference path never quantizes (autoencoder.py:176-180), but
        # the codebook is part of the checkpoint; touch it so init creates it.
        self.quantize(h)
        return self.decode(h)


class AutoencoderKL(nn.Module):
    """KL-VAE used by Kandinsky 2.0 (autoencoder.py:110-157).

    ``encode`` returns (mean, logvar); ``decode`` maps latents to images."""

    z_channels: int = 4
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    out_ch: int = 3
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.z_channels, double_z=True, dtype=self.dtype,
            sp_axis=self.sp_axis, name="encoder",
        )
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            spatial_norm=False, dtype=self.dtype, sp_axis=self.sp_axis,
            name="decoder",
        )
        self.quant_conv = dense(2 * self.embed_dim, "quant_conv", self.dtype)
        self.post_quant_conv = dense(self.z_channels, "post_quant_conv", self.dtype)

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample_posterior(self, x, rng):
        mean, logvar = self.encode(x)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        mean, _ = self.encode(x)
        return self.decode(mean)


class VQModelInterface(nn.Module):
    """Plain VQ codec (autoencoder.py:89-107)."""

    z_channels: int = 4
    embed_dim: int = 4
    n_embed: int = 16384
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    out_ch: int = 3
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.z_channels, double_z=False, dtype=self.dtype,
            sp_axis=self.sp_axis, name="encoder",
        )
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            spatial_norm=False, dtype=self.dtype, sp_axis=self.sp_axis,
            name="decoder",
        )
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, name="quantize")
        self.quant_conv = dense(self.embed_dim, "quant_conv", self.dtype)
        self.post_quant_conv = dense(self.z_channels, "post_quant_conv", self.dtype)

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, h, force_not_quantize: bool = False):
        if not force_not_quantize:
            h, _ = self.quantize(h)
        return self.decoder(self.post_quant_conv(h))

    def __call__(self, x):
        return self.decode(self.encode(x))
