"""Kandinsky 2.2 decoder UNet (diffusers ``UNet2DConditionModel`` layout),
TPU-native (NHWC, flax).

The reference's 2.2 path delegates to HF diffusers (kandinsky2/
kandinsky2_2_model.py:26-42); the load-bearing architecture is the
kandinsky-community/kandinsky-2-2-decoder UNet: an unCLIP-style ADM UNet
conditioned ONLY on a (ViT-bigG, 1280-d) image embedding —

* block channels (384, 768, 1280, 1536), 3 resnets/level,
  scale-shift time conditioning, resblock up/downsampling
* "Simple" added-KV cross-attention at levels 1-3 and the middle: encoder
  tokens are projected with separate add_k/add_v and prepended to the spatial
  KV; single 1/sqrt(d) scaling, fp32 softmax
* conditioning: image emb -> N pseudo-tokens (ImageProjection) as encoder
  states + image emb -> time-embedding additive term (ImageTimeEmbedding)
* ControlNet-depth variant: ImageHintTimeEmbedding encodes a pixel-space hint
  through a strided conv stack to 4 latent channels concatenated to the
  sample (in_channels 8).

Module names follow the diffusers state_dict so checkpoint conversion is
mechanical; the mapping is validated structurally here and against real
checkpoints once weights are available.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import _c3
from .layers import (
    GroupNorm32,
    LayerNormF32,
    avg_pool_2x,
    conv2d,
    dense,
    upsample_nearest_2x,
)

Dtype = Any


def timestep_embedding_22(timesteps, dim, max_period=10000.0):
    """diffusers get_timestep_embedding with flip_sin_to_cos=False,
    downscale_freq_shift=0: [sin, cos] order, denominator = half."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResnetBlock22(nn.Module):
    """diffusers ResnetBlock2D, time_scale_shift='scale_shift', optional
    internal up/down (avg-pool / nearest, matching ADM resblock_updown)."""

    in_channels: int
    out_channels: int
    temb_channels: int
    up: bool = False
    down: bool = False
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm32(
            num_groups=32, eps=self.eps, swish=1.0, axis_name=self.sp_axis,
            name="norm1",
        )(x)
        if self.up:
            x = upsample_nearest_2x(x)
            if self.sp_axis is None:
                # upsample+conv folded into one lhs-dilated conv (same
                # params/arithmetic, no materialized 2x tensor)
                from .layers import FoldedUpsampleConv

                h = FoldedUpsampleConv(
                    self.out_channels, dtype=self.dtype, name="conv1"
                )(h)
            else:
                h = upsample_nearest_2x(h)
                h = _c3(self.out_channels, "conv1", self.dtype,
                        self.sp_axis)(h)
        else:
            if self.down:
                # 2x2 window never crosses an even row-shard boundary
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = _c3(self.out_channels, "conv1", self.dtype, self.sp_axis)(h)
        emb = dense(2 * self.out_channels, "time_emb_proj", self.dtype)(
            jax.nn.silu(temb)
        ).astype(h.dtype)[:, None, None, :]
        scale, shift = jnp.split(emb, 2, axis=-1)
        # FiLM folded into the norm coefficients (fused on the Pallas path)
        h = GroupNorm32(
            num_groups=32, eps=self.eps, swish=1.0, axis_name=self.sp_axis,
            name="norm2",
        )(h, film=(scale, shift))
        h = _c3(self.out_channels, "conv2", self.dtype, self.sp_axis)(h)
        if self.in_channels != self.out_channels:
            x = dense(self.out_channels, "conv_shortcut", self.dtype)(x)
        return x + h


class AddedKVAttention(nn.Module):
    """diffusers Attention + AttnAddedKVProcessor: GroupNorm'd spatial tokens,
    separate q/k/v plus add_k/add_v projections of the encoder states
    prepended to the KV; 1/sqrt(d) scaling, fp32 softmax."""

    channels: int
    heads: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, encoder_states):
        B, H, W, C = x.shape
        ch = C // self.heads
        h = GroupNorm32(
            num_groups=32, eps=self.eps, swish=0.0, axis_name=self.sp_axis,
            name="group_norm",
        )(x).reshape(B, H * W, C)
        q = dense(C, "to_q", self.dtype)(h).reshape(B, -1, self.heads, ch)
        k = dense(C, "to_k", self.dtype)(h).reshape(B, -1, self.heads, ch)
        v = dense(C, "to_v", self.dtype)(h).reshape(B, -1, self.heads, ch)
        if self.sp_axis is not None:
            # exact softmax over the full image: local query rows vs
            # all-gathered spatial K/V (device order == row order)
            k = jax.lax.all_gather(k, self.sp_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.sp_axis, axis=1, tiled=True)
        ek = dense(C, "add_k_proj", self.dtype)(encoder_states).reshape(
            B, -1, self.heads, ch
        )
        ev = dense(C, "add_v_proj", self.dtype)(encoder_states).reshape(
            B, -1, self.heads, ch
        )
        k = jnp.concatenate([ek, k], axis=1)
        v = jnp.concatenate([ev, v], axis=1)
        logits = jnp.einsum(
            "bthc,bshc->bhts", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(ch)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, H * W, C)
        a = dense(C, "to_out.0", self.dtype)(a)
        return x + a.reshape(B, H, W, C)


class ImageProjection(nn.Module):
    """image emb [B, D] -> N cross-attn tokens [B, N, cross_dim]
    (diffusers ImageProjection: Linear + LayerNorm)."""

    cross_attention_dim: int
    num_image_text_embeds: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds):
        B = image_embeds.shape[0]
        x = dense(
            self.num_image_text_embeds * self.cross_attention_dim,
            "image_embeds", self.dtype,
        )(image_embeds)
        x = x.reshape(B, self.num_image_text_embeds, self.cross_attention_dim)
        return LayerNormF32(name="norm")(x)


class ImageTimeEmbedding(nn.Module):
    """image emb -> additive time-embedding term (diffusers
    ImageTimeEmbedding: Linear then LayerNorm)."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds):
        x = dense(self.time_embed_dim, "image_proj", self.dtype)(image_embeds)
        return LayerNormF32(name="image_norm")(x)


class ImageHintTimeEmbedding(nn.Module):
    """ControlNet variant (diffusers ImageHintTimeEmbedding): the image emb
    contributes to the time embedding, the pixel-space hint is encoded by the
    ControlNet conv stack (3->16->16->32->32->96->96->256, /8 spatial) into a
    4-channel latent map that the UNet concatenates to its input."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds, hint):
        emb = dense(self.time_embed_dim, "image_proj", self.dtype)(image_embeds)
        emb = LayerNormF32(name="image_norm")(emb)
        chans = [16, 16, 32, 32, 96, 96, 256]
        h = hint
        for i, c in enumerate(chans):
            stride = 2 if i in (2, 4, 6) else 1
            h = conv2d(
                c, f"input_hint_block.{2*i}", stride=stride, dtype=self.dtype
            )(h)
            h = jax.nn.silu(h)
        h = conv2d(4, "input_hint_block.14", dtype=self.dtype, zero_init=True)(h)
        return emb, h


def deep_cache_spec22(unet) -> tuple[int, int]:
    """(spatial_divisor, channels) of UNet22.denoise_cached's deep cache:
    the feature entering the last up block — full resolution,
    block_out_channels[1] channels (the penultimate up block's upsampler has
    already restored the spatial dims)."""
    return 1, int(unet.block_out_channels[1])


class UNet22(nn.Module):
    """Kandinsky 2.2 decoder UNet (diffusers UNet2DConditionModel config of
    kandinsky-community/kandinsky-2-2-decoder)."""

    in_channels: int = 4
    out_channels: int = 8
    block_out_channels: Sequence[int] = (384, 768, 1280, 1536)
    layers_per_block: int = 3
    attention_head_dim: int = 64
    cross_attention_dim: int = 768
    encoder_hid_dim: int = 1280
    num_image_tokens: int = 10
    # which blocks carry attention comes straight from the checkpoint's
    # config.json (diffusers down/up_block_types): a block type containing
    # "CrossAttn" gets AddedKVAttention after each resnet
    down_block_types: Sequence[str] = (
        "ResnetDownsampleBlock2D",
        "SimpleCrossAttnDownBlock2D",
        "SimpleCrossAttnDownBlock2D",
        "SimpleCrossAttnDownBlock2D",
    )
    up_block_types: Sequence[str] = (
        "SimpleCrossAttnUpBlock2D",
        "SimpleCrossAttnUpBlock2D",
        "SimpleCrossAttnUpBlock2D",
        "ResnetUpsampleBlock2D",
    )
    controlnet_hint: bool = False
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    # Mesh axis for spatially-parallel (row-sharded) execution inside
    # shard_map; see parallel/spatial.py.  None = single-device layout.
    sp_axis: Optional[str] = None

    def setup(self):
        ch0 = self.block_out_channels[0]
        tdim = ch0 * 4
        self.time_embedding_1 = dense(tdim, "time_embedding.linear_1", self.dtype)
        self.time_embedding_2 = dense(tdim, "time_embedding.linear_2", self.dtype)
        self.encoder_hid_proj = ImageProjection(
            self.cross_attention_dim, self.num_image_tokens,
            dtype=self.dtype, name="encoder_hid_proj",
        )
        if self.controlnet_hint:
            self.add_embedding = ImageHintTimeEmbedding(
                tdim, dtype=self.dtype, name="add_embedding"
            )
        else:
            self.add_embedding = ImageTimeEmbedding(
                tdim, dtype=self.dtype, name="add_embedding"
            )
        if self.sp_axis is None:
            self.conv_in = conv2d(ch0, "conv_in", dtype=self.dtype)
        else:
            # setup-created module: a real nn.Conv (flax cannot register
            # modules hidden in closures); halo rows prepended in denoise
            self.conv_in = nn.Conv(
                ch0, kernel_size=(3, 3), padding=((0, 0), (1, 1)),
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.lecun_normal(), name="conv_in",
            )

        down, skips = [], [ch0]
        ch = ch0
        n_levels = len(self.block_out_channels)
        for i, out_ch in enumerate(self.block_out_channels):
            resnets, attns = [], []
            for j in range(self.layers_per_block):
                resnets.append(
                    ResnetBlock22(
                        ch, out_ch, tdim, eps=self.eps, dtype=self.dtype,
                        sp_axis=self.sp_axis,
                        name=f"down_blocks.{i}.resnets.{j}",
                    )
                )
                ch = out_ch
                skips.append(ch)
                if "CrossAttn" in self.down_block_types[i]:
                    attns.append(
                        AddedKVAttention(
                            ch, ch // self.attention_head_dim, eps=self.eps,
                            dtype=self.dtype, sp_axis=self.sp_axis,
                            name=f"down_blocks.{i}.attentions.{j}",
                        )
                    )
            downsampler = None
            if i != n_levels - 1:
                downsampler = ResnetBlock22(
                    ch, ch, tdim, down=True, eps=self.eps, dtype=self.dtype,
                    sp_axis=self.sp_axis,
                    name=f"down_blocks.{i}.downsamplers.0",
                )
                skips.append(ch)
            down.append((tuple(resnets), tuple(attns), downsampler))
        self.down = tuple(down)
        self._skips = tuple(skips)

        self.mid_resnets = (
            ResnetBlock22(
                ch, ch, tdim, eps=self.eps, dtype=self.dtype,
                sp_axis=self.sp_axis, name="mid_block.resnets.0",
            ),
            ResnetBlock22(
                ch, ch, tdim, eps=self.eps, dtype=self.dtype,
                sp_axis=self.sp_axis, name="mid_block.resnets.1",
            ),
        )
        self.mid_attn = AddedKVAttention(
            ch, ch // self.attention_head_dim, eps=self.eps, dtype=self.dtype,
            sp_axis=self.sp_axis, name="mid_block.attentions.0",
        )

        up = []
        skips = list(skips)
        rev_channels = list(reversed(self.block_out_channels))
        for i, out_ch in enumerate(rev_channels):
            resnets, attns = [], []
            is_attn_block = "CrossAttn" in self.up_block_types[i]
            for j in range(self.layers_per_block + 1):
                skip_ch = skips.pop()
                resnets.append(
                    ResnetBlock22(
                        ch + skip_ch, out_ch, tdim, eps=self.eps,
                        dtype=self.dtype, sp_axis=self.sp_axis,
                        name=f"up_blocks.{i}.resnets.{j}",
                    )
                )
                ch = out_ch
                if is_attn_block:
                    attns.append(
                        AddedKVAttention(
                            ch, ch // self.attention_head_dim, eps=self.eps,
                            dtype=self.dtype, sp_axis=self.sp_axis,
                            name=f"up_blocks.{i}.attentions.{j}",
                        )
                    )
            upsampler = None
            if i != n_levels - 1:
                upsampler = ResnetBlock22(
                    ch, ch, tdim, up=True, eps=self.eps, dtype=self.dtype,
                    sp_axis=self.sp_axis,
                    name=f"up_blocks.{i}.upsamplers.0",
                )
            up.append((tuple(resnets), tuple(attns), upsampler))
        self.up = tuple(up)

        self.conv_norm_out = GroupNorm32(
            num_groups=32, eps=self.eps, swish=1.0, axis_name=self.sp_axis,
            name="conv_norm_out",
        )
        if self.sp_axis is None:
            self.conv_out = conv2d(
                self.out_channels, "conv_out", dtype=jnp.float32,
                zero_init=True,
            )
        else:
            self.conv_out = nn.Conv(
                self.out_channels, kernel_size=(3, 3),
                padding=((0, 0), (1, 1)), dtype=jnp.float32,
                param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
                name="conv_out",
            )

    def encode_conditioning(self, image_embeds, hint=None):
        """(encoder_states, aug_emb, hint_latent) — once per generation."""
        image_embeds = image_embeds.astype(self.dtype)
        encoder_states = self.encoder_hid_proj(image_embeds)
        if self.controlnet_hint:
            aug_emb, hint_latent = self.add_embedding(
                image_embeds, hint.astype(self.dtype)
            )
            return encoder_states, aug_emb, hint_latent
        return encoder_states, self.add_embedding(image_embeds), None

    def time_embedding(self, timesteps):
        temb = timestep_embedding_22(timesteps, self.block_out_channels[0])
        return self.time_embedding_2(
            jax.nn.silu(self.time_embedding_1(temb.astype(self.dtype)))
        )

    def _local_hint(self, x, hint_latent):
        """Concatenate the hint latent to x; under SP the hint was encoded
        replicated (full rows) in encode_conditioning, so slice this
        device's row block out of it."""
        hint = hint_latent.astype(x.dtype)
        if self.sp_axis is not None and hint.shape[1] != x.shape[1]:
            start = jax.lax.axis_index(self.sp_axis) * x.shape[1]
            hint = jax.lax.dynamic_slice_in_dim(hint, start, x.shape[1], 1)
        return jnp.concatenate([x, hint], axis=-1)

    def _conv_in_h(self, x):
        if self.sp_axis is not None:
            from ..parallel.spatial import halo_exchange_rows

            x = halo_exchange_rows(x, self.sp_axis)
        return self.conv_in(x)

    def _conv_out_h(self, h):
        if self.sp_axis is not None:
            from ..parallel.spatial import halo_exchange_rows

            h = halo_exchange_rows(h, self.sp_axis)
        return self.conv_out(h)

    def denoise(self, x, timesteps, encoder_states, aug_emb, hint_latent=None):
        emb = self.time_embedding(timesteps) + aug_emb.astype(self.dtype)
        if self.controlnet_hint:
            x = self._local_hint(x, hint_latent)
        h = self._conv_in_h(x.astype(self.dtype))
        hs = [h]
        for resnets, attns, downsampler in self.down:
            for j, res in enumerate(resnets):
                h = res(h, emb)
                if attns:
                    h = attns[j](h, encoder_states)
                hs.append(h)
            if downsampler is not None:
                h = downsampler(h, emb)
                hs.append(h)
        h = self.mid_resnets[0](h, emb)
        h = self.mid_attn(h, encoder_states)
        h = self.mid_resnets[1](h, emb)
        for resnets, attns, upsampler in self.up:
            for j, res in enumerate(resnets):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(h, emb)
                if attns:
                    h = attns[j](h, encoder_states)
            if upsampler is not None:
                h = upsampler(h, emb)
        h = self.conv_norm_out(h.astype(jnp.float32))
        return self._conv_out_h(h)

    def denoise_cached(self, x, timesteps, encoder_states, aug_emb,
                       hint_latent, cache, refresh):
        """DeepCache-style denoise: level 0 (conv_in + first down block's
        resnets + the last up block) stays hot; everything deeper — the
        first downsampler through the penultimate up block — recomputes only
        on ``refresh`` steps and is otherwise reused from ``cache``
        (full-res feature map, ``block_out_channels[1]`` channels; see
        deep_cache_spec22).  Returns (out, new_cache).  Apply-only."""
        emb = self.time_embedding(timesteps) + aug_emb.astype(self.dtype)
        if self.controlnet_hint:
            x = self._local_hint(x, hint_latent)
        h = self._conv_in_h(x.astype(self.dtype))
        hs = [h]
        resnets0, attns0, downsampler0 = self.down[0]
        for j, res in enumerate(resnets0):
            h = res(h, emb)
            if attns0:
                h = attns0[j](h, encoder_states)
            hs.append(h)

        def deep_fn(h):
            dhs = []
            if downsampler0 is not None:
                h = downsampler0(h, emb)
                dhs.append(h)
            for resnets, attns, downsampler in self.down[1:]:
                for j, res in enumerate(resnets):
                    h = res(h, emb)
                    if attns:
                        h = attns[j](h, encoder_states)
                    dhs.append(h)
                if downsampler is not None:
                    h = downsampler(h, emb)
                    dhs.append(h)
            h = self.mid_resnets[0](h, emb)
            h = self.mid_attn(h, encoder_states)
            h = self.mid_resnets[1](h, emb)
            for resnets, attns, upsampler in self.up[:-1]:
                for j, res in enumerate(resnets):
                    h = jnp.concatenate([h, dhs.pop()], axis=-1)
                    h = res(h, emb)
                    if attns:
                        h = attns[j](h, encoder_states)
                if upsampler is not None:
                    h = upsampler(h, emb)
            return h.astype(self.dtype)

        h = jax.lax.cond(
            refresh, deep_fn, lambda _: cache.astype(self.dtype), h
        )
        new_cache = h
        resnets_last, attns_last, _ = self.up[-1]
        for j, res in enumerate(resnets_last):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = res(h, emb)
            if attns_last:
                h = attns_last[j](h, encoder_states)
        h = self.conv_norm_out(h.astype(jnp.float32))
        return self._conv_out_h(h), new_cache

    def __call__(self, x, timesteps, image_embeds, hint=None):
        encoder_states, aug_emb, hint_latent = self.encode_conditioning(
            image_embeds, hint
        )
        return self.denoise(x, timesteps, encoder_states, aug_emb, hint_latent)
