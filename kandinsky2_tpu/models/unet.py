"""ADM/GLIDE-style latent UNet, TPU-native (NHWC, flax).

Reimplements the reference decoder UNet family:

* ``UNetModel``            — torso (kandinsky2/model/unet.py:343-611)
* ``Text2ImUNet21``        — 2.1 text+image conditioning (text2im_model2_1.py:13-129)
* ``InpaintText2ImUNet21`` — 2.1 inpainting input channels (text2im_model2_1.py:131-155)
* ``Text2ImUNet20``        — 2.0 dual-text conditioning (text2im_model.py:13-111)
* ``InpaintText2ImUNet20`` — 2.0 inpainting (text2im_model.py:114-137)

TPU-first design choices (vs the reference):

* NHWC everywhere; attention operates on [B, T, C] with encoder tokens
  prepended to the spatial KV (unet.py:297-302) via
  :func:`kandinsky2_tpu.ops.qkv_attention` (fp32 softmax, Pallas flash kernel
  for long sequences).
* Conditioning is computed once by ``encode_conditioning`` and passed into the
  (scanned) denoise step — no mutable text-emb cache object
  (text2im_model2_1.py:57-83 caches per Python loop; under ``lax.scan`` the
  encode is simply hoisted out of the loop).
* Module names match the torch state_dict so weight conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import qkv_attention
from .layers import (
    AttentionPooling,
    GroupNorm32,
    LayerNormF32,
    avg_pool_2x,
    conv2d,
    dense,
    timestep_embedding,
    upsample_nearest_2x,
)

Dtype = Any


def _c3(features, name, dtype, sp_axis=None, zero_init=False):
    """3x3 conv; halo-exchange variant when image rows are device-sharded
    (parallel/spatial.py).  Identical params either way."""
    if sp_axis is None:
        return conv2d(features, name, dtype=dtype, zero_init=zero_init)
    from ..parallel.spatial import sp_conv3x3

    return sp_conv3x3(features, name, sp_axis, dtype=dtype, zero_init=zero_init)


class ResBlock(nn.Module):
    """Residual block with FiLM scale-shift GroupNorm (unet.py:110-220)."""

    channels: int
    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        h = GroupNorm32(swish=1.0, axis_name=self.sp_axis, name="in_layers.0")(x)
        if self.up:
            # nearest 2x doubles rows inside each shard: alignment preserved
            x = upsample_nearest_2x(x)
            if self.sp_axis is None:
                # upsample+conv folded into one lhs-dilated conv (same
                # params/arithmetic, no materialized 2x tensor)
                from .layers import FoldedUpsampleConv

                h = FoldedUpsampleConv(
                    self.out_channels, dtype=self.dtype, name="in_layers.2"
                )(h)
            else:
                h = upsample_nearest_2x(h)
                h = _c3(self.out_channels, "in_layers.2", self.dtype,
                        self.sp_axis)(h)
        else:
            if self.down:
                # 2x2 window never crosses an even row-shard boundary
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = _c3(self.out_channels, "in_layers.2", self.dtype,
                    self.sp_axis)(h)

        emb_dim = (
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        )
        emb_out = dense(emb_dim, "emb_layers.1", self.dtype)(jax.nn.silu(emb))
        emb_out = emb_out.astype(h.dtype)[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            # FiLM folded into the norm's per-channel coefficients (fused
            # with the normalize+SiLU pass on the Pallas path)
            h = GroupNorm32(
                swish=1.0, axis_name=self.sp_axis, name="out_layers.0"
            )(h, film=(scale, shift))
        else:
            h = h + emb_out
            h = GroupNorm32(swish=1.0, axis_name=self.sp_axis, name="out_layers.0")(h)
        h = _c3(
            self.out_channels, "out_layers.3", self.dtype, self.sp_axis,
            zero_init=True,
        )(h)

        if self.out_channels != self.channels:
            x = dense(self.out_channels, "skip_connection", self.dtype)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with optional encoder KV concatenated *before*
    the spatial KV (unet.py:223-340).  Per-head channel layout of the fused
    qkv/encoder_kv projections matches the reference conv1d ordering
    ([head][q|k|v][ch]) so converted weights line up."""

    channels: int
    num_heads: int
    use_encoder_kv: bool = False
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, encoder_out: Optional[jnp.ndarray] = None):
        B, H, W, C = x.shape
        heads = self.num_heads
        ch = C // heads
        h = GroupNorm32(swish=0.0, axis_name=self.sp_axis, name="norm")(x)
        h = h.reshape(B, H * W, C)
        qkv = dense(3 * C, "qkv", self.dtype)(h)
        qkv = qkv.reshape(B, H * W, heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ek = ev = None
        if self.use_encoder_kv:
            ekv = dense(2 * C, "encoder_kv", self.dtype)(encoder_out)
            ekv = ekv.reshape(B, encoder_out.shape[1], heads, 2 * ch)
            ek, ev = jnp.split(ekv, 2, axis=-1)
        ring = False
        if self.sp_axis is not None:
            from ..parallel.spatial import RING_THRESHOLD_TOKENS

            n = jax.lax.axis_size(self.sp_axis)
            ring = H * W * n > RING_THRESHOLD_TOKENS
        if ring:
            # exact ring attention: spatial K/V stay sharded (one ppermute
            # hop per step), the replicated text tokens fold in first — no
            # [B, T, heads, ch] full-image K/V gather at extreme resolutions
            from ..parallel.spatial import sp_ring_attention_mh

            a = sp_ring_attention_mh(
                q, k, v, self.sp_axis, extra_k=ek, extra_v=ev
            )
        else:
            if self.sp_axis is not None:
                # exact softmax over the full image: local query rows attend
                # to all-gathered K/V (row order == device order on the axis)
                k = jax.lax.all_gather(k, self.sp_axis, axis=1, tiled=True)
                v = jax.lax.all_gather(v, self.sp_axis, axis=1, tiled=True)
            if self.use_encoder_kv:
                k = jnp.concatenate([ek, k], axis=1)
                v = jnp.concatenate([ev, v], axis=1)
            a = qkv_attention(q, k, v)
        a = a.reshape(B, H * W, C)
        a = dense(C, "proj_out", self.dtype, zero_init=True)(a)
        return x + a.reshape(B, H, W, C)


class Downsample(nn.Module):
    """Strided-conv downsample (unet.py:80-107, conv_resample=True)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.sp_axis is not None:
            from ..parallel.spatial import sp_conv3x3_down

            return sp_conv3x3_down(
                self.out_channels, "op", self.sp_axis, dtype=self.dtype
            )(x)
        return conv2d(self.out_channels, "op", stride=2, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest 2x + conv upsample (unet.py:48-77), folded into one
    lhs-dilated conv on the unsharded path (layers.FoldedUpsampleConv —
    same arithmetic, no materialized 2x tensor)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.sp_axis is None:
            from .layers import FoldedUpsampleConv

            return FoldedUpsampleConv(
                self.out_channels, dtype=self.dtype, name="conv"
            )(x)
        return _c3(self.out_channels, "conv", self.dtype, self.sp_axis)(
            upsample_nearest_2x(x)
        )


def _build_plan(
    model_channels: int,
    num_res_blocks: int,
    channel_mult: Sequence[int],
    attention_resolutions: Sequence[int],
    resblock_updown: bool,
):
    """Static layer plan mirroring the torch constructor's channel/ds
    bookkeeping (unet.py:424-557).  Each entry is a list of
    (kind, in_ch, out_ch) specs for one TimestepEmbedSequential."""
    ch = int(channel_mult[0] * model_channels)
    input_plan = [[("conv_in", 0, ch)]]
    input_chans = [ch]
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            layers = [("res", ch, int(mult * model_channels))]
            ch = int(mult * model_channels)
            if ds in attention_resolutions:
                layers.append(("attn", ch, ch))
            input_plan.append(layers)
            input_chans.append(ch)
        if level != len(channel_mult) - 1:
            kind = "res_down" if resblock_updown else "down"
            input_plan.append([(kind, ch, ch)])
            input_chans.append(ch)
            ds *= 2
    middle_ch = ch
    output_plan = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            ich = input_chans.pop()
            layers = [("res", ch + ich, int(model_channels * mult))]
            ch = int(model_channels * mult)
            if ds in attention_resolutions:
                layers.append(("attn", ch, ch))
            if level and i == num_res_blocks:
                kind = "res_up" if resblock_updown else "up"
                layers.append((kind, ch, ch))
                ds //= 2
            output_plan.append(layers)
    return input_plan, middle_ch, output_plan


def deep_cache_spec(unet, split: Optional[int] = None):
    """(spatial_divisor, channels) of the deep-branch cache produced by
    ``run_torso_cached`` for ``unet`` at ``split`` (default: all of level 0,
    i.e. num_res_blocks + 1 input blocks stay hot)."""
    split = unet.num_res_blocks + 1 if split is None else split
    input_plan, middle_ch, output_plan = _build_plan(
        unet.model_channels, unet.num_res_blocks, tuple(unet.channel_mult),
        tuple(unet.attention_resolutions), unet.resblock_updown,
    )
    L = len(input_plan)
    if not 1 <= split < L:
        raise ValueError(f"split must be in [1, {L}), got {split}")
    ds = 1
    for layers in input_plan[:split]:
        for kind, _, _ in layers:
            if kind in ("down", "res_down"):
                ds *= 2
    # the cache is the feature entering output block L-split: the out channels
    # of the last deep output layer (or the middle block when split == L)
    ch = output_plan[L - split - 1][-1][2] if L - split - 1 >= 0 else middle_ch
    return ds, ch


class UNetModel(nn.Module):
    """UNet torso + timestep embedding (unet.py:343-611)."""

    in_channels: int = 4
    model_channels: int = 384
    out_channels: int = 8
    num_res_blocks: int = 3
    attention_resolutions: Sequence[int] = (2, 4, 8)
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    num_heads: int = 1
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_encoder_kv: bool = False
    dtype: Dtype = jnp.float32
    # Mesh axis for spatially-parallel (row-sharded) execution inside
    # shard_map; see parallel/spatial.py.  None = single-device layout.
    sp_axis: Optional[str] = None

    def _heads(self, ch: int, upsample: bool) -> int:
        if self.num_head_channels != -1:
            return ch // self.num_head_channels
        if upsample and self.num_heads_upsample != -1:
            return self.num_heads_upsample
        return self.num_heads

    def _make(self, spec, name: str, upsample_branch: bool):
        kind, cin, cout = spec
        dt = self.dtype
        sp = self.sp_axis
        if kind == "conv_in":
            if sp is None:
                return conv2d(cout, name, dtype=dt)
            # setup-created module: must be a real nn.Conv (flax cannot see
            # modules hidden in closures); the halo rows are prepended by
            # _apply at call time
            return nn.Conv(
                cout, kernel_size=(3, 3), padding=((0, 0), (1, 1)), dtype=dt,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.lecun_normal(), name=name,
            )
        if kind == "res":
            return ResBlock(
                cin, cout, self.use_scale_shift_norm, dtype=dt, sp_axis=sp,
                name=name,
            )
        if kind == "res_down":
            return ResBlock(
                cin, cout, self.use_scale_shift_norm, down=True, dtype=dt,
                sp_axis=sp, name=name,
            )
        if kind == "res_up":
            return ResBlock(
                cin, cout, self.use_scale_shift_norm, up=True, dtype=dt,
                sp_axis=sp, name=name,
            )
        if kind == "attn":
            return AttentionBlock(
                cout,
                self._heads(cout, upsample_branch),
                self.use_encoder_kv,
                dtype=dt,
                sp_axis=sp,
                name=name,
            )
        if kind == "down":
            return Downsample(cout, dtype=dt, sp_axis=sp, name=name)
        if kind == "up":
            return Upsample(cout, dtype=dt, sp_axis=sp, name=name)
        raise ValueError(kind)

    def setup(self):
        input_plan, middle_ch, output_plan = _build_plan(
            self.model_channels,
            self.num_res_blocks,
            self.channel_mult,
            self.attention_resolutions,
            self.resblock_updown,
        )
        self._input_plan, self._output_plan = input_plan, output_plan
        self.input_layers = tuple(
            tuple(
                self._make(spec, f"input_blocks.{i}.{j}", False)
                for j, spec in enumerate(layers)
            )
            for i, layers in enumerate(input_plan)
        )
        self.middle_layers = tuple(
            self._make(spec, f"middle_block.{j}", False)
            for j, spec in enumerate(
                [
                    ("res", middle_ch, middle_ch),
                    ("attn", middle_ch, middle_ch),
                    ("res", middle_ch, middle_ch),
                ]
            )
        )
        self.output_layers = tuple(
            tuple(
                self._make(spec, f"output_blocks.{i}.{j}", True)
                for j, spec in enumerate(layers)
            )
            for i, layers in enumerate(output_plan)
        )
        # The output head stays fp32 (the reference never converts self.out to
        # fp16, unet.py:559-572); sampler math downstream is fp32 anyway.
        self.out_norm = GroupNorm32(
            swish=1.0, axis_name=self.sp_axis, name="out.0"
        )
        if self.sp_axis is None:
            self.out_conv = conv2d(
                self.out_channels, "out.2", dtype=jnp.float32, zero_init=True
            )
        else:
            self.out_conv = nn.Conv(
                self.out_channels, kernel_size=(3, 3),
                padding=((0, 0), (1, 1)), dtype=jnp.float32,
                param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
                name="out.2",
            )
        self.time_embed_0 = dense(self.model_channels * 4, "time_embed.0", jnp.float32)
        self.time_embed_2 = dense(self.model_channels * 4, "time_embed.2", jnp.float32)

    def _apply(self, layer, h, emb, encoder_out):
        if isinstance(layer, ResBlock):
            return layer(h, emb)
        if isinstance(layer, AttentionBlock):
            return layer(h, encoder_out)
        if self.sp_axis is not None and isinstance(layer, nn.Conv):
            from ..parallel.spatial import halo_exchange_rows

            return layer(halo_exchange_rows(h, self.sp_axis))
        return layer(h)

    def run_torso(self, x, emb, encoder_out=None):
        h = x.astype(self.dtype)
        hs = []
        for layers in self.input_layers:
            for layer in layers:
                h = self._apply(layer, h, emb, encoder_out)
            hs.append(h)
        for layer in self.middle_layers:
            h = self._apply(layer, h, emb, encoder_out)
        for layers in self.output_layers:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for layer in layers:
                h = self._apply(layer, h, emb, encoder_out)
        h = h.astype(jnp.float32)
        h = self.out_norm(h)
        if self.sp_axis is not None:
            from ..parallel.spatial import halo_exchange_rows

            h = halo_exchange_rows(h, self.sp_axis)
        return self.out_conv(h)

    def run_torso_cached(self, x, emb, cache, refresh, encoder_out=None,
                         split: Optional[int] = None):
        """DeepCache-style torso: the deep branch (input blocks >= ``split``,
        middle, and the matching deep output blocks) is recomputed only when
        ``refresh`` is true; otherwise the cached deep feature is reused.
        Adjacent diffusion steps change the deep features slowly, so a
        refresh interval of 2-4 trades imperceptible drift for skipping the
        deep ~2/3 of the FLOPs on cached steps (Ma et al. 2023, DeepCache).

        Returns ``(out, new_cache)``.  ``cache`` must have the shape from
        :func:`deep_cache_spec`; the first scan step must refresh.  Only
        valid under ``apply`` (params already initialized via the standard
        path)."""
        split = self.num_res_blocks + 1 if split is None else split
        L = len(self.input_layers)
        h = x.astype(self.dtype)
        hs = []
        for layers in self.input_layers[:split]:
            for layer in layers:
                h = self._apply(layer, h, emb, encoder_out)
            hs.append(h)

        def deep_fn(h):
            deep_hs = []
            for layers in self.input_layers[split:]:
                for layer in layers:
                    h = self._apply(layer, h, emb, encoder_out)
                deep_hs.append(h)
            for layer in self.middle_layers:
                h = self._apply(layer, h, emb, encoder_out)
            for layers in self.output_layers[: L - split]:
                h = jnp.concatenate([h, deep_hs.pop()], axis=-1)
                for layer in layers:
                    h = self._apply(layer, h, emb, encoder_out)
            return h.astype(self.dtype)

        h = jax.lax.cond(
            refresh, deep_fn, lambda _: cache.astype(self.dtype), h
        )
        new_cache = h
        for layers in self.output_layers[L - split:]:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for layer in layers:
                h = self._apply(layer, h, emb, encoder_out)
        h = self.out_norm(h.astype(jnp.float32))
        if self.sp_axis is not None:
            from ..parallel.spatial import halo_exchange_rows

            h = halo_exchange_rows(h, self.sp_axis)
        return self.out_conv(h), new_cache

    def time_embedding(self, timesteps):
        temb = timestep_embedding(timesteps, self.model_channels)
        return self.time_embed_2(jax.nn.silu(self.time_embed_0(temb)))

    def __call__(self, x, timesteps, encoder_out=None):
        return self.run_torso(x, self.time_embedding(timesteps), encoder_out)


class Text2ImUNet21(UNetModel):
    """Kandinsky 2.1 conditioned UNet (text2im_model2_1.py:13-129):
    CLIP image embedding -> 10 pseudo-tokens (clip_to_seq) prepended to the
    projected XLM-R full_emb as cross-attn KV; pooled text + image emb added
    to the timestep embedding."""

    model_dim: int = 768
    image_encoder_in_dim: int = 768
    text_encoder_in_dim1: int = 1024
    text_encoder_in_dim2: int = 768
    num_image_embs: int = 10
    pooling_type: str = "from_model"

    def setup(self):
        super().setup()
        self.clip_to_seq = dense(
            self.model_dim * self.num_image_embs, "clip_to_seq", self.dtype
        )
        self.to_model_dim_n = dense(self.model_dim, "to_model_dim_n", self.dtype)
        if self.pooling_type == "from_model":
            self.proj_n = dense(self.model_channels * 4, "proj_n", self.dtype)
        else:
            self.proj_n = AttentionPooling(
                8, self.text_encoder_in_dim1, self.model_channels * 4,
                dtype=self.dtype, name="proj_n",
            )
        self.ln_model_n = LayerNormF32(name="ln_model_n")
        self.img_layer = dense(self.model_channels * 4, "img_layer", self.dtype)

    def encode_conditioning(
        self, full_emb, pooled_emb, image_emb
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(xf_proj, xf_out): time-emb additive projection and cross-attn
        tokens (text2im_model2_1.py:57-80).  Pure — compute once per
        generation, outside the denoising scan."""
        B = image_emb.shape[0]
        clip_seq = self.clip_to_seq(image_emb).reshape(
            B, self.num_image_embs, self.model_dim
        )
        xf_proj = self.proj_n(
            pooled_emb if self.pooling_type == "from_model" else full_emb
        )
        xf_proj = self.ln_model_n(xf_proj)
        xf_proj = xf_proj + self.img_layer(image_emb)
        xf_out = jnp.concatenate([clip_seq, self.to_model_dim_n(full_emb)], axis=1)
        return xf_proj, xf_out

    def denoise(self, x, timesteps, xf_proj, xf_out):
        emb = self.time_embedding(timesteps) + xf_proj.astype(jnp.float32)
        return self.run_torso(x, emb, xf_out)

    def denoise_cached(self, x, timesteps, xf_proj, xf_out, cache, refresh):
        """Turbo-mode denoise with the deep branch cached across steps; see
        run_torso_cached.  Returns (out, new_cache)."""
        emb = self.time_embedding(timesteps) + xf_proj.astype(jnp.float32)
        return self.run_torso_cached(x, emb, cache, refresh, xf_out)

    def __call__(self, x, timesteps, full_emb=None, pooled_emb=None, image_emb=None):
        xf_proj, xf_out = self.encode_conditioning(full_emb, pooled_emb, image_emb)
        return self.denoise(x, timesteps, xf_proj, xf_out)


class InpaintText2ImUNet21(Text2ImUNet21):
    """2.1 inpainting UNet: input = x ⊕ masked_image ⊕ mask
    (text2im_model2_1.py:131-155).  ``in_channels`` must already be 2C+1
    (the factory handles it, mirroring model_creation.py:49-62)."""

    def denoise(
        self, x, timesteps, xf_proj, xf_out, inpaint_image=None, inpaint_mask=None
    ):
        if inpaint_image is None:
            inpaint_image = jnp.zeros_like(x)
        if inpaint_mask is None:
            inpaint_mask = jnp.zeros_like(x[..., :1])
        x = jnp.concatenate([x, inpaint_image * inpaint_mask, inpaint_mask], axis=-1)
        return Text2ImUNet21.denoise(self, x, timesteps, xf_proj, xf_out)

    def denoise_cached(
        self, x, timesteps, xf_proj, xf_out, inpaint_image, inpaint_mask,
        cache, refresh,
    ):
        x = jnp.concatenate([x, inpaint_image * inpaint_mask, inpaint_mask], axis=-1)
        return Text2ImUNet21.denoise_cached(
            self, x, timesteps, xf_proj, xf_out, cache, refresh
        )

    def __call__(
        self, x, timesteps, full_emb=None, pooled_emb=None, image_emb=None,
        inpaint_image=None, inpaint_mask=None,
    ):
        xf_proj, xf_out = self.encode_conditioning(full_emb, pooled_emb, image_emb)
        return self.denoise(
            x, timesteps, xf_proj, xf_out, inpaint_image, inpaint_mask
        )


class SuperResUNetModel(UNetModel):
    """Super-resolution UNet (unet.py:614-635): conditions on a bilinear-
    upsampled low-res image concatenated to the input.  ``in_channels`` must
    already be doubled."""

    def __call__(self, x, timesteps, low_res=None, **kwargs):
        from .layers import resize_bilinear

        up = resize_bilinear(low_res, x.shape[1:3]).astype(x.dtype)
        return UNetModel.__call__(
            self, jnp.concatenate([x, up], axis=-1), timesteps, **kwargs
        )


class SuperResInpaintUNetModel(UNetModel):
    """Joint super-resolution + inpainting UNet (unet.py:665-701):
    input = x ⊕ masked_image ⊕ mask ⊕ upsampled_low_res (3C+1 channels)."""

    def __call__(self, x, timesteps, inpaint_image=None, inpaint_mask=None,
                 low_res=None, **kwargs):
        from .layers import resize_bilinear

        if inpaint_image is None:
            inpaint_image = jnp.zeros_like(x)
        if inpaint_mask is None:
            inpaint_mask = jnp.zeros_like(x[..., :1])
        up = resize_bilinear(low_res, x.shape[1:3]).astype(x.dtype)
        return UNetModel.__call__(
            self,
            jnp.concatenate(
                [x, inpaint_image * inpaint_mask, inpaint_mask, up], axis=-1
            ),
            timesteps,
            **kwargs,
        )


class SuperResText2ImUNet21(Text2ImUNet21):
    """Text-conditioned super-resolution variant
    (text2im_model2_1.py:106-129)."""

    def denoise(self, x, timesteps, xf_proj, xf_out, low_res=None):
        from .layers import resize_bilinear

        up = resize_bilinear(low_res, x.shape[1:3]).astype(x.dtype)
        return Text2ImUNet21.denoise(
            self, jnp.concatenate([x, up], axis=-1), timesteps, xf_proj, xf_out
        )

    def __call__(self, x, timesteps, full_emb=None, pooled_emb=None,
                 image_emb=None, low_res=None):
        xf_proj, xf_out = self.encode_conditioning(full_emb, pooled_emb, image_emb)
        return self.denoise(x, timesteps, xf_proj, xf_out, low_res)


class Text2ImUNet20(UNetModel):
    """Kandinsky 2.0 conditioned UNet (text2im_model.py:13-111): two text
    streams (mCLIP-XLMR 1024-d + mT5 512-d) concatenated as cross-attn KV;
    pooled projections of both summed into the timestep embedding."""

    model_dim: int = 768
    text_encoder_in_dim1: int = 1024
    text_encoder_in_dim2: int = 640
    pooling_type: str = "from_model"

    def setup(self):
        super().setup()
        self.to_model_dim = dense(self.model_dim, "to_model_dim", self.dtype)
        if self.pooling_type == "from_model":
            self.proj = dense(self.model_channels * 4, "proj", self.dtype)
        else:
            self.proj = AttentionPooling(
                8, self.text_encoder_in_dim2, self.model_channels * 4,
                dtype=self.dtype, name="proj",
            )
        self.proj2 = AttentionPooling(
            8, 512, self.model_channels * 4, dtype=self.dtype, name="proj2"
        )
        self.to_model_dim2 = dense(self.model_dim, "to_model_dim2", self.dtype)
        self.ln_model1 = LayerNormF32(name="ln_model1")
        self.ln_model2 = LayerNormF32(name="ln_model2")
        self.ln_model3 = LayerNormF32(name="ln_model3")

    def encode_conditioning(self, full_emb1, pooled_emb1, full_emb2, pooled_emb2):
        xf_proj = self.proj(
            pooled_emb1 if self.pooling_type == "from_model" else full_emb1
        )
        xf_proj = self.ln_model2(xf_proj)
        xf_proj = xf_proj + self.ln_model3(self.proj2(full_emb2))
        xf_out = self.ln_model1(
            jnp.concatenate(
                [self.to_model_dim(full_emb1), self.to_model_dim2(full_emb2)], axis=1
            )
        )
        return xf_proj, xf_out

    def denoise(self, x, timesteps, xf_proj, xf_out):
        emb = self.time_embedding(timesteps) + xf_proj.astype(jnp.float32)
        return self.run_torso(x, emb, xf_out)

    def __call__(
        self, x, timesteps, full_emb1=None, pooled_emb1=None, full_emb2=None,
        pooled_emb2=None,
    ):
        xf_proj, xf_out = self.encode_conditioning(
            full_emb1, pooled_emb1, full_emb2, pooled_emb2
        )
        return self.denoise(x, timesteps, xf_proj, xf_out)


class InpaintText2ImUNet20(Text2ImUNet20):
    """2.0 inpainting variant (text2im_model.py:114-137)."""

    def denoise(
        self, x, timesteps, xf_proj, xf_out, inpaint_image=None, inpaint_mask=None
    ):
        if inpaint_image is None:
            inpaint_image = jnp.zeros_like(x)
        if inpaint_mask is None:
            inpaint_mask = jnp.zeros_like(x[..., :1])
        x = jnp.concatenate([x, inpaint_image * inpaint_mask, inpaint_mask], axis=-1)
        return Text2ImUNet20.denoise(self, x, timesteps, xf_proj, xf_out)

    def __call__(
        self, x, timesteps, full_emb1=None, pooled_emb1=None, full_emb2=None,
        pooled_emb2=None, inpaint_image=None, inpaint_mask=None,
    ):
        xf_proj, xf_out = self.encode_conditioning(
            full_emb1, pooled_emb1, full_emb2, pooled_emb2
        )
        return self.denoise(
            x, timesteps, xf_proj, xf_out, inpaint_image, inpaint_mask
        )
