"""DPT monocular depth estimator (Ranftl et al., "Vision Transformers for
Dense Prediction") — TPU-native flax port of the HF-format checkpoints
(Intel/dpt-large et al.).

This is the real depth producer for the 2.2 ControlNet-depth task: the
reference notebook builds its ``hint`` by running a trained MiDaS/DPT model
host-side (/root/reference/notebooks/kandinsky2_2_controlnet.ipynb:
``MidasDetector`` -> ``make_hint``).  Here the estimator itself is a jitted
TPU program; ``kandinsky2_tpu.depth.make_hint`` consumes its output
unchanged (the heuristic stays as the weightless fallback).

Architecture (matches transformers' ``DPTForDepthEstimation`` with
``is_hybrid=False``, readout_type="project"):

* plain ViT backbone (pre-LN, exact GELU), patch conv /16, cls token,
  bilinearly resizable position embeddings;
* four taps = outputs of ``backbone_out_indices`` encoder layers
  (pre-final-layernorm);
* reassemble: cls-readout concat + Linear + GELU, 1x1 projection to
  ``neck_hidden_sizes``, then per-stage resize by ``reassemble_factors``
  (4, 2, 1, 0.5) — the x4/x2 upsamplers are stride==kernel transposed convs,
  expressed here as a single einsum+reshape (no overlap, so a fractionally
  strided conv is just a per-pixel matmul: MXU-friendly, no lhs_dilation);
* 3x3 bias-free convs to ``fusion_hidden_size``, then the RefineNet-style
  fusion ladder (pre-act residual units, x2 align-corners bilinear upsample);
* depth head: conv -> x2 upsample -> conv -> relu -> 1x1 -> relu.

Module names mirror the torch state_dict so ``weights/convert.py`` loads the
published checkpoints mechanically; the transposed-conv ``resize`` weights
keep their torch [in, out, k, k] layout as a plain leaf named ``weight``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNormF32, dense

Dtype = Any


def resize_bilinear_align_corners(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True (torch F.interpolate
    semantics used by the DPT fusion/head upsamplers; jax.image.resize only
    implements the half-pixel convention)."""
    B, H, W, C = x.shape
    if (H, W) == (oh, ow):
        return x
    yy = jnp.linspace(0.0, H - 1.0, oh) if oh > 1 else jnp.zeros((1,))
    xx = jnp.linspace(0.0, W - 1.0, ow) if ow > 1 else jnp.zeros((1,))
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (yy - y0)[None, :, None, None].astype(x.dtype)
    wx = (xx - x0)[None, None, :, None].astype(x.dtype)
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class _ViTLayer(nn.Module):
    """Pre-LN ViT encoder layer, HF DPT naming (dpt.encoder.layer.N.*)."""

    hidden: int
    heads: int
    intermediate: int
    eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNormF32(eps=self.eps, name="layernorm_before")(x)
        q = dense(self.hidden, "attention.attention.query", self.dtype)(h)
        k = dense(self.hidden, "attention.attention.key", self.dtype)(h)
        v = dense(self.hidden, "attention.attention.value", self.dtype)(h)
        B, T, W = q.shape
        ch = W // self.heads
        logits = jnp.einsum(
            "bthc,bshc->bhts",
            q.reshape(B, T, self.heads, ch),
            k.reshape(B, T, self.heads, ch),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(ch))
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum(
            "bhts,bshc->bthc", w, v.reshape(B, T, self.heads, ch)
        ).reshape(B, T, W)
        x = x + dense(self.hidden, "attention.output.dense", self.dtype)(att)
        h = LayerNormF32(eps=self.eps, name="layernorm_after")(x)
        h = dense(self.intermediate, "intermediate.dense", self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + dense(self.hidden, "output.dense", self.dtype)(h)


class _TransposeUpsample(nn.Module):
    """stride==kernel ConvTranspose2d as einsum+reshape.  The weight keeps
    the torch [in, out, k, k] layout (plain leaf, no conversion transform)."""

    channels: int
    factor: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.factor
        w = self.param(
            "weight", nn.initializers.lecun_normal(),
            (self.channels, self.channels, s, s), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.channels,),
                       jnp.float32)
        B, H, W, C = x.shape
        y = jnp.einsum(
            "bhwc,copq->bhpwqo", x.astype(self.dtype), w.astype(self.dtype)
        )
        return y.reshape(B, H * s, W * s, self.channels) + b.astype(self.dtype)


class _PreActResidual(nn.Module):
    """DPTPreActResidualLayer: relu->conv->relu->conv + skip."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="convolution1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="convolution2")(h)
        return x + h


class DPTDepth(nn.Module):
    """HF-layout DPT depth estimator (is_hybrid=False).

    Input: NHWC pixel values, already processor-normalized
    ((x/255 - 0.5)/0.5), H and W multiples of ``patch_size``.
    Output: [B, H, W] non-negative relative inverse depth (MiDaS
    convention: larger = nearer)."""

    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    patch_size: int = 16
    image_size: int = 384
    backbone_out_indices: Sequence[int] = (5, 11, 17, 23)
    neck_hidden_sizes: Sequence[int] = (256, 512, 1024, 1024)
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = pixel_values.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        # --- ViT backbone -------------------------------------------------
        x = nn.Conv(
            self.hidden, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32,
            name="dpt.embeddings.patch_embeddings.projection",
        )(pixel_values.astype(self.dtype))
        x = x.reshape(B, gh * gw, self.hidden)
        cls = self.param(
            "dpt.embeddings.cls_token", nn.initializers.zeros,
            (1, 1, self.hidden), jnp.float32,
        )
        grid0 = self.image_size // self.patch_size
        pos = self.param(
            "dpt.embeddings.position_embeddings", nn.initializers.zeros,
            (1, grid0 * grid0 + 1, self.hidden), jnp.float32,
        )
        if (gh, gw) != (grid0, grid0):
            # bilinear grid resize (HF _resize_pos_embed, half-pixel centers)
            grid = pos[:, 1:].reshape(1, grid0, grid0, self.hidden)
            grid = jax.image.resize(
                grid, (1, gh, gw, self.hidden), "bilinear"
            )
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, gh * gw, self.hidden)], axis=1
            )
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)).astype(self.dtype), x],
                            axis=1)
        x = x + pos.astype(self.dtype)

        taps = {}
        want = set(self.backbone_out_indices)
        for i in range(self.layers):
            x = _ViTLayer(
                self.hidden, self.heads, self.intermediate, eps=self.eps,
                dtype=self.dtype, name=f"dpt.encoder.layer.{i}",
            )(x)
            if i in want:
                taps[i] = x

        # --- reassemble + neck --------------------------------------------
        feats = []
        for i, idx in enumerate(self.backbone_out_indices):
            h = taps[idx]
            cls_tok, tokens = h[:, :1], h[:, 1:]
            readout = jnp.broadcast_to(cls_tok, tokens.shape)
            h = dense(
                self.hidden,
                f"neck.reassemble_stage.readout_projects.{i}.0",
                self.dtype,
            )(jnp.concatenate([tokens, readout], axis=-1))
            h = jax.nn.gelu(h, approximate=False)
            h = h.reshape(B, gh, gw, self.hidden)
            h = dense(
                self.neck_hidden_sizes[i],
                f"neck.reassemble_stage.layers.{i}.projection",
                self.dtype,
            )(h)
            factor = self.reassemble_factors[i]
            if factor > 1:
                h = _TransposeUpsample(
                    self.neck_hidden_sizes[i], int(factor), dtype=self.dtype,
                    name=f"neck.reassemble_stage.layers.{i}.resize",
                )(h)
            elif factor < 1:
                h = nn.Conv(
                    self.neck_hidden_sizes[i], (3, 3),
                    strides=(int(round(1 / factor)),) * 2,
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"neck.reassemble_stage.layers.{i}.resize",
                )(h)
            h = nn.Conv(
                self.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"neck.convs.{i}",
            )(h)
            feats.append(h)

        # --- fusion ladder (deepest first) ---------------------------------
        fused = None
        for j, h in enumerate(reversed(feats)):
            scope = f"neck.fusion_stage.layers.{j}"
            if fused is None:
                fused = h
            else:
                if fused.shape[1:3] != h.shape[1:3]:
                    h = jax.image.resize(
                        h, fused.shape[:3] + h.shape[3:], "bilinear"
                    )
                fused = fused + _PreActResidual(
                    self.fusion_hidden_size, dtype=self.dtype,
                    name=f"{scope}.residual_layer1",
                )(h)
            fused = _PreActResidual(
                self.fusion_hidden_size, dtype=self.dtype,
                name=f"{scope}.residual_layer2",
            )(fused)
            fused = resize_bilinear_align_corners(
                fused, fused.shape[1] * 2, fused.shape[2] * 2
            )
            fused = dense(
                self.fusion_hidden_size, f"{scope}.projection", self.dtype
            )(fused)

        # --- depth head -----------------------------------------------------
        h = nn.Conv(self.fusion_hidden_size // 2, (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="head.head.0")(fused)
        h = resize_bilinear_align_corners(h, h.shape[1] * 2, h.shape[2] * 2)
        h = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="head.head.2")(h)
        h = jax.nn.relu(h)
        h = dense(1, "head.head.4", self.dtype)(h)
        return jax.nn.relu(h)[..., 0]


def dpt_overrides(cfg: dict) -> dict:
    """HF DPTConfig dict (config.json) -> DPTDepth kwargs."""
    if cfg.get("is_hybrid"):
        raise ValueError(
            "hybrid DPT (BiT backbone) is not supported; use a pure-ViT "
            "DPT checkpoint (e.g. Intel/dpt-large)"
        )
    if cfg.get("readout_type", "project") != "project":
        raise ValueError("only readout_type='project' is supported")
    return dict(
        hidden=cfg["hidden_size"],
        layers=cfg["num_hidden_layers"],
        heads=cfg["num_attention_heads"],
        intermediate=cfg["intermediate_size"],
        patch_size=cfg["patch_size"],
        image_size=cfg["image_size"],
        backbone_out_indices=tuple(cfg["backbone_out_indices"]),
        neck_hidden_sizes=tuple(cfg["neck_hidden_sizes"]),
        reassemble_factors=tuple(cfg.get("reassemble_factors", (4, 2, 1, 0.5))),
        fusion_hidden_size=cfg["fusion_hidden_size"],
        eps=cfg.get("layer_norm_eps", 1e-12),
    )
