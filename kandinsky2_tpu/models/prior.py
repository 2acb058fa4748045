"""DALL·E-2-style diffusion prior, TPU-native (flax).

Reimplements the reference prior (kandinsky2/model/prior.py):

* ``PriorTransformer`` — 20-layer causal transformer over the sequence
  [77 CLIP text-encoder tokens, pooled text emb, timestep emb, noised image
  emb, learned prd token], predicting x0 = the CLIP image embedding from the
  last position (prior.py:159-270).
* ``prior_sample_fn`` — the guided sampling wrapper: CLIP-stat
  (de)normalization, classifier-free guidance, clamp(-10,10) denoised_fn
  (prior.py:336-384) — as a pure function over a scanned sampler loop, with
  the CFG batch-doubling inside the model closure (carry is batch B, not 2B).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..diffusion import (
    MeanType,
    Schedule,
    VarType,
    ddim_respaced_loop,
    p_sample_loop,
)
from .layers import LayerNormF32, dense, timestep_embedding

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (prior.py:106-127).  Attention uses the
    fused-qkv per-head [q|k|v] channel layout of prior.py:86-103."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        B, T, W = x.shape
        ch = W // self.heads
        h = LayerNormF32(name="ln_1")(x)
        qkv = dense(3 * W, "attn.c_qkv", self.dtype)(h)
        qkv = qkv.reshape(B, T, self.heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        logits = jnp.einsum(
            "bthc,bshc->bhts", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            logits = logits + mask[:, None, :, :].astype(jnp.float32)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, T, W)
        x = x + dense(W, "attn.c_proj", self.dtype)(a)
        h = LayerNormF32(name="ln_2")(x)
        h = dense(4 * W, "mlp.c_fc", self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + dense(W, "mlp.c_proj", self.dtype)(h)
        return x


class PriorTransformer(nn.Module):
    """prior.py:159-270.  ``__call__(x, timesteps, text_emb, text_enc, mask)``
    where x is the noised CLIP image embedding [B, clip_dim]."""

    text_ctx: int = 77
    xf_width: int = 2048
    xf_layers: int = 20
    xf_heads: int = 32
    xf_final_ln: bool = True
    clip_dim: int = 768
    clip_xf_width: int = 768
    dtype: Dtype = jnp.float32

    EXT_LEN = 4

    def setup(self):
        W = self.xf_width
        self.time_embed_0 = dense(W, "time_embed.0", self.dtype)
        self.time_embed_2 = dense(W, "time_embed.2", self.dtype)
        self.text_enc_proj = dense(W, "text_enc_proj", self.dtype)
        self.text_emb_proj = dense(W, "text_emb_proj", self.dtype)
        self.clip_img_proj = dense(W, "clip_img_proj", self.dtype)
        self.out_proj = dense(self.clip_dim, "out_proj", self.dtype)
        self.blocks = tuple(
            ResidualAttentionBlock(
                W, self.xf_heads, dtype=self.dtype, name=f"transformer.resblocks.{i}"
            )
            for i in range(self.xf_layers)
        )
        if self.xf_final_ln:
            self.final_ln = LayerNormF32(name="final_ln")
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (1, self.text_ctx + self.EXT_LEN, W),
            jnp.float32,
        )
        self.prd_emb = self.param(
            "prd_emb", nn.initializers.normal(stddev=0.01), (1, 1, W), jnp.float32
        )

    def causal_mask(self) -> jnp.ndarray:
        """[1, S, S] additive causal mask (prior.py:328-334)."""
        S = self.text_ctx + self.EXT_LEN
        return jnp.triu(jnp.full((1, S, S), -jnp.inf), k=1)

    def __call__(self, x, timesteps, text_emb, text_enc, mask):
        B = x.shape[0]
        dt = self.dtype
        x = x.astype(dt)
        # pad the token mask over the 4 appended positions (prior.py:239)
        mask = jnp.pad(
            mask.astype(bool), ((0, 0), (0, self.EXT_LEN)), constant_values=True
        )
        t_emb = self.time_embed_2(
            jax.nn.silu(
                self.time_embed_0(timestep_embedding(timesteps, self.xf_width))
            )
        )
        text_enc = self.text_enc_proj(text_enc.astype(dt))
        text_emb = self.text_emb_proj(text_emb.astype(dt))
        x_proj = self.clip_img_proj(x)
        seq = jnp.concatenate(
            [
                text_enc,
                text_emb[:, None, :],
                t_emb[:, None, :],
                x_proj[:, None, :],
                jnp.broadcast_to(
                    self.prd_emb.astype(dt), (B, 1, self.xf_width)
                ),
            ],
            axis=1,
        )
        seq = seq + self.positional_embedding.astype(dt)
        add_mask = jnp.where(mask, 0.0, -jnp.inf)[:, None, :] + self.causal_mask()
        h = seq
        for blk in self.blocks:
            h = blk(h, add_mask)
        if self.xf_final_ln:
            h = self.final_ln(h)
        return self.out_proj(h[:, -1]).astype(jnp.float32)


def prior_sample_fn(
    apply_fn,
    variables,
    sched: Schedule,
    txt_feat: jnp.ndarray,
    txt_feat_seq: jnp.ndarray,
    mask: jnp.ndarray,
    cf_guidance_scale: jnp.ndarray,
    clip_mean: jnp.ndarray,
    clip_std: jnp.ndarray,
    rng: jax.Array,
    *,
    use_ddim: bool = False,
    use_dpmpp: bool = False,
    noise_seq=None,
    x_T: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sample a CLIP image embedding from the prior (prior.py:336-384).

    ``txt_feat``/``txt_feat_seq``/``mask`` are the CFG-doubled batch
    [cond; uncond] of size 2B (prior.py:146-156 builds them that way).  The
    sampler carries only the first half; the model closure doubles x
    internally (prior.py:351-364 re-uses the first half for both).  Returns
    the de-normalized cond-half embedding [B, clip_dim].
    """
    bsz2 = txt_feat.shape[0]
    bsz = bsz2 // 2
    clip_dim = clip_mean.shape[-1]
    scales = jnp.broadcast_to(
        jnp.asarray(cf_guidance_scale, jnp.float32).reshape(-1), (bsz,)
    )[:, None]

    def model_fn(x, t_model):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_model, t_model], axis=0)
        out = apply_fn(
            variables, x2, t2, text_emb=txt_feat, text_enc=txt_feat_seq, mask=mask
        )
        eps = out[:, :clip_dim]
        cond_eps, uncond_eps = eps[:bsz], eps[bsz:]
        return uncond_eps + scales * (cond_eps - uncond_eps)

    if x_T is None:
        x_T = jax.random.normal(rng, (bsz, clip_dim), jnp.float32)
    denoised = lambda v: jnp.clip(v, -10.0, 10.0)
    if use_dpmpp:
        # beyond-reference: 2M solver on the x0-predicting prior — same
        # quality class at ~10 steps instead of 25
        from ..diffusion.samplers import (
            dpmpp_2m_loop,
            make_dpmpp_tables_from_respaced,
        )

        sample = dpmpp_2m_loop(
            model_fn,
            make_dpmpp_tables_from_respaced(sched),
            x_T,
            prediction="xstart",
            denoised_fn=denoised,
        )
        return sample * clip_std + clip_mean
    loop = ddim_respaced_loop if use_ddim else p_sample_loop
    sample = loop(
        model_fn,
        sched,
        x_T,
        jax.random.fold_in(rng, 1),
        mean_type=MeanType.START_X,
        var_type=VarType.FIXED_SMALL,
        clip_denoised=False,
        denoised_fn=denoised,
        noise_seq=noise_seq,
    )
    return sample * clip_std + clip_mean
