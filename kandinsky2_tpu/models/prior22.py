"""Kandinsky 2.2 diffusion prior (diffusers ``PriorTransformer`` layout) and
the HF CLIP text tower with projection it is conditioned on.

The reference's 2.2 prior lives in diffusers' KandinskyV22PriorPipeline
(kandinsky2/kandinsky2_2_model.py:27-40); architecture: a 20-layer,
2048-wide full-attention transformer over the sequence
[77 CLIP-bigG text-encoder tokens, pooled text emb, timestep emb, noised
image emb, learned prd token], predicting the (normalized) 1280-d image
embedding as ``sample``.  clip_mean/clip_std buffers live in the checkpoint.

Names follow the diffusers state_dict (transformer_blocks.{i}.{norm1,
attn1.to_q/k/v,attn1.to_out.0,norm3,ff.net.0.proj,ff.net.2}).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNormF32, dense
from .text_encoders import NEG_INF, _mha, quick_gelu
from .unet22 import timestep_embedding_22

Dtype = Any


class BasicSelfBlock(nn.Module):
    """diffusers BasicTransformerBlock (self-attention only, pre-LN,
    gelu FF)."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = LayerNormF32(name="norm1")(x)
        q = dense(self.width, "attn1.to_q", self.dtype, use_bias=True)(h)
        k = dense(self.width, "attn1.to_k", self.dtype, use_bias=True)(h)
        v = dense(self.width, "attn1.to_v", self.dtype, use_bias=True)(h)
        a = _mha(q, k, v, self.heads, mask)
        x = x + dense(self.width, "attn1.to_out.0", self.dtype)(a)
        h = LayerNormF32(name="norm3")(x)
        h = dense(4 * self.width, "ff.net.0.proj", self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + dense(self.width, "ff.net.2", self.dtype)(h)
        return x


class PriorTransformer22(nn.Module):
    """diffusers PriorTransformer (kandinsky-2-2-prior config):
    32 heads x 64, 20 layers, embedding_dim 1280, 77 text embeddings."""

    num_attention_heads: int = 32
    attention_head_dim: int = 64
    num_layers: int = 20
    embedding_dim: int = 1280
    num_embeddings: int = 77
    additional_embeddings: int = 4
    # sequence layout: names in concatenation order. "text" is the 77-token
    # encoder-states block; the rest are single positions.  Kept as data (not
    # code) so a layout mismatch vs the real checkpoint is a config fix —
    # see weights/configs22.py and tests/test_configs22.py.
    embedding_order: tuple = ("text", "proj", "time", "x", "prd")
    dtype: Dtype = jnp.float32

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    def setup(self):
        W = self.inner_dim
        self.time_embedding_1 = dense(W, "time_embedding.linear_1", self.dtype)
        self.time_embedding_2 = dense(W, "time_embedding.linear_2", self.dtype)
        self.proj_in = dense(W, "proj_in", self.dtype)
        self.embedding_proj = dense(W, "embedding_proj", self.dtype)
        self.encoder_hidden_states_proj = dense(
            W, "encoder_hidden_states_proj", self.dtype
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.zeros,
            (1, self.num_embeddings + self.additional_embeddings, W),
            jnp.float32,
        )
        self.prd_embedding = self.param(
            "prd_embedding", nn.initializers.zeros, (1, 1, W), jnp.float32
        )
        self.blocks = tuple(
            BasicSelfBlock(
                W, self.num_attention_heads, dtype=self.dtype,
                name=f"transformer_blocks.{i}",
            )
            for i in range(self.num_layers)
        )
        self.norm_out = LayerNormF32(name="norm_out")
        self.proj_to_clip_embeddings = dense(
            self.embedding_dim, "proj_to_clip_embeddings", self.dtype
        )
        # normalization stats stored in the checkpoint (buffers)
        self.clip_mean = self.param(
            "clip_mean", nn.initializers.zeros, (1, self.embedding_dim),
            jnp.float32,
        )
        self.clip_std = self.param(
            "clip_std", nn.initializers.ones, (1, self.embedding_dim),
            jnp.float32,
        )

    def __call__(self, x, timesteps, proj_embedding, encoder_hidden_states, mask):
        """x: noised (normalized) image emb [B, D]; proj_embedding: pooled
        text emb [B, D]; encoder_hidden_states: [B, 77, D_text]; mask [B, 77]."""
        B = x.shape[0]
        dt = self.dtype
        t_emb = self.time_embedding_2(
            jax.nn.silu(
                self.time_embedding_1(
                    timestep_embedding_22(timesteps, self.inner_dim).astype(dt)
                )
            )
        )
        proj = self.embedding_proj(proj_embedding.astype(dt))
        enc = self.encoder_hidden_states_proj(encoder_hidden_states.astype(dt))
        hx = self.proj_in(x.astype(dt))
        prd = jnp.broadcast_to(
            self.prd_embedding.astype(dt), (B, 1, self.inner_dim)
        )
        pieces = {
            "text": enc,
            "proj": proj[:, None],
            "time": t_emb[:, None],
            "x": hx[:, None],
            "prd": prd,
        }
        ones = jnp.ones((B, 1), bool)
        mask_pieces = {
            k: (mask.astype(bool) if k == "text" else ones) for k in pieces
        }
        seq = jnp.concatenate([pieces[k] for k in self.embedding_order], axis=1)
        seq = seq + self.positional_embedding.astype(dt)
        mask = jnp.concatenate(
            [mask_pieces[k] for k in self.embedding_order], axis=1
        )
        add_mask = jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
        h = seq
        for blk in self.blocks:
            h = blk(h, add_mask)
        h = self.norm_out(h)
        # the prediction is read at the prd token's position
        prd_end = sum(
            (self.num_embeddings if k == "text" else 1)
            for k in self.embedding_order[
                : self.embedding_order.index("prd") + 1
            ]
        )
        return self.proj_to_clip_embeddings(h[:, prd_end - 1]).astype(
            jnp.float32
        )

    def post_process(self, latents):
        return latents * self.clip_std + self.clip_mean


class HFCLIPText(nn.Module):
    """HF ``CLIPTextModelWithProjection`` layout (the 2.2 prior's text
    encoder; bigG defaults: width 1280, 32 layers, 20 heads, gelu).
    Returns (last_hidden_state, projected EOT embedding)."""

    vocab_size: int = 49408
    context_length: int = 77
    hidden: int = 1280
    layers: int = 32
    heads: int = 20
    intermediate: int = 5120
    projection_dim: int = 1280
    act: str = "gelu"
    eps: float = 1e-5
    eot_token_id: int = 49407
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        x = nn.Embed(
            self.vocab_size, self.hidden, param_dtype=jnp.float32,
            name="text_model.embeddings.token_embedding",
        )(tokens).astype(self.dtype)
        pos = nn.Embed(
            self.context_length, self.hidden, param_dtype=jnp.float32,
            name="text_model.embeddings.position_embedding",
        )(jnp.arange(tokens.shape[1]))
        x = x + pos.astype(x.dtype)[None]
        causal = jnp.triu(
            jnp.full((tokens.shape[1], tokens.shape[1]), NEG_INF), k=1
        )
        act = quick_gelu if self.act == "quick_gelu" else (
            lambda v: jax.nn.gelu(v, approximate=False)
        )
        for i in range(self.layers):
            name = f"text_model.encoder.layers.{i}"
            h = LayerNormF32(eps=self.eps, name=f"{name}.layer_norm1")(x)
            q = dense(self.hidden, f"{name}.self_attn.q_proj", self.dtype)(h)
            k = dense(self.hidden, f"{name}.self_attn.k_proj", self.dtype)(h)
            v = dense(self.hidden, f"{name}.self_attn.v_proj", self.dtype)(h)
            a = _mha(q, k, v, self.heads, causal)
            x = x + dense(self.hidden, f"{name}.self_attn.out_proj", self.dtype)(a)
            h = LayerNormF32(eps=self.eps, name=f"{name}.layer_norm2")(x)
            h = dense(self.intermediate, f"{name}.mlp.fc1", self.dtype)(h)
            h = act(h)
            x = x + dense(self.hidden, f"{name}.mlp.fc2", self.dtype)(h)
        x = LayerNormF32(eps=self.eps, name="text_model.final_layer_norm")(x)
        # HF pools at the eot token (highest id) position
        eot = jnp.argmax((tokens == self.eot_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = dense(
            self.projection_dim, "text_projection", jnp.float32, use_bias=False
        )(pooled.astype(jnp.float32))
        return x.astype(jnp.float32), proj
