"""T5/MT5 encoder tower (HF layout), TPU-native (flax).

The 2.0 pipeline's second text stream is an MT5 encoder
(kandinsky2/model/text_encoders.py:134-135, 152-155; configs.py:59 —
full_emb2 is 512-d => mT5-small).  Faithful T5 semantics: RMSNorm, unscaled
attention with a shared relative-position bias from block 0, gated-GELU FF,
no biases anywhere.  Module names match the HF state_dict
(shared / encoder.block.{i}.layer.{0,1}.* / encoder.final_layer_norm).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import dense

Dtype = Any


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        y = x.astype(jnp.float32)
        y = y * jax.lax.rsqrt(jnp.mean(y * y, axis=-1, keepdims=True) + self.eps)
        return (y * scale).astype(x.dtype)


def relative_position_bucket(
    rel: jnp.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> jnp.ndarray:
    """Bidirectional T5 bucket function."""
    num_buckets //= 2
    ret = (rel > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Encoder(nn.Module):
    """Returns last_hidden_state [B, T, d_model]."""

    vocab_size: int = 250112
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 8
    num_heads: int = 6
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        T = input_ids.shape[1]
        inner = self.num_heads * self.d_kv
        x = nn.Embed(
            self.vocab_size, self.d_model, param_dtype=jnp.float32, name="shared"
        )(input_ids).astype(self.dtype)

        pos = jnp.arange(T)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel, self.rel_buckets, self.rel_max_distance
        )
        bias_table = nn.Embed(
            self.rel_buckets, self.num_heads, param_dtype=jnp.float32,
            name="encoder.block.0.layer.0.SelfAttention.relative_attention_bias",
        )(buckets)  # [T, T, H]
        pos_bias = bias_table.transpose(2, 0, 1)[None]  # [1, H, T, T]
        key_mask = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
        pos_bias = pos_bias + key_mask * jnp.finfo(jnp.float32).min

        for i in range(self.num_layers):
            blk = f"encoder.block.{i}"
            h = RMSNorm(self.eps, name=f"{blk}.layer.0.layer_norm")(x)
            q = dense(inner, f"{blk}.layer.0.SelfAttention.q", self.dtype,
                      use_bias=False)(h)
            k = dense(inner, f"{blk}.layer.0.SelfAttention.k", self.dtype,
                      use_bias=False)(h)
            v = dense(inner, f"{blk}.layer.0.SelfAttention.v", self.dtype,
                      use_bias=False)(h)
            B = q.shape[0]
            q = q.reshape(B, T, self.num_heads, self.d_kv)
            k = k.reshape(B, T, self.num_heads, self.d_kv)
            v = v.reshape(B, T, self.num_heads, self.d_kv)
            # T5 attention is UNscaled; bias is additive
            logits = jnp.einsum(
                "bthc,bshc->bhts", q, k, preferred_element_type=jnp.float32
            ) + pos_bias
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
            a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, T, inner)
            x = x + dense(self.d_model, f"{blk}.layer.0.SelfAttention.o",
                          self.dtype, use_bias=False)(a)
            h = RMSNorm(self.eps, name=f"{blk}.layer.1.layer_norm")(x)
            g = dense(self.d_ff, f"{blk}.layer.1.DenseReluDense.wi_0",
                      self.dtype, use_bias=False)(h)
            u = dense(self.d_ff, f"{blk}.layer.1.DenseReluDense.wi_1",
                      self.dtype, use_bias=False)(h)
            h = jax.nn.gelu(g, approximate=True) * u
            x = x + dense(self.d_model, f"{blk}.layer.1.DenseReluDense.wo",
                          self.dtype, use_bias=False)(h)
        return RMSNorm(self.eps, name="encoder.final_layer_norm")(x)
