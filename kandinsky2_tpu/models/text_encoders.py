"""Text & image encoder towers, TPU-native (flax).

The reference leans on external packages for these (kandinsky2/model/
text_encoders.py wraps transformers' XLM-RoBERTa; kandinsky2_1_model.py:64-67
loads OpenAI ``clip`` ViT-L/14; kandinsky2_2_model.py:24 loads HF
CLIPVisionModelWithProjection).  Here each tower is a first-class jitted flax
module; host-side tokenizers stay in ``kandinsky2_tpu.tokenizers``.

Implemented:

* ``XLMRobertaEncoder``  — 24-layer post-LN BERT-style encoder
* ``MultilingualCLIP``   — XLM-R + masked-mean pooling + Linear head
                           (text_encoders.py:108-122)
* ``TextEncoder``        — facade mapping (tokens, mask) -> (full, pooled)
                           (text_encoders.py:125-167)
* ``CLIPTextTower``      — OpenAI CLIP text transformer (QuickGELU, causal),
                           as unrolled inline by kandinsky2_1_model.py:159-167
* ``CLIPViT``            — OpenAI CLIP vision tower (ViT-L/14 for 2.1)
* ``HFCLIPVision``       — HF-layout CLIP vision tower + projection
                           (ViT-bigG for 2.2)

Module names match the corresponding torch state_dicts (HF or OpenAI) so
weight conversion stays mechanical; OpenAI ``attn.in_proj_{weight,bias}`` is
handled with a rename rule (see ``weights/clip_rename``).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNormF32, dense

Dtype = Any

NEG_INF = jnp.finfo(jnp.float32).min


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def exact_gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _mha(q, k, v, heads, mask=None):
    """Standard multi-head attention, chunk-of-width head split, fp32 softmax.
    q/k/v: [B, T, W]; mask: additive [T, S] or [B, 1, T, S]."""
    B, T, W = q.shape
    ch = W // heads
    q = q.reshape(B, T, heads, ch)
    k = k.reshape(B, k.shape[1], heads, ch)
    v = v.reshape(B, v.shape[1], heads, ch)
    logits = jnp.einsum(
        "bthc,bshc->bhts", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(ch)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, T, W)


# ---------------------------------------------------------------------------
# XLM-RoBERTa (HF layout)
# ---------------------------------------------------------------------------


class _BertLayer(nn.Module):
    """Post-LN BERT/RoBERTa encoder layer (HF naming)."""

    hidden: int
    heads: int
    intermediate: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask):
        q = dense(self.hidden, "attention.self.query", self.dtype)(x)
        k = dense(self.hidden, "attention.self.key", self.dtype)(x)
        v = dense(self.hidden, "attention.self.value", self.dtype)(x)
        a = _mha(q, k, v, self.heads, attn_mask)
        a = dense(self.hidden, "attention.output.dense", self.dtype)(a)
        x = LayerNormF32(eps=self.eps, name="attention.output.LayerNorm")(x + a)
        h = dense(self.intermediate, "intermediate.dense", self.dtype)(x)
        h = exact_gelu(h)
        h = dense(self.hidden, "output.dense", self.dtype)(h)
        return LayerNormF32(eps=self.eps, name="output.LayerNorm")(x + h)


class XLMRobertaEncoder(nn.Module):
    """XLM-RoBERTa encoder returning last_hidden_state.

    Position ids follow RoBERTa's padding-aware scheme:
    cumsum(mask)*mask + padding_idx."""

    vocab_size: int = 250002
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    max_positions: int = 514
    type_vocab: int = 1
    pad_token_id: int = 1
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        mask = attention_mask.astype(jnp.int32)
        pos_ids = jnp.cumsum(mask, axis=1) * mask + self.pad_token_id
        emb = nn.Embed(
            self.vocab_size, self.hidden, param_dtype=jnp.float32,
            name="embeddings.word_embeddings",
        )(input_ids)
        emb = emb + nn.Embed(
            self.max_positions, self.hidden, param_dtype=jnp.float32,
            name="embeddings.position_embeddings",
        )(pos_ids)
        emb = emb + nn.Embed(
            self.type_vocab, self.hidden, param_dtype=jnp.float32,
            name="embeddings.token_type_embeddings",
        )(jnp.zeros_like(input_ids))
        h = LayerNormF32(eps=self.eps, name="embeddings.LayerNorm")(emb).astype(
            self.dtype
        )
        attn_mask = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
        for i in range(self.layers):
            h = _BertLayer(
                self.hidden, self.heads, self.intermediate, self.eps,
                dtype=self.dtype, name=f"encoder.layer.{i}",
            )(h, attn_mask)
        return h


class MultilingualCLIP(nn.Module):
    """XLM-R + Linear(masked-mean) head (text_encoders.py:108-122).
    Returns (pooled_projected, full_emb)."""

    out_features: int = 768
    vocab_size: int = 250002
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    max_positions: int = 514
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        embs = XLMRobertaEncoder(
            vocab_size=self.vocab_size, hidden=self.hidden, layers=self.layers,
            heads=self.heads, intermediate=self.intermediate,
            max_positions=self.max_positions, dtype=self.dtype,
            name="transformer",
        )(input_ids, attention_mask)
        m = attention_mask.astype(embs.dtype)[:, :, None]
        pooled = (embs * m).sum(axis=1) / m.sum(axis=1)
        return dense(self.out_features, "LinearTransformation", self.dtype)(
            pooled
        ), embs


class BertEncoder(nn.Module):
    """HF ``BertModel`` layout: absolute position embeddings from 0, token
    type 0, the same encoder stack as XLM-R, plus the tanh pooler over [CLS]
    (reference text_encoders.py:134-137 / forward :156-158)."""

    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        T = input_ids.shape[1]
        emb = nn.Embed(
            self.vocab_size, self.hidden, param_dtype=jnp.float32,
            name="embeddings.word_embeddings",
        )(input_ids)
        emb = emb + nn.Embed(
            self.max_positions, self.hidden, param_dtype=jnp.float32,
            name="embeddings.position_embeddings",
        )(jnp.broadcast_to(jnp.arange(T), input_ids.shape))
        emb = emb + nn.Embed(
            self.type_vocab, self.hidden, param_dtype=jnp.float32,
            name="embeddings.token_type_embeddings",
        )(jnp.zeros_like(input_ids))
        h = LayerNormF32(eps=self.eps, name="embeddings.LayerNorm")(emb).astype(
            self.dtype
        )
        attn_mask = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
        for i in range(self.layers):
            h = _BertLayer(
                self.hidden, self.heads, self.intermediate, self.eps,
                dtype=self.dtype, name=f"encoder.layer.{i}",
            )(h, attn_mask)
        pooled = jnp.tanh(
            dense(self.hidden, "pooler.dense", self.dtype)(h[:, 0])
        )
        return h, pooled


class TextEncoder(nn.Module):
    """Facade over the text-encoder backends (text_encoders.py:125-167):
    'multiclip' (the shipped 2.0/2.1 path), 'clip' (ImagenCLIP = the OpenAI
    CLIP text tower, :61-106), 'T5EncoderModel'/'MT5EncoderModel'
    (models/t5.py), 'BertModel', and 'xlm_roberta'.  All return the
    reference's ``(full_out, pooled_out)`` contract (pooled is None for the
    pooling-free backends).

    Dim fields are interpreted per backend: ``in_features`` is the tower
    width, ``out_features`` the projection/embed dim, ``max_positions`` the
    context length for 'clip'."""

    model_name: str = "multiclip"
    in_features: int = 1024
    out_features: int = 768
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    vocab_size: int = 250002
    max_positions: int = 514
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask=None):
        if self.model_name == "multiclip":
            pooled, full = MultilingualCLIP(
                out_features=self.out_features, vocab_size=self.vocab_size,
                hidden=self.in_features, layers=self.layers, heads=self.heads,
                intermediate=self.intermediate,
                max_positions=self.max_positions, dtype=self.dtype, name="model",
            )(tokens, mask)
            return full, pooled
        if self.model_name == "clip":
            full, pooled = CLIPTextTower(
                vocab_size=self.vocab_size, context_length=self.max_positions,
                width=self.in_features, layers=self.layers, heads=self.heads,
                embed_dim=self.out_features, dtype=self.dtype, name="model",
            )(tokens)
            return full, pooled
        if self.model_name in ("T5EncoderModel", "MT5EncoderModel"):
            from .t5 import T5Encoder

            full = T5Encoder(
                vocab_size=self.vocab_size, d_model=self.in_features,
                d_kv=self.in_features // self.heads, d_ff=self.intermediate,
                num_layers=self.layers, num_heads=self.heads,
                dtype=self.dtype, name="model",
            )(tokens, mask)
            return full, None
        if self.model_name == "BertModel":
            full, pooled = BertEncoder(
                vocab_size=self.vocab_size, hidden=self.in_features,
                layers=self.layers, heads=self.heads,
                intermediate=self.intermediate,
                max_positions=self.max_positions, dtype=self.dtype,
                name="model",
            )(tokens, mask)
            return full, pooled
        if self.model_name == "xlm_roberta":
            full = XLMRobertaEncoder(
                vocab_size=self.vocab_size, hidden=self.in_features,
                layers=self.layers, heads=self.heads,
                intermediate=self.intermediate,
                max_positions=self.max_positions, dtype=self.dtype,
                name="model",
            )(tokens, mask)
            return full.astype(jnp.float32), None
        raise NotImplementedError(self.model_name)


# ---------------------------------------------------------------------------
# OpenAI CLIP (2.1: ViT-L/14 text + visual)
# ---------------------------------------------------------------------------


class CLIPResBlock(nn.Module):
    """OpenAI CLIP ResidualAttentionBlock: pre-LN, torch nn.MultiheadAttention
    fused in_proj ([q;k;v] chunks of width), QuickGELU MLP."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = LayerNormF32(name="ln_1")(x)
        qkv = dense(3 * self.width, "attn.in_proj", self.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _mha(q, k, v, self.heads, mask)
        x = x + dense(self.width, "attn.out_proj", self.dtype)(a)
        h = LayerNormF32(name="ln_2")(x)
        h = dense(4 * self.width, "mlp.c_fc", self.dtype)(h)
        h = quick_gelu(h)
        x = x + dense(self.width, "mlp.c_proj", self.dtype)(h)
        return x


class CLIPTextTower(nn.Module):
    """OpenAI CLIP text transformer with EOT pooling & projection, exactly the
    inline unroll of kandinsky2_1_model.py:159-167.  Returns
    (txt_feat_seq [B,77,W], txt_feat [B,embed_dim])."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        x = nn.Embed(
            self.vocab_size, self.width, param_dtype=jnp.float32,
            name="token_embedding",
        )(tokens).astype(self.dtype)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        causal = jnp.triu(
            jnp.full((self.context_length, self.context_length), NEG_INF), k=1
        )
        for i in range(self.layers):
            x = CLIPResBlock(
                self.width, self.heads, dtype=self.dtype,
                name=f"transformer.resblocks.{i}",
            )(x, causal)
        x = LayerNormF32(name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(0.01),
            (self.width, self.embed_dim), jnp.float32,
        )
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot].astype(jnp.float32) @ proj
        return x.astype(jnp.float32), pooled


class CLIPViT(nn.Module):
    """OpenAI CLIP vision tower (``clip_model.encode_image``,
    kandinsky2_1_model.py:177-181).  NHWC input, already CLIP-normalized."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B = images.shape[0]
        x = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv1",
        )(images.astype(self.dtype))
        x = x.reshape(B, -1, self.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.01), (self.width,),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            ((self.image_size // self.patch_size) ** 2 + 1, self.width),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = LayerNormF32(name="ln_pre")(x)
        for i in range(self.layers):
            x = CLIPResBlock(
                self.width, self.heads, dtype=self.dtype,
                name=f"transformer.resblocks.{i}",
            )(x)
        x = LayerNormF32(name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.01), (self.width, self.embed_dim),
            jnp.float32,
        )
        return x.astype(jnp.float32) @ proj


# ---------------------------------------------------------------------------
# HF CLIP vision tower (2.2: ViT-bigG-14 + projection)
# ---------------------------------------------------------------------------


class _HFCLIPLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    act: Callable = exact_gelu
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNormF32(eps=self.eps, name="layer_norm1")(x)
        q = dense(self.hidden, "self_attn.q_proj", self.dtype)(h)
        k = dense(self.hidden, "self_attn.k_proj", self.dtype)(h)
        v = dense(self.hidden, "self_attn.v_proj", self.dtype)(h)
        a = _mha(q, k, v, self.heads)
        x = x + dense(self.hidden, "self_attn.out_proj", self.dtype)(a)
        h = LayerNormF32(eps=self.eps, name="layer_norm2")(x)
        h = dense(self.intermediate, "mlp.fc1", self.dtype)(h)
        h = self.act(h)
        x = x + dense(self.hidden, "mlp.fc2", self.dtype)(h)
        return x


class HFCLIPVision(nn.Module):
    """HF ``CLIPVisionModelWithProjection`` layout (kandinsky2_2_model.py:24).
    Defaults = ViT-bigG-14 (laion2B), projection_dim 1280.  Returns the
    projected image embedding [B, projection_dim]."""

    image_size: int = 224
    patch_size: int = 14
    hidden: int = 1664
    layers: int = 48
    heads: int = 16
    intermediate: int = 8192
    projection_dim: int = 1280
    act: Callable = exact_gelu
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        B = images.shape[0]
        x = nn.Conv(
            self.hidden, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="vision_model.embeddings.patch_embedding",
        )(images.astype(self.dtype))
        x = x.reshape(B, -1, self.hidden)
        cls = self.param(
            "vision_model.embeddings.class_embedding",
            nn.initializers.normal(0.01), (self.hidden,), jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.hidden)), x],
            axis=1,
        )
        n_pos = (self.image_size // self.patch_size) ** 2 + 1
        pos = nn.Embed(
            n_pos, self.hidden, param_dtype=jnp.float32,
            name="vision_model.embeddings.position_embedding",
        )(jnp.arange(n_pos))
        x = x + pos.astype(x.dtype)[None]
        x = LayerNormF32(eps=self.eps, name="vision_model.pre_layrnorm")(x)
        for i in range(self.layers):
            x = _HFCLIPLayer(
                self.hidden, self.heads, self.intermediate, self.act, self.eps,
                dtype=self.dtype, name=f"vision_model.encoder.layers.{i}",
            )(x)
        pooled = LayerNormF32(eps=self.eps, name="vision_model.post_layernorm")(
            x[:, 0]
        )
        return dense(
            self.projection_dim, "visual_projection", jnp.float32, use_bias=False
        )(pooled.astype(jnp.float32))


def clip_rename(torch_key: str) -> str:
    """Rename rule for OpenAI CLIP fused attention params:
    flax 'attn.in_proj.{kernel,bias}' <- torch 'attn.in_proj_{weight,bias}'."""
    return torch_key.replace("attn.in_proj.weight", "attn.in_proj_weight").replace(
        "attn.in_proj.bias", "attn.in_proj_bias"
    )
