"""Parity: text/image encoder towers vs transformers (XLM-R, HF CLIP vision)
and vs torch's own nn.MultiheadAttention for the OpenAI CLIP block layout."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.models.text_encoders import (
    CLIPTextTower,
    HFCLIPVision,
    TextEncoder,
    clip_rename,
)
from kandinsky2_tpu.weights.convert import convert_state_dict


def test_xlm_roberta_multiclip():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = XLMRobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=40,
        type_vocab_size=1, pad_token_id=1,
    )
    torch.manual_seed(0)
    ref = XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    head = torch.nn.Linear(32, 24)

    ours = TextEncoder(
        model_name="multiclip", in_features=32, out_features=24, layers=2,
        heads=4, intermediate=64, vocab_size=100, max_positions=40,
    )
    rng = np.random.RandomState(0)
    tokens = rng.randint(2, 100, size=(2, 9))
    tokens[1, 6:] = 1
    mask = (tokens != 1).astype(np.int32)

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(mask)
    )["params"]
    sd = {f"model.transformer.{k}": v for k, v in ref.state_dict().items()}
    sd["model.LinearTransformation.weight"] = head.weight
    sd["model.LinearTransformation.bias"] = head.bias
    params = convert_state_dict(sd, params)

    with torch.no_grad():
        embs = ref(
            input_ids=torch.tensor(tokens), attention_mask=torch.tensor(mask)
        )[0]
        m = torch.tensor(mask).unsqueeze(2).float()
        pooled_ref = head((embs * m).sum(1) / m.sum(1))
    full_j, pooled_j = ours.apply(
        {"params": params}, jnp.asarray(tokens), jnp.asarray(mask)
    )
    np.testing.assert_allclose(embs.numpy(), np.asarray(full_j), atol=3e-4)
    np.testing.assert_allclose(pooled_ref.numpy(), np.asarray(pooled_j), atol=3e-4)


class _TorchCLIPText(torch.nn.Module):
    """Independent torch oracle for the OpenAI CLIP text tower layout, built
    on torch's own nn.MultiheadAttention."""

    def __init__(self, vocab=50, ctx=10, width=32, layers=2, heads=4, edim=16):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(torch.randn(ctx, width) * 0.1)
        self.blocks = torch.nn.ModuleList()
        for _ in range(layers):
            blk = torch.nn.Module()
            blk.ln_1 = torch.nn.LayerNorm(width)
            blk.attn = torch.nn.MultiheadAttention(width, heads, batch_first=True)
            blk.ln_2 = torch.nn.LayerNorm(width)
            blk.mlp = torch.nn.Sequential()
            blk.mlp.add_module("c_fc", torch.nn.Linear(width, 4 * width))
            blk.mlp.add_module("c_proj", torch.nn.Linear(4 * width, width))
            self.blocks.append(blk)
        self.ln_final = torch.nn.LayerNorm(width)
        self.text_projection = torch.nn.Parameter(torch.randn(width, edim) * 0.1)
        self.ctx = ctx

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        causal = torch.triu(
            torch.full((self.ctx, self.ctx), float("-inf")), 1
        )
        for blk in self.blocks:
            h = blk.ln_1(x)
            a, _ = blk.attn(h, h, h, attn_mask=causal, need_weights=False)
            x = x + a
            h = blk.mlp.c_fc(blk.ln_2(x))
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            x = x + blk.mlp.c_proj(h)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(-1)] @ self.text_projection
        return x, pooled


def test_clip_text_tower():
    torch.manual_seed(1)
    ref = _TorchCLIPText().eval()
    ours = CLIPTextTower(
        vocab_size=50, context_length=10, width=32, layers=2, heads=4,
        embed_dim=16,
    )
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, 49, size=(2, 10))
    tokens[:, -1] = 49  # eot = argmax
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(tokens))["params"]
    sd = {
        k.replace("blocks.", "transformer.resblocks."): v
        for k, v in ref.state_dict().items()
    }
    params = convert_state_dict(sd, params, rename=clip_rename)
    with torch.no_grad():
        full_t, pooled_t = ref(torch.tensor(tokens))
    full_j, pooled_j = ours.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(full_t.numpy(), np.asarray(full_j), atol=3e-4)
    np.testing.assert_allclose(pooled_t.numpy(), np.asarray(pooled_j), atol=3e-4)


def test_hf_clip_vision():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=16, hidden_act="gelu",
    )
    torch.manual_seed(2)
    ref = CLIPVisionModelWithProjection(cfg).eval()
    ours = HFCLIPVision(
        image_size=28, patch_size=14, hidden=32, layers=2, heads=4,
        intermediate=64, projection_dim=16,
    )
    rng = np.random.RandomState(2)
    img = rng.randn(2, 28, 28, 3).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    params = convert_state_dict(dict(ref.state_dict()), params)
    with torch.no_grad():
        theirs = ref(torch.tensor(np.transpose(img, (0, 3, 1, 2)))).image_embeds
    got = ours.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(theirs.numpy(), np.asarray(got), atol=3e-4)


def test_attention_pooling_parity():
    """AttentionPooling vs the reference (text_encoders.py:24-58) — the 2.0
    'attention_pooling' pooling_type path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_loader import ref_model

    refte = ref_model("text_encoders")
    torch.manual_seed(4)
    ref = refte.AttentionPooling(4, 32, 24).eval()

    from kandinsky2_tpu.models.layers import AttentionPooling

    ours = AttentionPooling(heads=4, in_dim=32, out_dim=24)
    rng = np.random.RandomState(4)
    x = rng.randn(2, 7, 32).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = convert_state_dict(dict(ref.state_dict()), params)
    with torch.no_grad():
        theirs = ref(torch.tensor(x)).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(theirs, np.asarray(got), atol=2e-5)


def test_bert_backend_parity():
    """TextEncoder('BertModel') vs transformers BertModel incl. tanh pooler
    (reference text_encoders.py:134-137, :156-158)."""
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=80, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    ref = BertModel(cfg).eval()

    ours = TextEncoder(
        model_name="BertModel", in_features=32, layers=2, heads=4,
        intermediate=64, vocab_size=80, max_positions=40,
    )
    rng = np.random.RandomState(1)
    tokens = rng.randint(3, 80, size=(2, 11))
    tokens[1, 7:] = 0
    mask = (tokens != 0).astype(np.int32)

    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(mask)
    )["params"]
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd, params)

    with torch.no_grad():
        out = ref(input_ids=torch.tensor(tokens), attention_mask=torch.tensor(mask))
    full_j, pooled_j = ours.apply(
        {"params": params}, jnp.asarray(tokens), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        out.last_hidden_state.numpy(), np.asarray(full_j), atol=3e-4
    )
    np.testing.assert_allclose(
        out.pooler_output.numpy(), np.asarray(pooled_j), atol=3e-4
    )


def test_facade_backend_routing():
    """Every reference facade backend (text_encoders.py:125-147) initializes
    and returns the (full, pooled) contract through TextEncoder."""
    tokens = jnp.asarray(np.random.RandomState(2).randint(2, 50, size=(1, 8)))
    mask = jnp.ones_like(tokens)

    for name, kw, pooled_none in [
        ("clip", dict(in_features=32, out_features=24, max_positions=8), False),
        ("T5EncoderModel", dict(in_features=32, intermediate=64), True),
        ("MT5EncoderModel", dict(in_features=32, intermediate=64), True),
        ("xlm_roberta", dict(in_features=32, intermediate=64, max_positions=40), True),
    ]:
        enc = TextEncoder(
            model_name=name, layers=2, heads=4, vocab_size=50, **kw
        )
        params = enc.init(jax.random.PRNGKey(0), tokens, mask)["params"]
        full, pooled = enc.apply({"params": params}, tokens, mask)
        assert full.shape[0] == 1 and full.ndim == 3, name
        assert (pooled is None) == pooled_none, name
        assert full.dtype == jnp.float32, name
