"""Parity: diffusion prior vs the torch reference (kandinsky2/model/prior.py)
— transformer forward and the full guided DDIM sampling loop."""

import types

import numpy as np
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.diffusion import make_schedule
from kandinsky2_tpu.models.prior import PriorTransformer, prior_sample_fn
from kandinsky2_tpu.weights.convert import convert_state_dict, unused_torch_keys

from ref_loader import ref_model

refprior = ref_model("prior")

HP = dict(
    text_ctx=8, xf_width=64, xf_layers=2, xf_heads=4, xf_final_ln=True,
    clip_dim=16, clip_xf_width=12,
)


def build_pair():
    torch.manual_seed(0)
    ref = refprior.PriorTransformer(xf_padding=False, **HP).eval()
    ours = PriorTransformer(
        **{k: v for k, v in HP.items() if k != "xf_padding"}
    )
    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 16).astype(np.float32)
    t = np.array([5.0, 900.0], dtype=np.float32)
    text_emb = rng.randn(B, 16).astype(np.float32)
    text_enc = rng.randn(B, 8, 12).astype(np.float32)
    mask = np.ones((B, 8), dtype=bool)
    mask[1, 5:] = False
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(text_emb), jnp.asarray(text_enc), jnp.asarray(mask),
    )["params"]
    sd = dict(ref.state_dict())
    params = convert_state_dict(sd, params)
    assert not unused_torch_keys(sd, params)
    return ref, ours, {"params": params}, (x, t, text_emb, text_enc, mask)


def test_prior_transformer_forward():
    ref, ours, variables, (x, t, text_emb, text_enc, mask) = build_pair()
    causal = torch.triu(torch.full((1, 12, 12), float("-inf")), 1)
    with torch.no_grad():
        theirs = ref(
            torch.tensor(x), torch.tensor(t),
            text_emb=torch.tensor(text_emb), text_enc=torch.tensor(text_enc),
            mask=torch.tensor(mask), causal_mask=causal,
        ).numpy()
    got = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(text_emb),
        jnp.asarray(text_enc), jnp.asarray(mask),
    )
    np.testing.assert_allclose(theirs, np.asarray(got), atol=2e-4)


def test_prior_guided_sampling(monkeypatch):
    """Full guided DDIM sampling vs reference PriorDiffusionModel.forward
    (prior.py:336-384), deterministic via injected initial noise."""
    ref_t, ours, variables, _ = build_pair()

    class StubTok:
        def padded_tokens_and_mask(self, texts, ctx):
            return torch.zeros(len(texts), ctx, dtype=torch.int), torch.ones(
                len(texts), ctx, dtype=torch.bool
            )

    cfg = types.SimpleNamespace(
        model=types.SimpleNamespace(
            hparams=types.SimpleNamespace(xf_padding=False, **HP)
        ),
        diffusion=types.SimpleNamespace(
            steps=100, learn_sigma=False, sigma_small=True,
            noise_schedule="cosine", use_kl=False, predict_xstart=True,
            rescale_learned_sigmas=False, timestep_respacing="",
        ),
    )
    rng = np.random.RandomState(1)
    clip_mean = torch.tensor(rng.randn(16).astype(np.float32))
    clip_std = torch.tensor((rng.rand(16).astype(np.float32) + 0.5))
    torch.manual_seed(0)
    ref_model_full = refprior.PriorDiffusionModel(cfg, StubTok(), clip_mean, clip_std)
    ref_model_full.model.load_state_dict(ref_t.state_dict())
    ref_model_full.eval()

    B = 1
    txt_feat = rng.randn(2 * B, 16).astype(np.float32)
    txt_feat_seq = rng.randn(2 * B, 8, 12).astype(np.float32)
    mask = np.ones((2 * B, 8), dtype=bool)
    mask[1, 4:] = False
    x_T = rng.randn(2 * B, 16).astype(np.float32)

    calls = {"n": 0}
    orig_randn = torch.randn

    def fake_randn(*shape, **kw):
        if shape and shape[0] == 2 * B:
            calls["n"] += 1
            return torch.tensor(x_T)
        return orig_randn(*shape, **kw)

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.no_grad():
        theirs = ref_model_full(
            torch.tensor(txt_feat), torch.tensor(txt_feat_seq),
            torch.tensor(mask), cf_guidance_scales=torch.tensor([4.0]),
            timestep_respacing="ddim5",
        ).numpy()
    assert calls["n"] == 1

    sched = make_schedule(
        steps=100, noise_schedule="cosine", timestep_respacing="ddim5"
    )
    got = prior_sample_fn(
        ours.apply, variables, sched,
        jnp.asarray(txt_feat), jnp.asarray(txt_feat_seq), jnp.asarray(mask),
        4.0, jnp.asarray(clip_mean.numpy()[None]), jnp.asarray(clip_std.numpy()[None]),
        jax.random.PRNGKey(0), use_ddim=True, x_T=jnp.asarray(x_T[:B]),
    )
    np.testing.assert_allclose(theirs, np.asarray(got), atol=5e-4)
