"""End-to-end seeded generation parity for the 2.0 stack: dual text streams
(attention_pooling path — the reference Text2ImUNet default, previously
uncovered by an oracle) → CFG model_fn → respaced ancestral sampler with the
in-sampler dynamic-threshold clip (gaussian_diffusion.py:289-295) → KL-VAE
decode — against the torch reference with the SAME converted weights,
conditioning, initial latent and per-step noise.
Mirrors tests/test_e2e_seeded_parity.py (2.1)."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.diffusion import make_schedule, p_sample_loop
from kandinsky2_tpu.models import movq as jmovq
from kandinsky2_tpu.models import unet as junet
from kandinsky2_tpu.weights.convert import convert_state_dict

from ref_loader import ref_model, ref_vqgan

ref20 = ref_model("text2im_model")
refmc = ref_model("model_creation")
refae = ref_vqgan("autoencoder")

nchw = lambda x: np.transpose(np.asarray(x), (0, 3, 1, 2))
nhwc = lambda x: np.transpose(np.asarray(x), (0, 2, 3, 1))


pytestmark = pytest.mark.slow


def test_seeded_decoder20_stack_parity(monkeypatch):
    torch.manual_seed(0)
    B, STEPS, GS = 1, 6, 7.0
    t_unet = ref20.Text2ImUNet(
        model_dim=48, text_encoder_in_dim1=40, text_encoder_in_dim2=40,
        pooling_type="attention_pooling", cache_text_emb=False,
        in_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=1,
        num_head_channels=16, num_heads_upsample=-1,
        use_scale_shift_norm=True, resblock_updown=True, out_channels=8,
        dropout=0.0,
    ).eval()
    vae_cfg = dict(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 1, 2], num_res_blocks=1, attn_resolutions=[8],
        dropout=0.0,
    )
    t_vae = refae.AutoencoderKL(vae_cfg, embed_dim=4).eval()

    j_unet = junet.Text2ImUNet20(
        in_channels=4, model_dim=48, text_encoder_in_dim1=40,
        text_encoder_in_dim2=40, pooling_type="attention_pooling",
        use_encoder_kv=True, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,),
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
        out_channels=8,
    )
    j_vae = jmovq.AutoencoderKL(
        z_channels=4, embed_dim=4, ch=32, ch_mult=(1, 1, 2),
        num_res_blocks=1, attn_resolutions=(8,), resolution=32,
    )

    rng = np.random.RandomState(0)
    cond = dict(
        full_emb1=rng.randn(2 * B, 5, 40).astype(np.float32),
        pooled_emb1=rng.randn(2 * B, 40).astype(np.float32),
        full_emb2=rng.randn(2 * B, 7, 512).astype(np.float32),
        pooled_emb2=rng.randn(2 * B, 512).astype(np.float32),
    )
    lat_h = lat_w = 8
    x_T = rng.randn(B, lat_h, lat_w, 4).astype(np.float32)
    noise_seq = rng.randn(STEPS, B, lat_h, lat_w, 4).astype(np.float32)

    kw = {k: jnp.asarray(v) for k, v in cond.items()}
    up = j_unet.init(
        jax.random.PRNGKey(0), jnp.asarray(x_T), jnp.zeros((B,)),
        **{k: v[:B] for k, v in kw.items()},
    )["params"]
    up = convert_state_dict(dict(t_unet.state_dict()), up)
    vp = j_vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    vp = convert_state_dict(dict(t_vae.state_dict()), vp)

    # ---------------- reference path (kandinsky2_model.py:151-205:
    # p_sampler, denoised_fn=None, dynamic threshold inside p_mean_variance,
    # then AutoencoderKL.decode :268-270) ----------------
    diffusion = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing=str(STEPS),
        learn_sigma=True, sigma_small=False, use_kl=False,
        predict_xstart=False, rescale_timesteps=True,
        rescale_learned_sigmas=True, linear_start=0.0001, linear_end=0.02,
    )
    t_cond = {k: torch.tensor(v) for k, v in cond.items()}

    def t_model_fn(x_t, ts, **kwargs):
        half = x_t[: len(x_t) // 2]
        combined = torch.cat([half, half], dim=0)
        out = t_unet(combined, ts, **t_cond)
        eps, rest = out[:, :4], out[:, 4:]
        cond_eps, uncond_eps = torch.split(eps, len(eps) // 2, dim=0)
        guided = uncond_eps + GS * (cond_eps - uncond_eps)
        return torch.cat([torch.cat([guided, guided], 0), rest], dim=1)

    queue = [
        torch.tensor(np.concatenate([n, n], axis=0).transpose(0, 3, 1, 2))
        for n in noise_seq
    ]
    monkeypatch.setattr(torch, "randn_like", lambda x: queue.pop(0))
    with torch.no_grad():
        samples = diffusion.p_sample_loop(
            t_model_fn, (2 * B, 4, lat_h, lat_w),
            noise=torch.tensor(nchw(np.concatenate([x_T, x_T], 0))),
            denoised_fn=None, device="cpu",
        )[:B]
        ref_img = t_vae.decode(samples).numpy()

    # ---------------- our path (pipelines/kandinsky2_0._build_gen_fn
    # semantics, batch-B carry) ----------------
    sched = make_schedule(
        steps=1000, noise_schedule="linear", timestep_respacing=str(STEPS),
        linear_start=0.0001, linear_end=0.02, rescale_timesteps=True,
    )
    xf_proj, xf_out = j_unet.apply(
        {"params": up}, kw["full_emb1"], kw["pooled_emb1"], kw["full_emb2"],
        kw["pooled_emb2"], method=j_unet.encode_conditioning,
    )

    def j_model_fn(x, t_model):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_model, t_model], axis=0)
        out = j_unet.apply(
            {"params": up}, x2, t2, xf_proj, xf_out, method=j_unet.denoise
        )
        eps, rest = out[..., :4], out[..., 4:]
        guided = eps[B:] + GS * (eps[:B] - eps[B:])
        return jnp.concatenate([guided, rest[:B]], axis=-1)

    lat = p_sample_loop(
        j_model_fn, sched, jnp.asarray(x_T),
        clip_denoised=True, denoised_fn=None,
        noise_seq=jnp.asarray(noise_seq), channel_axis=-1,
    )
    our_img = j_vae.apply({"params": vp}, lat, method=j_vae.decode)

    np.testing.assert_allclose(nhwc(ref_img), np.asarray(our_img), atol=3e-3)
    assert float(jnp.abs(our_img).mean()) > 1e-3
