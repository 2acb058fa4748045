"""End-to-end seeded generation parity (SURVEY §4c): the full 2.1 decoder
stack — CFG model_fn → respaced ancestral sampler (dynamic threshold +
clamp(-2,2) denoised_fn) → MoVQ decode — against the torch reference with the
SAME converted weights, conditioning, initial latent and per-step noise."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.diffusion import MeanType, VarType, make_schedule, p_sample_loop
from kandinsky2_tpu.models import movq as jmovq
from kandinsky2_tpu.models import unet as junet
from kandinsky2_tpu.weights.convert import convert_state_dict

from ref_loader import ref_model, ref_vqgan

ref21 = ref_model("text2im_model2_1")
refmc = ref_model("model_creation")
refae = ref_vqgan("autoencoder")

nchw = lambda x: np.transpose(np.asarray(x), (0, 3, 1, 2))
nhwc = lambda x: np.transpose(np.asarray(x), (0, 2, 3, 1))


pytestmark = pytest.mark.slow


def test_seeded_decoder_stack_parity(monkeypatch):
    torch.manual_seed(0)
    B, STEPS, GS = 1, 6, 4.0
    # --- tiny torch reference models ---
    t_unet = ref21.Text2ImUNet(
        model_dim=48, image_encoder_in_dim=24, text_encoder_in_dim1=40,
        text_encoder_in_dim2=48, num_image_embs=3, pooling_type="from_model",
        in_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=1,
        num_head_channels=16, num_heads_upsample=-1,
        use_scale_shift_norm=True, resblock_updown=True, out_channels=8,
        dropout=0.0,
    ).eval()
    movq_cfg = dict(
        double_z=False, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 1, 2], num_res_blocks=1, attn_resolutions=[8],
        dropout=0.0,
    )
    t_movq = refae.MOVQ(movq_cfg, n_embed=64, embed_dim=4).eval()

    # --- our models with converted weights ---
    j_unet = junet.Text2ImUNet21(
        in_channels=4, model_dim=48, image_encoder_in_dim=24,
        text_encoder_in_dim1=40, text_encoder_in_dim2=48, num_image_embs=3,
        pooling_type="from_model", use_encoder_kv=True, model_channels=32,
        num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,),
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
        out_channels=8,
    )
    j_movq = jmovq.MOVQ(
        z_channels=4, embed_dim=4, n_embed=64, ch=32, ch_mult=(1, 1, 2),
        num_res_blocks=1, attn_resolutions=(8,), resolution=32,
    )

    rng = np.random.RandomState(0)
    cond = dict(
        full_emb=rng.randn(2 * B, 5, 40).astype(np.float32),
        pooled_emb=rng.randn(2 * B, 48).astype(np.float32),
        image_emb=rng.randn(2 * B, 24).astype(np.float32),
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
    mp = j_movq.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    mp = convert_state_dict(dict(t_movq.state_dict()), mp)

    # ---------------- reference path (p_sampler branch of
    # kandinsky2_1_model.py:222-257 + MoVQ decode :286-289) ----------------
    diffusion = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing=str(STEPS),
        learn_sigma=True, sigma_small=False, use_kl=False, predict_xstart=False,
        rescale_timesteps=True, rescale_learned_sigmas=True,
        linear_start=0.00085, linear_end=0.012,
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

    # per-step noise: reference draws for the CFG-doubled batch; the first
    # half is what survives — inject matching halves
    queue = [
        torch.tensor(np.concatenate([n, n], axis=0).transpose(0, 3, 1, 2))
        for n in noise_seq
    ]
    monkeypatch.setattr(torch, "randn_like", lambda x: queue.pop(0))
    with torch.no_grad():
        samples = diffusion.p_sample_loop(
            t_model_fn, (2 * B, 4, lat_h, lat_w),
            noise=torch.tensor(nchw(np.concatenate([x_T, x_T], 0))),
            denoised_fn=lambda v: torch.clamp(v, -2, 2), device="cpu",
        )[:B]
        ref_img = t_movq.decode(samples).numpy()

    # ---------------- our path (pipelines/kandinsky2_1._build_latent_fn
    # semantics, batch-B carry) ----------------
    sched = make_schedule(
        steps=1000, noise_schedule="linear", timestep_respacing=str(STEPS),
        linear_start=0.00085, linear_end=0.012, rescale_timesteps=True,
    )
    xf_proj, xf_out = j_unet.apply(
        {"params": up}, kw["full_emb"], kw["pooled_emb"], kw["image_emb"],
        method=j_unet.encode_conditioning,
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
        clip_denoised=True, denoised_fn=lambda v: jnp.clip(v, -2, 2),
        noise_seq=jnp.asarray(noise_seq), channel_axis=-1,
    )
    our_img = j_movq.apply({"params": mp}, lat, method=j_movq.decode)

    np.testing.assert_allclose(nhwc(ref_img), np.asarray(our_img), atol=3e-3)
    # and the guidance actually did something (not a trivially-zero image)
    assert float(jnp.abs(our_img).mean()) > 1e-3
