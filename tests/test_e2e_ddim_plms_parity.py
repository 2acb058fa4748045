"""Seeded end-to-end parity for the reference's DEFAULT 2.1 samplers: the
full CFG UNet -> DDIM / PLMS -> MoVQ-decode stack against the torch
reference's actual DDIMSampler / PLMSSampler classes
(kandinsky2/model/samplers.py:66-331, 334-637; dispatched from
kandinsky2_1_model.py:259-283), with the SAME converted weights,
conditioning and initial latent.

The reference samplers hardcode CUDA (samplers.py:78-79,101,226,495); the
``_cpu`` fixture remaps device arguments to CPU so the reference code itself
runs — no transcription on the reference side of this test.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.diffusion import ddim_loop, make_ddim_tables, plms_loop
from kandinsky2_tpu.models import movq as jmovq
from kandinsky2_tpu.models import unet as junet
from kandinsky2_tpu.weights.convert import convert_state_dict

from ref_loader import ref_model, ref_vqgan

ref21 = ref_model("text2im_model2_1")
refmc = ref_model("model_creation")
refae = ref_vqgan("autoencoder")
refsamplers = ref_model("samplers")

nchw = lambda x: np.transpose(np.asarray(x), (0, 3, 1, 2))
nhwc = lambda x: np.transpose(np.asarray(x), (0, 2, 3, 1))

B, STEPS, GS = 1, 6, 4.0
LAT = 8


pytestmark = pytest.mark.slow


@pytest.fixture
def _cpu(monkeypatch):
    """Remap the reference samplers' hardcoded cuda targets to cpu."""
    orig_to = torch.Tensor.to

    def fake_to(self, *args, **kwargs):
        args = tuple(
            "cpu"
            if isinstance(a, (str, torch.device)) and "cuda" in str(a)
            else a
            for a in args
        )
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", fake_to)
    for name in ("full", "randn", "zeros", "ones"):
        orig = getattr(torch, name)

        def fake(*args, _orig=orig, **kwargs):
            dev = kwargs.get("device")
            if dev is not None and "cuda" in str(dev):
                kwargs["device"] = "cpu"
            return _orig(*args, **kwargs)

        monkeypatch.setattr(torch, name, fake)


def _models():
    torch.manual_seed(0)
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
    x_T = rng.randn(B, LAT, LAT, 4).astype(np.float32)

    kw = {k: jnp.asarray(v) for k, v in cond.items()}
    up = j_unet.init(
        jax.random.PRNGKey(0), jnp.asarray(x_T), jnp.zeros((B,)),
        **{k: v[:B] for k, v in kw.items()},
    )["params"]
    up = convert_state_dict(dict(t_unet.state_dict()), up)
    mp = j_movq.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    mp = convert_state_dict(dict(t_movq.state_dict()), mp)
    return t_unet, t_movq, j_unet, j_movq, up, mp, cond, kw, x_T


def _reference_sample(sampler_name, t_unet, t_movq, cond, x_T):
    """The reference path exactly as kandinsky2_1_model.py:222-283 builds it
    for ddim_sampler/plms_sampler: CFG model_fn returning eps only, sampler
    over the CFG-doubled batch, MoVQ decode of the first half."""
    diffusion = refmc.create_gaussian_diffusion(
        steps=1000, noise_schedule="linear", timestep_respacing="",
        learn_sigma=True, sigma_small=False, use_kl=False,
        predict_xstart=False, rescale_timesteps=True,
        rescale_learned_sigmas=True, linear_start=0.00085, linear_end=0.012,
    )
    t_cond = {k: torch.tensor(v) for k, v in cond.items()}

    def model_fn(x_t, ts, **kwargs):
        half = x_t[: len(x_t) // 2]
        combined = torch.cat([half, half], dim=0)
        out = t_unet(combined, ts, **t_cond)
        eps = out[:, :4]
        cond_eps, uncond_eps = torch.split(eps, len(eps) // 2, dim=0)
        half_eps = uncond_eps + GS * (cond_eps - uncond_eps)
        return torch.cat([half_eps, half_eps], dim=0)

    cls = (
        refsamplers.DDIMSampler
        if sampler_name == "ddim" else refsamplers.PLMSSampler
    )
    sampler = cls(model=model_fn, old_diffusion=diffusion, schedule="linear")
    with torch.no_grad():
        samples, _ = sampler.sample(
            STEPS, 2 * B, (4, LAT, LAT), conditioning={},
            x_T=torch.tensor(nchw(np.concatenate([x_T, x_T], 0))),
            verbose=False,
        )
        return t_movq.decode(samples[:B]).numpy()


def _ours_sample(sampler_name, j_unet, j_movq, up, mp, kw, x_T):
    """pipelines/kandinsky2_1._build_latent_fn's ddim/plms branch."""
    from kandinsky2_tpu.diffusion import make_schedule

    base = make_schedule(
        steps=1000, noise_schedule="linear", linear_start=0.00085,
        linear_end=0.012, rescale_timesteps=True,
    )
    tables = make_ddim_tables(
        np.asarray(base.alphas_cumprod, np.float64), STEPS
    )
    xf_proj, xf_out = j_unet.apply(
        {"params": up}, kw["full_emb"], kw["pooled_emb"], kw["image_emb"],
        method=j_unet.encode_conditioning,
    )

    def model_fn(x, t_model):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_model, t_model], axis=0)
        out = j_unet.apply(
            {"params": up}, x2, t2, xf_proj, xf_out, method=j_unet.denoise
        )
        eps = out[..., :4]
        return eps[B:] + GS * (eps[:B] - eps[B:])

    loop = ddim_loop if sampler_name == "ddim" else plms_loop
    lat = loop(model_fn, tables, jnp.asarray(x_T))
    return np.asarray(j_movq.apply({"params": mp}, lat, method=j_movq.decode))


@pytest.mark.parametrize("sampler_name", ["ddim", "plms"])
def test_seeded_stack_parity(sampler_name, _cpu):
    t_unet, t_movq, j_unet, j_movq, up, mp, cond, kw, x_T = _models()
    theirs = _reference_sample(sampler_name, t_unet, t_movq, cond, x_T)
    ours = _ours_sample(sampler_name, j_unet, j_movq, up, mp, kw, x_T)
    np.testing.assert_allclose(nhwc(theirs), ours, atol=3e-3)
    assert float(np.abs(ours).mean()) > 1e-3
