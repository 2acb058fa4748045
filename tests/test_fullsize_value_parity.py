"""Full-size NUMERICAL parity: real-config torch reference models with seeded
random init, mechanically converted through the exact loader paths that real
checkpoints use, must reproduce the torch forward values.

This is the strongest offline proof that real checkpoints will work: key-shape
parity (test_fullsize_key_parity.py) cannot catch head-layout / packing errors
that preserve shapes, and tiny-config value parity cannot catch mistakes that
only appear at the real channel_mult / depth / head counts.  Reference stacks:
/root/reference/kandinsky2/model/unet.py:343 (via model_creation.py:9),
model/prior.py:159, vqgan/autoencoder.py:160.

Runtime: each test builds a ~1B-param fp32 torch model on CPU, so the file is
marked ``slow`` (fast tier: ``pytest -m "not slow"``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.configs import CONFIG_2_1, create_model
from kandinsky2_tpu.models.movq import MOVQ
from kandinsky2_tpu.models.prior import PriorTransformer
from kandinsky2_tpu.weights.convert import convert_state_dict, unused_torch_keys

from ref_loader import ref_model, ref_vqgan

pytestmark = pytest.mark.slow


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _dezero(model: torch.nn.Module, seed: int = 123) -> None:
    """Random-init GLIDE-style models zero their output convs (zero_module),
    which makes every residual branch — and the final output — identically
    zero.  Fill all-zero parameter tensors with small seeded noise so the
    forward actually exercises every converted weight."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.numel() and not bool(p.detach().abs().sum()):
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)


def test_unet21_fullsize_forward():
    """One denoise-model forward of the real-config 1.22B UNet (fp32, small
    latent) through convert_state_dict — the exact path load_unet21 uses."""
    refmc = ref_model("model_creation")
    cfg = dict(CONFIG_2_1["model_config"])
    cfg["inpainting"] = False
    cfg["up"] = False
    cfg["use_fp16"] = False  # fp32 parity; fp16 conversion is a separate step
    torch.manual_seed(0)
    ref = refmc.create_model(**cfg).eval()
    _dezero(ref)
    sd = dict(ref.state_dict())

    ours = create_model(**cfg, dtype=jnp.float32)
    B = 1
    rng = np.random.RandomState(0)
    x = rng.randn(B, 32, 32, 4).astype(np.float32)
    t = np.array([517.0], dtype=np.float32)
    cond = dict(
        full_emb=rng.randn(B, 77, cfg["text_encoder_in_dim1"]).astype(np.float32),
        pooled_emb=rng.randn(B, cfg["text_encoder_in_dim2"]).astype(np.float32),
        image_emb=rng.randn(B, cfg["image_encoder_in_dim"]).astype(np.float32),
    )
    shapes = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
            **{k: jnp.asarray(v) for k, v in cond.items()},
        )
    )["params"]
    params = convert_state_dict(sd, shapes)
    assert not unused_torch_keys(sd, shapes)

    with torch.no_grad():
        theirs = ref(
            torch.tensor(nchw(x)), torch.tensor(t),
            **{k: torch.tensor(v) for k, v in cond.items()},
        ).numpy()
    got = np.asarray(
        ours.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t),
            **{k: jnp.asarray(v) for k, v in cond.items()},
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(nhwc(theirs), got, atol=1e-4)


def test_prior_fullsize_forward():
    """One prior-transformer step at the real 2048-wide / 20-layer / 32-head
    config, loaded through the checkpoint layout (keys ``model.*``) exactly
    like load_prior21."""
    refprior = ref_model("prior")
    hp = CONFIG_2_1["prior"]["params"]["model"]["hparams"]
    kw = dict(
        text_ctx=hp["text_ctx"], xf_width=hp["xf_width"],
        xf_layers=hp["xf_layers"], xf_heads=hp["xf_heads"],
        xf_final_ln=hp["xf_final_ln"], clip_dim=hp["clip_dim"],
        clip_xf_width=hp["clip_xf_width"],
    )
    torch.manual_seed(1)
    ref = refprior.PriorTransformer(xf_padding=hp["xf_padding"], **kw).eval()
    _dezero(ref)
    # prior_fp16.ckpt stores the PriorDiffusionModel tree: transformer under
    # "model." — reproduce that layout and load with the same prefix.
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}

    ours = PriorTransformer(**kw)
    rng = np.random.RandomState(1)
    B = 2
    x = rng.randn(B, hp["clip_dim"]).astype(np.float32)
    t = np.array([12.0, 980.0], dtype=np.float32)
    text_emb = rng.randn(B, hp["clip_dim"]).astype(np.float32)
    text_enc = rng.randn(B, hp["text_ctx"], hp["clip_xf_width"]).astype(np.float32)
    mask = np.ones((B, hp["text_ctx"]), dtype=bool)
    mask[1, 30:] = False
    shapes = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(text_emb), jnp.asarray(text_enc), jnp.asarray(mask),
        )
    )["params"]
    params = convert_state_dict(sd, shapes, prefix="model.")
    assert not unused_torch_keys(sd, shapes, prefix="model.")

    n_ctx = hp["text_ctx"] + 4  # [text_enc, text_emb, t_emb, x, prd]
    causal = torch.triu(torch.full((1, n_ctx, n_ctx), float("-inf")), 1)
    with torch.no_grad():
        theirs = ref(
            torch.tensor(x), torch.tensor(t),
            text_emb=torch.tensor(text_emb), text_enc=torch.tensor(text_enc),
            mask=torch.tensor(mask), causal_mask=causal,
        ).numpy()
    got = np.asarray(
        ours.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(text_emb), jnp.asarray(text_enc), jnp.asarray(mask),
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(theirs, got, atol=1e-4)


def test_movq_fullsize_roundtrip():
    """Real-config MoVQ (67M): encode a 64x64 image and decode the resulting
    latent, both compared against torch."""
    refae = ref_vqgan("autoencoder")
    ie = CONFIG_2_1["image_enc_params"]["params"]
    dd = ie["ddconfig"]
    torch.manual_seed(2)
    ref = refae.MOVQ(dd, n_embed=ie["n_embed"], embed_dim=ie["embed_dim"]).eval()
    _dezero(ref)
    sd = dict(ref.state_dict())

    ours = MOVQ(
        z_channels=dd["z_channels"], embed_dim=ie["embed_dim"],
        n_embed=ie["n_embed"], ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]),
        num_res_blocks=dd["num_res_blocks"],
        attn_resolutions=tuple(dd["attn_resolutions"]),
        resolution=dd["resolution"],
    )
    shapes = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )["params"]
    params = convert_state_dict(sd, shapes)
    assert not unused_torch_keys(sd, shapes)

    rng = np.random.RandomState(2)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref.encode(torch.tensor(nchw(img))).numpy()
        ref_img = ref.decode(torch.tensor(ref_lat)).numpy()
    got_lat = np.asarray(
        ours.apply({"params": params}, jnp.asarray(img), method=ours.encode)
    )
    np.testing.assert_allclose(nhwc(ref_lat), got_lat, atol=1e-4)
    got_img = np.asarray(
        ours.apply(
            {"params": params}, jnp.asarray(nhwc(ref_lat)), method=ours.decode
        )
    )
    assert np.isfinite(got_img).all()
    np.testing.assert_allclose(nhwc(ref_img), got_img, atol=1e-4)
