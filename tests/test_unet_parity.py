"""Parity: 2.1/2.0 conditioned UNets vs the torch reference
(kandinsky2/model/unet.py, text2im_model2_1.py, text2im_model.py) on tiny
random configs with mechanically-converted weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky2_tpu.models import unet as junet
from kandinsky2_tpu.weights.convert import convert_state_dict, unused_torch_keys

from ref_loader import ref_model

ref21 = ref_model("text2im_model2_1")
ref20 = ref_model("text2im_model")

TINY = dict(
    model_channels=32,
    num_res_blocks=1,
    channel_mult=(1, 2),
    attention_resolutions=(2,),
    num_heads=1,
    num_head_channels=16,
    num_heads_upsample=-1,
    use_scale_shift_norm=True,
    resblock_updown=True,
    out_channels=8,
)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def build_21(inpaint=False):
    torch.manual_seed(0)
    in_ch = 4 * 2 + 1 if inpaint else 4
    cls_t = ref21.InpaintText2ImUNet if inpaint else ref21.Text2ImUNet
    # the reference Inpaint* ctor multiplies in_channels itself
    ref = cls_t(
        model_dim=48,
        image_encoder_in_dim=24,
        text_encoder_in_dim1=40,
        text_encoder_in_dim2=48,
        num_image_embs=3,
        pooling_type="from_model",
        in_channels=4,
        dropout=0.0,
        **TINY,
    ).eval()
    cls_j = junet.InpaintText2ImUNet21 if inpaint else junet.Text2ImUNet21
    ours = cls_j(
        in_channels=in_ch,
        model_dim=48,
        image_encoder_in_dim=24,
        text_encoder_in_dim1=40,
        text_encoder_in_dim2=48,
        num_image_embs=3,
        pooling_type="from_model",
        use_encoder_kv=True,
        **TINY,
    )
    rng = np.random.RandomState(0)
    cond = dict(
        full_emb=rng.randn(2, 5, 40).astype(np.float32),
        pooled_emb=rng.randn(2, 48).astype(np.float32),
        image_emb=rng.randn(2, 24).astype(np.float32),
    )
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    t = np.array([3.0, 997.0], dtype=np.float32)
    init_kwargs = {k: jnp.asarray(v) for k, v in cond.items()}
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), **init_kwargs)[
        "params"
    ]
    sd = dict(ref.state_dict())
    params = convert_state_dict(sd, params)
    assert not unused_torch_keys(sd, params)
    return ref, ours, {"params": params}, x, t, cond


@pytest.mark.parametrize("inpaint", [False, True])
def test_text2im_unet21(inpaint):
    ref, ours, variables, x, t, cond = build_21(inpaint)
    kw_t = {k: torch.tensor(v) for k, v in cond.items()}
    kw_j = {k: jnp.asarray(v) for k, v in cond.items()}
    if inpaint:
        rng = np.random.RandomState(5)
        img = rng.randn(2, 16, 16, 4).astype(np.float32)
        mask = (rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
        kw_t["inpaint_image"] = torch.tensor(nchw(img))
        kw_t["inpaint_mask"] = torch.tensor(nchw(mask))
        kw_j["inpaint_image"] = jnp.asarray(img)
        kw_j["inpaint_mask"] = jnp.asarray(mask)
    with torch.no_grad():
        theirs = ref(torch.tensor(nchw(x)), torch.tensor(t), **kw_t).numpy()
    got = ours.apply(variables, jnp.asarray(x), jnp.asarray(t), **kw_j)
    np.testing.assert_allclose(nhwc(theirs), np.asarray(got), atol=5e-4)


def test_text2im_unet21_split_conditioning():
    """encode_conditioning + denoise must equal the fused __call__ (the scan
    hoisting relies on this)."""
    _, ours, variables, x, t, cond = build_21(False)
    kw_j = {k: jnp.asarray(v) for k, v in cond.items()}
    fused = ours.apply(variables, jnp.asarray(x), jnp.asarray(t), **kw_j)
    xf_proj, xf_out = ours.apply(
        variables, method=ours.encode_conditioning, **kw_j
    )
    split = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(t), xf_proj, xf_out,
        method=ours.denoise,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split), atol=1e-6)


def test_text2im_unet20():
    torch.manual_seed(1)
    ref = ref20.Text2ImUNet(
        model_dim=48,
        text_encoder_in_dim1=40,
        text_encoder_in_dim2=24,
        pooling_type="from_model",
        in_channels=4,
        dropout=0.0,
        **TINY,
    ).eval()
    ours = junet.Text2ImUNet20(
        in_channels=4,
        model_dim=48,
        text_encoder_in_dim1=40,
        text_encoder_in_dim2=24,
        pooling_type="from_model",
        use_encoder_kv=True,
        **TINY,
    )
    rng = np.random.RandomState(2)
    cond = dict(
        full_emb1=rng.randn(2, 5, 40).astype(np.float32),
        pooled_emb1=rng.randn(2, 24).astype(np.float32),
        full_emb2=rng.randn(2, 7, 512).astype(np.float32),
        pooled_emb2=None,
    )
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    t = np.array([10.0, 500.0], dtype=np.float32)
    kw_j = {
        k: (jnp.asarray(v) if v is not None else None) for k, v in cond.items()
    }
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), **kw_j
    )["params"]
    sd = dict(ref.state_dict())
    params = convert_state_dict(sd, params)
    assert not unused_torch_keys(sd, params)
    kw_t = {
        k: (torch.tensor(v) if v is not None else None) for k, v in cond.items()
    }
    with torch.no_grad():
        theirs = ref(torch.tensor(nchw(x)), torch.tensor(t), **kw_t).numpy()
    got = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), **kw_j)
    np.testing.assert_allclose(nhwc(theirs), np.asarray(got), atol=5e-4)
