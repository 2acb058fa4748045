"""Offline end-to-end test of the 2.2 factory path.

Builds a synthetic local snapshot cache (tiny config.json files + safetensors
state dicts in the diffusers layout) under ``<cache_dir>/2_2`` and drives the
real ``get_kandinsky2(model_version="2.2")`` one-liner through it — the same
code path a networked user hits (reference kandinsky2/__init__.py:188 →
kandinsky2_2_model.py:17-44), with ``weights.hub.fetch_2_2`` short-circuiting
on the pre-populated cache so no network is touched.

Asserts the full fetch → tokenizer → config → convert → build chain:
every flax leaf of the loaded pipeline must be bit-equal to the synthesized
checkpoint values (a missing/renamed key would leave random init behind),
and a tiny seeded generation must run.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from safetensors.numpy import save_file

from kandinsky2_tpu.pipelines.kandinsky2_2 import Kandinsky2_2
from kandinsky2_tpu.weights.configs22 import pipeline_overrides
from kandinsky2_tpu.weights.convert import WEIGHT_LEAVES
from kandinsky2_tpu.weights.load_kandinsky22 import movq22_rename

TINY_UNET = {
    "_class_name": "UNet2DConditionModel",
    "addition_embed_type": "image",
    "attention_head_dim": 32,
    "block_out_channels": [32, 64],
    "cross_attention_dim": 32,
    "down_block_types": [
        "ResnetDownsampleBlock2D",
        "SimpleCrossAttnDownBlock2D",
    ],
    "encoder_hid_dim": 32,
    "encoder_hid_dim_type": "image_proj",
    "in_channels": 4,
    "layers_per_block": 1,
    "norm_eps": 1e-05,
    "out_channels": 8,
    "up_block_types": [
        "SimpleCrossAttnUpBlock2D",
        "ResnetUpsampleBlock2D",
    ],
    "num_image_tokens": 2,
}
TINY_MOVQ = {
    "_class_name": "VQModel",
    "block_out_channels": [32, 32, 32, 64],
    "down_block_types": [
        "DownEncoderBlock2D",
        "DownEncoderBlock2D",
        "DownEncoderBlock2D",
        "AttnDownEncoderBlock2D",
    ],
    "in_channels": 3,
    "latent_channels": 4,
    "layers_per_block": 1,
    "norm_type": "spatial",
    "num_vq_embeddings": 32,
    "out_channels": 3,
    "up_block_types": [
        "AttnUpDecoderBlock2D",
        "UpDecoderBlock2D",
        "UpDecoderBlock2D",
        "UpDecoderBlock2D",
    ],
    "vq_embed_dim": 4,
}
TINY_PRIOR = {
    "_class_name": "PriorTransformer",
    "added_emb_type": "prd",
    "additional_embeddings": 4,
    "attention_head_dim": 8,
    "embedding_dim": 32,
    "num_attention_heads": 4,
    "num_embeddings": 8,
    "num_layers": 2,
}
TINY_TEXT = {
    "architectures": ["CLIPTextModelWithProjection"],
    "eos_token_id": 513,
    "hidden_act": "gelu",
    "hidden_size": 32,
    "intermediate_size": 64,
    "layer_norm_eps": 1e-05,
    "max_position_embeddings": 8,
    "model_type": "clip_text_model",
    "num_attention_heads": 4,
    "num_hidden_layers": 2,
    "projection_dim": 32,
    "vocab_size": 514,
}
TINY_VISION = {
    "architectures": ["CLIPVisionModelWithProjection"],
    "hidden_act": "gelu",
    "hidden_size": 32,
    "image_size": 28,
    "intermediate_size": 64,
    "layer_norm_eps": 1e-05,
    "model_type": "clip_vision_model",
    "num_attention_heads": 4,
    "num_hidden_layers": 2,
    "patch_size": 14,
    "projection_dim": 32,
}


def _write_json(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def _inverse_transform(flax_arr: np.ndarray, leaf: str) -> np.ndarray:
    """Flax layout -> torch state_dict layout (inverse of convert._transform)."""
    a = np.asarray(flax_arr)
    if leaf == "kernel":
        if a.ndim == 4:  # HWIO -> OIHW
            a = a.transpose(3, 2, 0, 1)
        elif a.ndim == 2:  # IO -> OI
            a = a.T
    # safetensors serializes the raw buffer; transposed views must be
    # materialized or the stored tensor is silently wrong
    return np.ascontiguousarray(a)


def _synth_state_dict(shapes_tree, rng, rename=None):
    """Random torch-style state dict matching a flax shapes tree; returns
    (state_dict, flax_value_tree) so the load can be checked for bit-equality."""
    from kandinsky2_tpu.weights.convert import torch_key_for

    flat = jax.tree_util.tree_flatten_with_path(shapes_tree)[0]
    sd, values = {}, {}
    for keypath, leaf in flat:
        names = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        val = rng.normal(size=leaf.shape).astype(np.float32)
        tk = torch_key_for(names)
        if rename is not None:
            tk = rename(tk)
        assert tk not in sd, f"torch key collision: {tk}"
        sd[tk] = _inverse_transform(val, names[-1])
        node = values
        for n in names[:-1]:
            node = node.setdefault(n, {})
        node[names[-1]] = val
    return sd, values


def _write_tokenizer(tok_dir):
    """Tiny HF-style CLIP tokenizer snapshot: header-only merges (pure
    byte-level BPE) + the matching vocab.json (514 tokens, eot id 513)."""
    from kandinsky2_tpu.tokenizers.clip_bpe import CLIPBPETokenizer

    os.makedirs(tok_dir, exist_ok=True)
    merges = os.path.join(tok_dir, "merges.txt")
    with open(merges, "w") as f:
        f.write("#version: 0.2\n")
    tok = CLIPBPETokenizer(merges)
    assert len(tok.encoder) == 514 and tok.eot_token == 513
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(tok.encoder, f)
    _write_json(os.path.join(tok_dir, "tokenizer_config.json"),
                {"model_max_length": 8})
    _write_json(os.path.join(tok_dir, "special_tokens_map.json"),
                {"eos_token": "<|endoftext|>"})


@pytest.fixture(scope="module")
def snapshot_cache(tmp_path_factory):
    """<cache>/2_2/{prior,decoder}/... synthetic snapshots + value trees."""
    cache = tmp_path_factory.mktemp("k22_cache")
    cd = cache / "2_2"
    prior_dir, decoder_dir = str(cd / "prior"), str(cd / "decoder")

    _write_json(os.path.join(prior_dir, "prior", "config.json"), TINY_PRIOR)
    _write_json(os.path.join(prior_dir, "text_encoder", "config.json"), TINY_TEXT)
    _write_json(os.path.join(prior_dir, "image_encoder", "config.json"), TINY_VISION)
    _write_json(os.path.join(decoder_dir, "unet", "config.json"), TINY_UNET)
    _write_json(os.path.join(decoder_dir, "movq", "config.json"), TINY_MOVQ)
    _write_tokenizer(os.path.join(prior_dir, "tokenizer"))

    # shapes come from the same config path the builder uses
    overrides = pipeline_overrides(prior_dir, decoder_dir, "text2img")
    shapes = Kandinsky2_2(
        task_type="text2img", dtype=jnp.float32, overrides=overrides
    ).init_random_params()

    rng = np.random.default_rng(0)
    expected = {}
    sd, expected["unet"] = _synth_state_dict(shapes["unet"], rng)
    save_file(sd, os.path.join(
        decoder_dir, "unet", "diffusion_pytorch_model.safetensors"))
    sd, expected["movq"] = _synth_state_dict(
        shapes["movq"], rng, rename=movq22_rename)
    save_file(sd, os.path.join(
        decoder_dir, "movq", "diffusion_pytorch_model.safetensors"))
    sd, expected["prior"] = _synth_state_dict(shapes["prior"], rng)
    save_file(sd, os.path.join(
        prior_dir, "prior", "diffusion_pytorch_model.safetensors"))
    sd, expected["image_encoder"] = _synth_state_dict(
        shapes["image_encoder"], rng)
    save_file(sd, os.path.join(
        prior_dir, "image_encoder", "model.safetensors"))
    sd, expected["text_encoder"] = _synth_state_dict(shapes["text_encoder"], rng)
    save_file(sd, os.path.join(prior_dir, "text_encoder", "model.safetensors"))

    return str(cache), expected


def test_fetch_2_2_offline_shortcircuit(snapshot_cache):
    from kandinsky2_tpu.weights.hub import fetch_2_2

    cache, _ = snapshot_cache
    paths = fetch_2_2(cache, "text2img")
    assert os.path.isdir(paths["prior_dir"])
    assert os.path.isdir(paths["decoder_dir"])
    assert os.path.exists(os.path.join(paths["tokenizer_dir"], "merges.txt"))


def test_fetch_2_2_rejects_unknown_task():
    from kandinsky2_tpu.weights.hub import fetch_2_2

    with pytest.raises(ValueError):
        fetch_2_2("/tmp/nonexistent", "style_transfer")


def test_factory_22_loads_weights_and_generates(snapshot_cache):
    from kandinsky2_tpu import get_kandinsky2

    cache, expected = snapshot_cache
    pipe = get_kandinsky2(
        task_type="text2img", model_version="2.2", cache_dir=cache,
        dtype=jnp.float32,
    )
    assert pipe.params is not None and pipe.tokenizer is not None

    # every leaf bit-equal to the synthesized checkpoint: proves no key was
    # missed (strict=False would silently keep random init) and no layout
    # transform is wrong
    for model, tree in expected.items():
        flat_e = jax.tree_util.tree_flatten_with_path(tree)[0]
        flat_g = dict(jax.tree_util.tree_flatten_with_path(pipe.params[model])[0])
        assert len(flat_e) == len(flat_g), model
        for keypath, val in flat_e:
            got = np.asarray(flat_g[keypath])
            assert got.shape == val.shape, (model, keypath)
            np.testing.assert_array_equal(
                got, val, err_msg=f"{model} {keypath}")

    imgs = pipe.generate_text2img(
        "a red cat", decoder_steps=2, prior_steps=2, h=64, w=64,
    )
    assert len(imgs) == 1 and imgs[0].size == (64, 64)


def test_factory_22_inpaint_uses_inpaint_repo(snapshot_cache, monkeypatch):
    """The task→repo routing: inpainting must look for decoder-inpaint."""
    from kandinsky2_tpu.weights import hub

    assert hub._DECODER_KEY_BY_TASK["inpainting"] == "decoder-inpaint"
    asked = []

    def no_network(repo_id, filename, dest, use_auth_token=None):
        asked.append((repo_id, filename))
        raise RuntimeError("offline")

    monkeypatch.setattr(hub, "_hf_download", no_network)
    cache, _ = snapshot_cache
    # no decoder-inpaint snapshot in the cache: must go to the inpaint repo,
    # not fall back to the base decoder silently
    with pytest.raises(FileNotFoundError):
        hub.fetch_2_2(cache, "inpainting")
    assert all(r == hub.KANDINSKY_22_REPOS["decoder-inpaint"]
               for r, _ in asked), asked
