"""End-to-end smoke of the decoder training CLI: tiny YAML + generated CSV
image dataset -> a few optimizer steps -> resumable checkpoint on disk."""

import pytest
import os
import subprocess
import sys

import numpy as np
import yaml
from PIL import Image


pytestmark = pytest.mark.slow


def _write_dataset_and_cfg(tmp_path):
    # dataset: 2 images + captions
    for i in range(2):
        Image.fromarray(
            (np.random.RandomState(i).rand(64, 64, 3) * 255).astype(np.uint8)
        ).save(tmp_path / f"img{i}.png")
    with open(tmp_path / "data.csv", "w") as f:
        f.write("image_name,caption\n")
        f.write(f"img0.png,a red cat\nimg1.png,a blue dog\n")

    cfg = {
        "params_path": None,
        "num_epochs": 1,
        "save_every": 2,
        "save_path": str(tmp_path / "ckpt"),
        "inpainting": False,
        "freeze": {"freeze_resblocks": True, "freeze_attention": False},
        "schedule_sampler": "uniform",
        "model_config": {
            "version": "2.1", "image_size": 64, "num_channels": 32,
            "num_res_blocks": 1, "channel_mult": "1,2",
            "attention_resolutions": "32", "num_heads": 1,
            "num_head_channels": 16, "num_heads_upsample": -1, "dropout": 0,
            "model_dim": 32, "use_scale_shift_norm": True,
            "resblock_updown": True, "use_fp16": False,
            "cache_text_emb": False, "text_encoder_in_dim1": 24,
            "text_encoder_in_dim2": 32, "image_encoder_in_dim": 32,
            "num_image_embs": 2, "pooling_type": "from_model",
            "in_channels": 4, "out_channels": 8, "inpainting": False,
            "up": False,
        },
        "diffusion_config": {
            "learn_sigma": True, "sigma_small": False, "steps": 1000,
            "noise_schedule": "linear", "timestep_respacing": "",
            "use_kl": False, "predict_xstart": False,
            "rescale_timesteps": True, "rescale_learned_sigmas": True,
            "linear_start": 0.00085, "linear_end": 0.012,
        },
        "optim_params": {
            "name": "optax.adafactor", "params": {"learning_rate": 5.0e-6},
        },
        "image_enc_params": {
            "name": "MOVQ", "scale": 1, "ckpt_path": None,
            "params": {
                "embed_dim": 4, "n_embed": 32,
                "ddconfig": {
                    "double_z": False, "z_channels": 4, "resolution": 64,
                    "in_channels": 3, "out_ch": 3, "ch": 32,
                    "ch_mult": [1, 1, 1, 2], "num_res_blocks": 1,
                    "attn_resolutions": [8], "dropout": 0.0,
                },
            },
        },
        "text_enc_params": {
            "model_path": None, "model_name": "multiclip", "in_features": 24,
            "out_features": 32, "layers": 2, "heads": 4, "intermediate": 48,
            "vocab_size": 64, "max_positions": 40,
        },
        "clip_text_params": {
            "vocab_size": 64, "context_length": 8, "width": 48, "layers": 2,
            "heads": 4, "embed_dim": 32,
        },
        "clip_vision_params": {
            "image_size": 28, "patch_size": 14, "width": 32, "layers": 2,
            "heads": 4, "embed_dim": 32,
        },
        "clip_image_size": 28,
        "data": {
            "train": {
                "df_path": str(tmp_path / "data.csv"),
                "image_dir": str(tmp_path), "image_size": 64,
                "tokenizer_name": None, "clip_image_size": 28,
                "drop_text_prob": 0.5, "drop_image_prob": 0.1, "seq_len": 8,
                "batch_size": 1, "shuffle": True,
            }
        },
    }
    return cfg


def _run_cli(tmp_path, cfg, extra_env=None):
    cfg_path = tmp_path / "config.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if extra_env:
        env.update(extra_env)
    # stub-tokenizer mode: the CLI falls back to a stub when tokenizer_name
    # is empty (test environments have no downloaded tokenizers)
    proc = subprocess.run(
        [sys.executable, "train_2_1_unclip.py", "--config", str(cfg_path),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ckpts = os.listdir(tmp_path / "ckpt")
    assert any(c.endswith(".safetensors") for c in ckpts), ckpts
    assert "latest" in ckpts


def test_train_cli_smoke(tmp_path):
    cfg = _write_dataset_and_cfg(tmp_path)
    _run_cli(tmp_path, cfg)


def test_train_cli_spatial_parallel(tmp_path):
    """parallel: {data, sp} in the YAML routes the loop through the
    shard_map'ed SP x DP step (latent rows sharded 4-way here)."""
    cfg = _write_dataset_and_cfg(tmp_path)
    cfg["parallel"] = {"data": 1, "sp": 4}
    cfg["remat"] = True
    _run_cli(
        tmp_path, cfg,
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
    )
