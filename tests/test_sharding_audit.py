"""Allocation-free tensor-parallel coverage audit of the FULL-SIZE parameter
trees (1.22B UNet 2.1, 1B prior, 2.2 decoder UNet + prior, ViT-bigG).

Tiny-config TP tests (test_parallel.py) shard with min_size=64 and cannot
catch real-dimension divisibility fallbacks or silent replication; auditing
``jax.eval_shape`` trees with the production rules (min_size=1024) does, at
zero allocation cost.  This is the pre-hardware check for a real v5e-8."""

import jax
import jax.numpy as jnp
import pytest

from kandinsky2_tpu.configs import CONFIG_2_1, create_model
from kandinsky2_tpu.models.prior import PriorTransformer
from kandinsky2_tpu.models.prior22 import PriorTransformer22
from kandinsky2_tpu.models.text_encoders import HFCLIPVision
from kandinsky2_tpu.models.unet22 import UNet22
from kandinsky2_tpu.parallel.mesh import audit_sharding
from kandinsky2_tpu.weights.configs22 import (
    load_model_config,
    prior22_overrides,
    unet22_overrides,
)

MODEL_PARALLEL = (2, 4, 8)


def _shapes_unet21():
    cfg = dict(CONFIG_2_1["model_config"])
    cfg.update(inpainting=False, up=False)
    ours = create_model(**cfg, dtype=jnp.float32)
    return jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            full_emb=jnp.zeros((1, 77, cfg["text_encoder_in_dim1"])),
            pooled_emb=jnp.zeros((1, cfg["text_encoder_in_dim2"])),
            image_emb=jnp.zeros((1, cfg["image_encoder_in_dim"])),
        )
    )["params"]


def _shapes_prior21():
    hp = CONFIG_2_1["prior"]["params"]["model"]["hparams"]
    ours = PriorTransformer(
        text_ctx=hp["text_ctx"], xf_width=hp["xf_width"],
        xf_layers=hp["xf_layers"], xf_heads=hp["xf_heads"],
        xf_final_ln=hp["xf_final_ln"], clip_dim=hp["clip_dim"],
        clip_xf_width=hp["clip_xf_width"],
    )
    return jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros((1, hp["clip_dim"])),
            jnp.zeros((1,)), jnp.zeros((1, hp["clip_dim"])),
            jnp.zeros((1, hp["text_ctx"], hp["clip_xf_width"])),
            jnp.ones((1, hp["text_ctx"]), bool),
        )
    )["params"]


def _shapes_unet22():
    cfg = load_model_config(None, "unet", "decoder__unet")
    ours = UNet22(**unet22_overrides(cfg))
    return jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cfg["in_channels"])),
            jnp.zeros((1,)), jnp.zeros((1, cfg["encoder_hid_dim"])),
        )
    )["params"]


def _shapes_prior22():
    cfg = load_model_config(None, "prior", "prior__prior")
    kw = prior22_overrides(cfg)
    ours = PriorTransformer22(**kw)
    d = cfg["embedding_dim"]
    return jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.zeros((1, d)), jnp.zeros((1,)),
            jnp.zeros((1, d)), jnp.zeros((1, cfg["num_embeddings"], d)),
            jnp.ones((1, cfg["num_embeddings"]), bool),
        )
    )["params"]


def _shapes_vit_bigg():
    ours = HFCLIPVision()
    return jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    )["params"]


TREES = {
    "unet21": (_shapes_unet21, 1.1e9),
    "prior21": (_shapes_prior21, 0.9e9),
    "unet22": (_shapes_unet22, 1.1e9),
    "prior22": (_shapes_prior22, 0.9e9),
    "vit_bigg": (_shapes_vit_bigg, 1.7e9),
}


@pytest.mark.parametrize("name", sorted(TREES))
def test_fullsize_sharding_coverage(name):
    build, min_params = TREES[name]
    shapes = build()
    n_params = sum(
        int(jnp.prod(jnp.asarray(s.shape))) for s in jax.tree_util.tree_leaves(shapes)
    )
    assert n_params >= min_params, (
        f"{name}: built only {n_params / 1e9:.2f}B params — not the full-size tree"
    )
    for mp in MODEL_PARALLEL:
        rep = audit_sharding(shapes, model_parallel=mp, min_size=1024)
        assert not rep.fallbacks, (
            f"{name} mp={mp}: divisibility fallbacks {rep.fallbacks[:6]}"
        )
        assert rep.candidate_frac >= 0.9, (
            f"{name} mp={mp}: only {100 * rep.candidate_frac:.1f}% of "
            f"candidate kernel bytes sharded — {rep.summary()}"
        )
