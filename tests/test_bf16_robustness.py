"""bf16 robustness with realistic (torch-default-init) weight scales
(VERDICT round-1 item 10).

Flax's lecun_normal underestimates real checkpoints' activation ranges;
these tests resample params to torch init statistics (kaiming_uniform
kernels, N(0,1) embeddings), run the whole pipeline in bf16, and assert
finite outputs.  On CPU the geometry is reduced; on a real TPU the full 768²
flagship path runs (examples/bf16_stress_768.py drives it on-chip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky2_tpu.pipelines import Kandinsky2_1
from kandinsky2_tpu.weights.realistic import torch_init_stats
from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config


def test_torch_init_stats_properties():
    params = {
        "dense": {"kernel": jnp.full((64, 128), 0.01), "bias": jnp.zeros(128)},
        "zero_conv": {"kernel": jnp.zeros((3, 3, 16, 16))},
        "emb": {"embedding": jnp.full((50, 32), 0.01)},
        "norm": {"scale": jnp.ones(64)},
    }
    out = torch_init_stats(params, jax.random.PRNGKey(0))
    k = np.asarray(out["dense"]["kernel"])
    bound = 1 / np.sqrt(64)
    assert np.abs(k).max() <= bound and k.std() > 0.3 * bound
    # zero_module conv stays zero; norm scale untouched
    assert np.all(np.asarray(out["zero_conv"]["kernel"]) == 0)
    assert np.all(np.asarray(out["norm"]["scale"]) == 1)
    e = np.asarray(out["emb"]["embedding"])
    assert 0.8 < e.std() < 1.2  # N(0,1)


@pytest.fixture(scope="module")
def bf16_pipe():
    pipe = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.bfloat16,
    )
    pipe.init_random_params()
    pipe.params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        torch_init_stats(pipe.params, jax.random.PRNGKey(7)),
    )
    return pipe


@pytest.mark.slow
def test_bf16_pipeline_finite_realistic_scales(bf16_pipe):
    """Full CFG -> sampler -> MoVQ stack in bf16 at torch-init activation
    magnitudes must stay finite end to end."""
    on_tpu = jax.devices()[0].platform == "tpu"
    h = w = 768 if on_tpu else 128
    imgs = bf16_pipe.generate_text2img(
        "stress", num_steps=4, h=h, w=w, sampler="ddim_sampler",
        prior_steps="3",
    )
    arr = np.asarray(imgs[0], np.float32)
    assert arr.shape == (h, w, 3)
    assert np.isfinite(arr).all()


@pytest.mark.slow
def test_bf16_psampler_finite_realistic_scales(bf16_pipe):
    """p_sampler exercises the learned-variance split + on-device noise."""
    imgs = bf16_pipe.generate_text2img(
        "stress", num_steps=3, h=64, w=64, sampler="p_sampler",
        prior_steps="3",
    )
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()
