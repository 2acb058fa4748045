"""Multi-device tests on the 8-virtual-CPU mesh: sharding rules, the full
TP+DP training dryrun, and tensor-parallel sharded inference of the whole
2.1 pipeline."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from kandinsky2_tpu.parallel import make_mesh, shard_params
from kandinsky2_tpu.parallel.mesh import _param_spec


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")


def test_param_spec_rules():
    big_qkv = np.zeros((1024, 3072))
    assert _param_spec(("a", "qkv", "kernel"), big_qkv) == P(None, "model")
    proj = np.zeros((2048, 1024))
    assert _param_spec(("a", "proj_out", "kernel"), proj) == P("model", None)
    small = np.zeros((64, 64))
    assert _param_spec(("a", "qkv", "kernel"), small) == P()
    norm = np.zeros((1024,))
    assert _param_spec(("a", "norm", "scale"), norm) == P()


def test_shard_params_and_matmul():
    mesh = make_mesh(8, model_parallel=4)
    params = {
        "layer": {"qkv": {"kernel": jnp.ones((256, 2048))}},
        "norm": {"scale": jnp.ones((256,))},
    }
    sharded = shard_params(params, mesh, min_size=1024)
    k = sharded["layer"]["qkv"]["kernel"]
    assert not k.sharding.is_fully_replicated
    x = jnp.ones((8, 256))
    out = jax.jit(lambda p, x: x @ p["layer"]["qkv"]["kernel"])(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.full((8, 2048), 256.0))


def test_sharding_coverage_guard_raises():
    """min_candidate_frac fails loudly when markers match nothing (e.g. a
    module rename broke the substring rules)."""
    import pytest

    from kandinsky2_tpu.parallel import ShardingReport
    from kandinsky2_tpu.parallel.mesh import shard_params as sp

    mesh = make_mesh(8, model_parallel=4)
    # a large kernel whose dims do NOT divide the model axis -> fallback
    params = {"layer": {"qkv": {"kernel": jnp.ones((258, 2050))}}}
    rep = ShardingReport()
    sp(params, mesh, min_size=64, report=rep)
    assert rep.candidate_frac == 0.0 and len(rep.fallbacks) == 1
    with pytest.raises(ValueError, match="coverage too low"):
        sp(params, mesh, min_size=64, min_candidate_frac=0.5)


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_serving_over_sharded_pipeline():
    """The serving runtime composes with TP sharding: distinct prompts
    coalesce into one program whose params are sharded over the mesh."""
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config

    from kandinsky2_tpu.pipelines import Kandinsky2_1
    from kandinsky2_tpu.serving import GenerationServer

    pipe = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    pipe.init_random_params()
    pipe.shard(model_parallel=4, min_size=64)
    server = GenerationServer(pipe, max_batch=2)
    kw = dict(h=64, w=64, num_steps=4, sampler="dpmpp_sampler",
              prior_steps="3")
    server.start()
    try:
        futs = [server.submit(p, **kw) for p in ("a red cat", "a blue dog")]
        for f in futs:
            arr = np.asarray(f.result(timeout=600)[0])
            assert arr.shape == (64, 64, 3)
            assert np.isfinite(arr.astype(np.float32)).all()
    finally:
        server.stop()


@pytest.mark.slow
def test_sharded_inference_pipeline():
    """Full 2.1 text2img with TP-sharded params over the 8-device mesh."""
    from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config

    from kandinsky2_tpu.pipelines import Kandinsky2_1

    pipe = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    pipe.init_random_params()
    ref = pipe.generate_text2img(
        "a cat", num_steps=4, h=64, w=64, sampler="ddim_sampler",
        prior_steps="3",
    )
    mesh = pipe.shard(model_parallel=4, min_size=64)
    assert mesh.devices.size == 8
    # coverage report: most candidate kernel bytes actually sharded, and the
    # call raises below min_candidate_frac (the silent-replication guard)
    rep = pipe.sharding_report
    assert rep.sharded_params > 0 and rep.candidate_frac >= 0.5, rep.summary()
    # at least one kernel actually sharded
    flat = jax.tree_util.tree_leaves(pipe.params["unet"])
    assert any(not leaf.sharding.is_fully_replicated for leaf in flat)
    pipe._jit_cache.clear()
    imgs = pipe.generate_text2img(
        "a cat", num_steps=4, h=64, w=64, sampler="ddim_sampler",
        prior_steps="3",
    )
    arr = np.asarray(imgs[0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()


@pytest.mark.slow
def test_sharded_inference_pipeline22():
    """Full 2.2 prior+decoder with TP-sharded params (ViT-bigG towers, 2.2
    UNet, MoVQ) over the 8-device mesh via the shared pipe.shard()."""
    from test_pipeline22 import make_pipe

    pipe = make_pipe("text2img")
    mesh = pipe.shard(model_parallel=4, min_size=64)
    assert mesh.devices.size == 8
    rep = pipe.sharding_report
    assert rep.sharded_params > 0 and rep.candidate_frac >= 0.5, rep.summary()
    flat = jax.tree_util.tree_leaves(pipe.params["unet"])
    assert any(not leaf.sharding.is_fully_replicated for leaf in flat)
    pipe._jit_cache.clear()
    imgs = pipe.generate_text2img(
        "a cat", decoder_steps=4, prior_steps=2, h=64, w=64, sampler="dpmpp",
    )
    arr = np.asarray(imgs[0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()


@pytest.mark.slow
def test_sharded_inference_pipeline20():
    """Full 2.0 text2img with TP-sharded params over the 8-device mesh."""
    from test_pipeline20 import StubHFTok, tiny_config20
    from kandinsky2_tpu.pipelines.kandinsky2_0 import Kandinsky2

    pipe = Kandinsky2(
        config=tiny_config20(), tokenizer1=StubHFTok(),
        tokenizer2=StubHFTok(), dtype=jnp.float32,
    )
    pipe.init_random_params()
    mesh = pipe.shard(model_parallel=4, min_size=64)
    assert mesh.devices.size == 8
    rep = pipe.sharding_report
    assert rep.sharded_params > 0, rep.summary()
    pipe._jit_cache.clear()
    imgs = pipe.generate_text2img(
        "a cat", num_steps=4, h=64, w=64, sampler="ddim_sampler",
        ddim_eta=0.0,
    )
    arr = np.asarray(imgs[0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr.astype(np.float32)).all()
