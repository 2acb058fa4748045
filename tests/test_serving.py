"""Serving runtime: warmup, micro-batched submission, shutdown."""

import numpy as np

import jax.numpy as jnp

from kandinsky2_tpu.serving import GenerationServer
from test_pipeline21 import StubBPETokenizer, StubHFTokenizer, tiny_config

from kandinsky2_tpu.pipelines import Kandinsky2_1


def test_server_end_to_end():
    pipe = Kandinsky2_1(
        config=tiny_config(), tokenizer1=StubHFTokenizer(),
        tokenizer2=StubBPETokenizer(), dtype=jnp.float32,
    )
    pipe.init_random_params()
    server = GenerationServer(pipe, max_batch=2)
    kw = dict(h=64, w=64, num_steps=4, sampler="ddim_sampler", prior_steps="3")
    server.warmup([kw])
    server.start()
    try:
        futs = [server.submit("a red cat", **kw) for _ in range(3)]
        futs.append(server.submit("a blue dog", **kw))
        for f in futs:
            imgs = f.result(timeout=600)
            arr = np.asarray(imgs[0])
            assert arr.shape == (64, 64, 3)
            assert np.isfinite(arr.astype(np.float32)).all()
    finally:
        server.stop()
