"""Shared helpers for the example scripts: tiny random-weight configs (so
examples run without checkpoints/network) and real-checkpoint loading."""

from __future__ import annotations

import argparse
import os
import sys

# examples are runnable from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class StubHFTokenizer:
    def __call__(self, texts, max_length=77, **kw):
        n = len(texts)
        ids = np.ones((n, max_length), np.int32)
        mask = np.zeros((n, max_length), np.int32)
        for i, t in enumerate(texts):
            L = min(max_length, 2 + len(t.split()))
            ids[i, :L] = 2 + (np.arange(L) % 60)
            mask[i, :L] = 1
        return {"input_ids": ids, "attention_mask": mask}


class StubBPETokenizer:
    eot = 63

    def padded_tokens_and_mask(self, texts, ctx):
        n = len(texts)
        toks = np.zeros((n, ctx), np.int32)
        mask = np.zeros((n, ctx), bool)
        for i, t in enumerate(texts):
            L = min(ctx, 2 + len(t))
            toks[i, : L - 1] = 1 + (np.arange(L - 1) % 60)
            toks[i, L - 1] = self.eot
            mask[i, :L] = True
        return toks, mask


def argparser(**extra):
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny random-weight config (no checkpoints needed)")
    ap.add_argument("--prompt", default="red cat, 4k photo")
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--res", type=int, default=None)
    for k, v in extra.items():
        ap.add_argument(f"--{k}", default=v)
    return ap


def make_pipe21(small: bool, task_type="text2img"):
    import jax.numpy as jnp

    if small:
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from test_pipeline21 import tiny_config

        from kandinsky2_tpu.pipelines import Kandinsky2_1

        p = Kandinsky2_1(
            config=tiny_config(), tokenizer1=StubHFTokenizer(),
            tokenizer2=StubBPETokenizer(), task_type=task_type,
            dtype=jnp.bfloat16,
        )
        p.init_random_params(cast=jnp.bfloat16)
        return p, dict(num_steps=4, h=64, w=64, prior_steps="3")
    from kandinsky2_tpu import get_kandinsky2

    return get_kandinsky2(task_type=task_type, model_version="2.1"), dict(
        num_steps=100, h=768, w=768, prior_steps="5"
    )


def make_pipe20(small: bool, task_type="text2img"):
    import jax.numpy as jnp

    if small:
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from test_pipeline20 import tiny_config20

        from kandinsky2_tpu.pipelines import Kandinsky2

        p = Kandinsky2(
            config=tiny_config20(), tokenizer1=StubHFTokenizer(),
            tokenizer2=StubHFTokenizer(), task_type=task_type,
            dtype=jnp.bfloat16,
        )
        p.init_random_params(cast=jnp.bfloat16)
        return p, dict(num_steps=4, h=64, w=64)
    from kandinsky2_tpu import get_kandinsky2

    return get_kandinsky2(task_type=task_type, model_version="2.0"), dict(
        num_steps=100, h=512, w=512
    )


def make_pipe22(small: bool, task_type="text2img"):
    import jax.numpy as jnp

    from kandinsky2_tpu.pipelines.kandinsky2_2 import Kandinsky2_2

    if small:
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from test_pipeline22 import TINY

        p = Kandinsky2_2(
            task_type=task_type, tokenizer=StubBPETokenizer(),
            dtype=jnp.bfloat16, overrides=TINY,
        )
        p.init_random_params(cast=jnp.bfloat16)
        return p, dict(decoder_steps=4, prior_steps=3, h=64, w=64)
    p = Kandinsky2_2(task_type=task_type)
    return p, dict(decoder_steps=50, prior_steps=25, h=768, w=768)


def random_image(size=64, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    return Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8))
