"""Measure batched-serving throughput on the real TPU: N DISTINCT prompts
served sequentially (batch 1 each) vs coalesced into one compiled program by
GenerationServer (VERDICT round-1 item 6's 'TPU-measured throughput gain').

    python examples/serving_bench.py [--small] [--n 4] [--steps 20] [--res 256]
"""
import json
import time

from common import argparser, make_pipe21

args = argparser(n="4", sampler="").parse_args()
n = int(args.n)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from kandinsky2_tpu.serving import GenerationServer

if args.small:
    pipe, kw = make_pipe21(True)
else:
    # full-size random weights (same build as bench.py; no checkpoints or
    # network needed — serving timing is weight-agnostic)
    import jax.numpy as jnp

    from bench import stub_tokenizers
    from kandinsky2_tpu.configs import CONFIG_2_1
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    tok1, tok2 = stub_tokenizers()
    pipe = Kandinsky2_1(config=CONFIG_2_1, tokenizer1=tok1, tokenizer2=tok2,
                        dtype=jnp.bfloat16)
    pipe.init_random_params(cast=jnp.bfloat16)
    kw = dict(num_steps=50, h=768, w=768, sampler="ddim_sampler",
              prior_steps="25")
if args.steps:
    kw["num_steps"] = args.steps
if args.res:
    kw["h"] = kw["w"] = args.res
if args.sampler:
    kw["sampler"] = args.sampler
prompts = [f"a photo of a {x}" for x in
           ["red cat", "blue dog", "green bird", "yellow fish",
            "purple horse", "orange fox", "black swan", "white wolf"]][:n]

server = GenerationServer(pipe, max_batch=n, batch_window_s=0.2)
print("warmup (compiles batch buckets)...")
server.warmup([{k: v for k, v in kw.items()}])

# sequential: one program call per prompt (the pre-batching behavior)
t0 = time.time()
for p in prompts:
    pipe.generate_text2img([p], batch_size=1, **kw)
seq_s = time.time() - t0

# coalesced: all prompts in one program via the server
server.start()
t0 = time.time()
futs = [server.submit(p, **kw) for p in prompts]
for f in futs:
    f.result(timeout=1200)
batched_s = time.time() - t0
server.stop()

print(json.dumps({
    "metric": f"serving throughput {n} distinct prompts "
              f"{kw['h']}^2/{kw['num_steps']}-step",
    "sequential_s": round(seq_s, 3),
    "coalesced_s": round(batched_s, 3),
    "speedup": round(seq_s / batched_s, 3),
}))
