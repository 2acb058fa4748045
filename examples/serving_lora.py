"""Serving with LoRA hot-swap: two adapters + base model served from ONE
GenerationServer at base-model speed (adapters are folded into the kernels
on switch — merge_lora — so the compiled executable is reused; reference
applies diffusers LoRA attention processors at runtime instead,
notebooks/lora_decoder.ipynb).

    python examples/serving_lora.py --small
"""
import time

import jax
import numpy as np
from common import argparser, make_pipe21

args = argparser().parse_args()
pipe, kw = make_pipe21(args.small)

from kandinsky2_tpu.models.lora import init_lora
from kandinsky2_tpu.serving import GenerationServer

server = GenerationServer(pipe, max_batch=2, batch_window_s=0.1)

# two "styles": same targets, different factors (init_lora zero-inits `up`
# => identity; perturb so the adapters actually bite on random weights)
base_factors = init_lora(pipe.params["unet"], jax.random.PRNGKey(0), rank=4)
style_a = {p: {"down": f["down"], "up": f["up"] + 2.0}
           for p, f in base_factors.items()}
style_b = {p: {"down": f["down"], "up": f["up"] - 2.0}
           for p, f in base_factors.items()}
server.attach_lora("style-a", style_a)
server.attach_lora("style-b", style_b, scale=0.5)
print(f"attached 2 adapters over {len(base_factors)} kernels")

server.start()
try:
    t0 = time.time()
    futs = {
        "base": server.submit(args.prompt, **kw),
        "style-a": server.submit(args.prompt, lora="style-a", **kw),
        "style-b": server.submit(args.prompt, lora="style-b", **kw),
    }
    outs = {k: np.asarray(f.result(timeout=1800)[0], np.float32)
            for k, f in futs.items()}
    print(f"3 variants in {time.time() - t0:.1f}s; "
          f"stats: {server.stats()}")
finally:
    server.stop()

for a, b in [("base", "style-a"), ("style-a", "style-b")]:
    d = np.abs(outs[a] - outs[b]).max()
    print(f"max|{a} - {b}| = {d:.1f}")
    assert d > 0, "adapters must change the output"
print("ok")
