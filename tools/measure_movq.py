#!/usr/bin/env python
"""Measure the 768² MoVQ decode wall + HLO traffic in isolation — the
iterate-loop companion to bench.py --profile (which re-profiles every
stage).  Uses profiling._measure (host-fetch sync: block_until_ready lies
through the tunneled client) and prints the stage_report row plus the top
per-buffer traffic terms from the compiled HLO.

Usage: python tools/measure_movq.py [--res 768] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from bench import stub_tokenizers
    from kandinsky2_tpu.configs import CONFIG_2_1, deep_copy_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1
    from kandinsky2_tpu.profiling import (
        _chip_peaks,
        _measure,
        hlo_traffic,
        stage_report,
    )
    from kandinsky2_tpu.utils import get_new_h_w

    new_h, new_w = get_new_h_w(args.res, args.res)
    tok1, tok2 = stub_tokenizers()
    cfg = deep_copy_config(CONFIG_2_1)
    pipe = Kandinsky2_1(cfg, tokenizer1=tok1, tokenizer2=tok2,
                        dtype=jnp.bfloat16)
    pipe.init_random_params(cast=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (1, new_h, new_w, 4),
                            jnp.float32).astype(pipe.dtype)
    jfn = jax.jit(lambda p, z: pipe.movq.apply(
        {"params": p}, z, method=type(pipe.movq).decode))
    fa = (pipe.params["movq"], lat)

    lowered = jfn.lower(*fa)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    tr = hlo_traffic(hlo)
    stats = _measure(jfn, fa, args.iters)
    stats.update(tr)
    peak_flops, peak_bw = _chip_peaks()
    rep = stage_report({"movq_decode": stats}, peak_flops, peak_bw)
    import json

    print(json.dumps(rep["movq_decode"], indent=1))


if __name__ == "__main__":
    main()
