#!/usr/bin/env python
"""Capture a per-op device-time table for one hot stage of the 2.1 or 2.2
pipeline (random weights, bench.py shapes) — the measurement loop behind
every r5 kernel decision.

Usage:
    python tools/trace_stage.py unet_step   [--res 768]  [--top 40]
    python tools/trace_stage.py movq_decode [--res 768]  [--top 40]
    python tools/trace_stage.py unet22_step --res 1024x768 --controlnet

Builds the stage exactly as kandinsky2_tpu/profiling.py does (same shapes,
same jit boundaries), warms it up, traces `--iters` calls with
jax.profiler.trace, and prints the aggregated (opcode, shape) table from
tools/xplane_op_table.py plus the fraction of device time per op class.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["unet_step", "movq_decode",
                                      "prior_step", "unet22_step",
                                      "movq22_decode"])
    ap.add_argument("--res", default="768")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--controlnet", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/stage_trace")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    if "x" in args.res:
        w, h = (int(v) for v in args.res.split("x"))
    else:
        w = h = int(args.res)

    from bench import stub_tokenizers
    from kandinsky2_tpu.utils import get_new_h_w

    key = jax.random.PRNGKey(0)
    new_h, new_w = get_new_h_w(h, w)
    B = 1

    if args.stage in ("unet22_step", "movq22_decode"):
        from kandinsky2_tpu.pipelines.kandinsky2_2 import Kandinsky2_2

        tok = stub_tokenizers()[1]
        pipe = Kandinsky2_2(
            tokenizer=tok, dtype=jnp.bfloat16,
            task_type="controlnet" if args.controlnet else "text2img")
        pipe.init_random_params(cast=jnp.bfloat16)
        from kandinsky2_tpu.pipelines.kandinsky2_2 import get_new_h_w_64

        h64, w64 = get_new_h_w_64(h, w)
        lat_h, lat_w = h64 // 8, w64 // 8
        unet, params, dt = pipe.unet, pipe.params, pipe.dtype
        if args.stage == "unet22_step":
            image_embeds = jnp.zeros((2 * B, unet.encoder_hid_dim), dt)
            kw = {}
            if args.controlnet:
                kw["hint"] = jnp.zeros((2 * B, h64, w64, 3), jnp.float32)
            enc_fn = jax.jit(lambda p, e: unet.apply(
                {"params": p}, e, method=type(unet).encode_conditioning,
                **kw))
            encoder_states, aug_emb, hint_latent = enc_fn(
                params["unet"], image_embeds)
            in_ch = unet.in_channels - (4 if args.controlnet else 0)
            x2 = jax.random.normal(key, (2 * B, lat_h, lat_w, in_ch),
                                   jnp.float32)
            t2 = jnp.zeros((2 * B,), jnp.float32)
            fn = jax.jit(lambda p, x, t, es, ae, hl: unet.apply(
                {"params": p}, x, t, es, ae, hl,
                method=type(unet).denoise))
            fa = (params["unet"], x2, t2, encoder_states, aug_emb,
                  hint_latent)
        else:
            lat = jax.random.normal(key, (B, lat_h, lat_w, 4),
                                    jnp.float32).astype(dt)
            fn = jax.jit(lambda p, z: pipe.movq.apply(
                {"params": p}, z, method=type(pipe.movq).decode))
            fa = (params["movq"], lat)
    else:
        from kandinsky2_tpu.configs import CONFIG_2_1, deep_copy_config
        from kandinsky2_tpu.pipelines import Kandinsky2_1

        tok1, tok2 = stub_tokenizers()
        cfg = deep_copy_config(CONFIG_2_1)
        pipe = Kandinsky2_1(cfg, tokenizer1=tok1, tokenizer2=tok2,
                            dtype=jnp.bfloat16)
        pipe.init_random_params(cast=jnp.bfloat16)
        mc = cfg["model_config"]
        unet, params = pipe.unet, pipe.params
        if args.stage == "unet_step":
            full_emb = jnp.zeros((2 * B, 77, mc["text_encoder_in_dim1"]),
                                 pipe.dtype)
            pooled = jnp.zeros((2 * B, mc["text_encoder_in_dim2"]), pipe.dtype)
            image_emb = jnp.zeros((2 * B, mc["image_encoder_in_dim"]),
                                  pipe.dtype)
            xf_proj, xf_out = jax.jit(
                lambda p, a, b, c: unet.apply(
                    {"params": p}, a, b, c,
                    method=type(unet).encode_conditioning)
            )(params["unet"], full_emb, pooled, image_emb)
            x2 = jax.random.normal(
                key, (2 * B, new_h, new_w, mc["in_channels"]), jnp.float32)
            t2 = jnp.zeros((2 * B,), jnp.float32)
            fn = jax.jit(lambda p, x, t, a, b: unet.apply(
                {"params": p}, x, t, a, b, method=type(unet).denoise))
            fa = (params["unet"], x2, t2, xf_proj, xf_out)
        elif args.stage == "movq_decode":
            lat = jax.random.normal(key, (B, new_h, new_w, 4),
                                    jnp.float32).astype(pipe.dtype)
            fn = jax.jit(lambda p, z: pipe.movq.apply(
                {"params": p}, z, method=type(pipe.movq).decode))
            fa = (params["movq"], lat)
        else:  # prior_step
            hp = cfg["prior"]["params"]["model"]["hparams"]
            xp = jax.random.normal(key, (2 * B, hp["clip_dim"]), jnp.float32)
            tp = jnp.zeros((2 * B,), jnp.float32)
            feat = jnp.zeros((2 * B, hp["clip_dim"]), pipe.dtype)
            seq = jnp.zeros((2 * B, hp["text_ctx"], hp["clip_xf_width"]),
                            pipe.dtype)
            mask = jnp.ones((2 * B, hp["text_ctx"]), bool)
            fn = jax.jit(lambda p, x, t, f, s, m: pipe.prior.apply(
                {"params": p}, x, t, text_emb=f, text_enc=s, mask=m))
            fa = (params["prior"], xp, tp, feat, seq, mask)

    # warm up (compile) + steady-state wall
    r = fn(*fa)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(5):
        r = fn(*fa)
    jax.block_until_ready(r)
    wall = (time.time() - t0) / 5
    print(f"# {args.stage} @ {w}x{h}: steady wall {wall*1e3:.2f} ms")

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            r = fn(*fa)
        jax.block_until_ready(r)

    from xplane_op_table import agg_table

    table = agg_table(args.trace_dir)  # {(opcode, shape): (us, count)}
    rows = sorted(table.items(), key=lambda kv: -kv[1][0])
    total = sum(us for us, _ in table.values())
    print(f"# total device time {total/1e3/args.iters:.2f} ms/iter over "
          f"{args.iters} iters")
    by_class = {}
    for (opcode, _shape), (us, _c) in table.items():
        by_class[opcode] = by_class.get(opcode, 0.0) + us
    print("\n== by opcode ==")
    for cls, us in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3/args.iters:9.3f} ms  {100*us/total:5.1f}%  {cls}")
    print(f"\n== top {args.top} (opcode, shape) ==")
    for (opcode, shape), (us, cnt) in rows[:args.top]:
        print(f"{us/1e3/args.iters:9.3f} ms  {100*us/total:5.1f}%  "
              f"x{cnt:<5d} {opcode} {shape}")


if __name__ == "__main__":
    main()
