"""End-to-end benchmark: Kandinsky 2.1 text2img at 768², 50 decoder steps
(DDIM) + 25 prior steps + MoVQ decode, batch 1, bf16, real model sizes
(prior 1B, UNet 1.22B, MoVQ 67M, XLM-R 560M, CLIP ViT-L 427M), random weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup vs the 4 s/image BASELINE.json target (>1 beats it).

Usage: python bench.py [--small] [--steps N] [--res R]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def stub_tokenizers():
    class HFTok:
        def __call__(self, texts, max_length=77, **kw):
            n = len(texts)
            ids = np.ones((n, max_length), np.int32)
            mask = np.zeros((n, max_length), np.int32)
            for i, t in enumerate(texts):
                L = min(max_length, 2 + len(t.split()))
                ids[i, :L] = 5 + (np.arange(L) % 1000)
                mask[i, :L] = 1
            return {"input_ids": ids, "attention_mask": mask}

    class BPETok:
        def padded_tokens_and_mask(self, texts, ctx):
            n = len(texts)
            toks = np.zeros((n, ctx), np.int32)
            mask = np.zeros((n, ctx), bool)
            for i, t in enumerate(texts):
                L = min(ctx, 2 + len(t))
                toks[i, :L] = 1 + (np.arange(L) % 49000)
                mask[i, :L] = True
            return toks, mask

    return HFTok(), BPETok()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny config smoke run")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--res", default="768", metavar="R|WxH",
                    help="square size (768) or WxH (1024x768)")
    ap.add_argument("--sampler", default="ddim_sampler")
    ap.add_argument("--version", default="2.1", choices=["2.1", "2.2"])
    ap.add_argument("--task", default="text2img",
                    choices=["text2img", "controlnet"],
                    help="controlnet (2.2 only): BASELINE config 5's "
                    "depth-hint decoder")
    ap.add_argument("--lora", action="store_true",
                    help="merge a random rank-4 LoRA into the decoder before "
                    "measuring (models/lora.merge_lora — folded kernels, the "
                    "serving path; zero runtime branches)")
    ap.add_argument("--profile", action="store_true",
                    help="per-stage wall time + XLA FLOPs + MFU vs the "
                    "chip's bf16 peak; writes BENCH_PROFILE.json")
    ap.add_argument("--batch", type=int, default=1, metavar="B",
                    help="images per program call; sec/image divides by B "
                    "(throughput mode: amortizes the text/prior stages and "
                    "fills the MXU at low resolutions)")
    ap.add_argument("--turbo", type=int, default=1, metavar="K",
                    help="DeepCache turbo interval (1 = exact parity path)")
    ap.add_argument("--weights", default=None, metavar="DIR",
                    help="build from real checkpoints cached in DIR "
                    "(layout of weights/hub.fetch_2_1); random weights + "
                    "stub tokenizers otherwise")
    ap.add_argument("--tp", type=int, default=1, metavar="N",
                    help="tensor-parallel: shard the pipeline over an N-way "
                    "model mesh axis (pipe.shard) before measuring — for "
                    "multi-chip hardware (needs >= N devices)")
    ap.add_argument("--norm", default="full", choices=["full", "stats"],
                    help="GroupNorm precision policy (models/layers."
                    "set_norm_precision): 'full' normalizes in fp32 "
                    "(reference parity), 'stats' keeps only mean/var in "
                    "fp32 and normalizes in bf16 (opt-in, ~5%% faster "
                    "UNet step)")
    ap.add_argument("--norm-impl", default="auto",
                    choices=["auto", "pallas", "xla"],
                    help="GroupNorm lowering (models/layers.set_norm_impl): "
                    "'auto'/'xla' = barriered single-pass XLA lowering "
                    "(measured fastest); 'pallas' = fused kernels "
                    "(ops/group_norm.py, lower traffic but more launches) "
                    "for A/B")
    ap.add_argument("--stack", action="store_true",
                    help="preset: all opt-in levers stacked (2.1 only) — "
                    "karras 15 decoder steps + dpmpp-10 prior + turbo 3; "
                    "conflicts with --sampler/--steps/--turbo/--weights/--small")
    args = ap.parse_args()
    if args.stack:
        if args.weights or args.small:
            sys.exit("--stack measures the random-weights full-size config; "
                     "it cannot combine with --weights or --small")
        if (args.sampler != "ddim_sampler" or args.steps != 50
                or args.turbo != 1):
            sys.exit("--stack sets sampler/steps/turbo itself; drop the "
                     "conflicting flags")
        args.steps, args.turbo = 15, 3
        args.sampler = ("dpmpp_karras_sampler" if args.version == "2.1"
                        else "dpmpp_karras")

    if "x" in str(args.res):
        res_w, res_h = (int(v) for v in str(args.res).split("x"))
    else:
        res_w = res_h = int(args.res)
    if args.task == "controlnet" and args.version != "2.2":
        sys.exit("--task controlnet requires --version 2.2")
    if args.lora and args.version != "2.2":
        sys.exit("--lora measures the 2.2 decoder (BASELINE config 5)")

    import jax

    # Persistent compilation cache: compiles through the tunneled TPU are
    # slow (minutes); cached executables make reruns start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    if args.norm != "full":
        from kandinsky2_tpu.models.layers import set_norm_precision

        set_norm_precision(args.norm)
    if args.norm_impl != "auto":
        from kandinsky2_tpu.models.layers import set_norm_impl

        set_norm_impl(args.norm_impl)

    from kandinsky2_tpu.configs import CONFIG_2_1, deep_copy_config
    from kandinsky2_tpu.pipelines import Kandinsky2_1

    cfg = deep_copy_config(CONFIG_2_1)
    if args.small:
        mc = cfg["model_config"]
        mc.update(
            num_channels=64, num_res_blocks=1, channel_mult="1,2",
            attention_resolutions="32", num_head_channels=32, model_dim=64,
            text_encoder_in_dim1=48, text_encoder_in_dim2=64,
            image_encoder_in_dim=64, num_image_embs=2,
        )
        cfg["prior"]["params"]["model"]["hparams"].update(
            text_ctx=8, xf_width=128, xf_layers=2, xf_heads=4, clip_dim=64,
            clip_xf_width=64,
        )
        cfg["clip_text_params"] = dict(
            vocab_size=256, context_length=8, width=64, layers=2, heads=4,
            embed_dim=64,
        )
        cfg["clip_vision_params"] = dict(
            image_size=28, patch_size=14, width=64, layers=2, heads=4,
            embed_dim=64,
        )
        cfg["clip_image_size"] = 28
        cfg["text_enc_params"].update(
            in_features=48, out_features=64, layers=2, heads=4,
            intermediate=96, vocab_size=256, max_positions=40,
        )
        ie = cfg["image_enc_params"]["params"]
        ie["n_embed"] = 64
        ie["ddconfig"].update(
            ch=32, ch_mult=[1, 1, 1, 2], num_res_blocks=1,
            attn_resolutions=[8], resolution=64,
        )

    tok1, tok2 = stub_tokenizers()
    if args.version == "2.2":
        from kandinsky2_tpu.pipelines.kandinsky2_2 import Kandinsky2_2

        tok22 = stub_tokenizers()[1]
        overrides = None
        if args.small:
            overrides = dict(
                image_encoder=dict(image_size=28, patch_size=14, hidden=32,
                                   layers=2, heads=4, intermediate=64,
                                   projection_dim=32),
                text_encoder=dict(vocab_size=256, context_length=8, hidden=32,
                                  layers=2, heads=4, intermediate=64,
                                  projection_dim=32, eot_token_id=255),
                prior=dict(num_attention_heads=4, attention_head_dim=16,
                           num_layers=2, embedding_dim=32, num_embeddings=8),
                unet=dict(block_out_channels=(32, 64), layers_per_block=1,
                          attention_head_dim=32, cross_attention_dim=32,
                          encoder_hid_dim=32, num_image_tokens=2),
                movq=dict(z_channels=4, embed_dim=4, n_embed=64, ch=32,
                          ch_mult=(1, 1, 1, 2), num_res_blocks=1,
                          attn_resolutions=(8,), resolution=64),
            )
        pipe = Kandinsky2_2(tokenizer=tok22, dtype=jnp.bfloat16,
                            overrides=overrides, task_type=args.task)
        t0 = time.time()
        pipe.init_random_params(cast=jnp.bfloat16)
        print(f"# init {time.time()-t0:.1f}s on {jax.devices()[0]}",
              file=sys.stderr)
        if args.lora:
            # BASELINE config 5 serving path: rank-4 LoRA FOLDED into the
            # base kernels (W += down@up) — the jitted graph is unchanged,
            # so adapted weights run at exactly base-model speed
            from kandinsky2_tpu.models.lora import init_lora, merge_lora

            loras = init_lora(pipe.params["unet"], jax.random.PRNGKey(0),
                              rank=4)
            pipe.params["unet"] = merge_lora(pipe.params["unet"], loras)
            print(f"# merged rank-4 LoRA over {len(loras)} kernels "
                  "(folded; zero runtime branches)", file=sys.stderr)
        # 2.2 decoder sampler names; reject names with no 2.2 equivalent
        sampler22 = {
            "ddim_sampler": "ddpm", "ddpm": "ddpm",
            "dpmpp_sampler": "dpmpp", "dpmpp": "dpmpp",
            "dpmpp_karras_sampler": "dpmpp_karras",
            "dpmpp_karras": "dpmpp_karras",
        }.get(args.sampler)
        if sampler22 is None:
            sys.exit(f"--sampler {args.sampler} has no 2.2 decoder equivalent")
        kw = dict(
            decoder_steps=args.steps, batch_size=args.batch, h=res_h, w=res_w,
            prior_steps=(10 if args.stack else 25) if not args.small else 3,
            decoder_guidance_scale=4, prior_guidance_scale=4,
            turbo_interval=args.turbo, sampler=sampler22,
            prior_sampler="dpmpp" if args.stack else "ddpm",
        )
        if args.task == "controlnet":
            kw.pop("prior_sampler")  # controlnet entry has no prior_sampler
            if args.turbo > 1:
                sys.exit("--turbo with --task controlnet is not wired in "
                         "this bench")
            kw.pop("turbo_interval")
    elif args.weights:
        # real-weights mode: exercises the true host tokenizers and trained
        # activation ranges in bf16 (gated on a pre-fetched cache dir)
        import os

        from kandinsky2_tpu.weights.hub import fetch_2_1
        from kandinsky2_tpu.weights.load_kandinsky import build_kandinsky21

        if not os.path.isdir(args.weights):
            sys.exit(f"--weights dir {args.weights} does not exist")
        t0 = time.time()
        paths = fetch_2_1(os.path.dirname(args.weights.rstrip("/"))
                          if args.weights.rstrip("/").endswith("2_1")
                          else args.weights)
        pipe = build_kandinsky21(paths, dtype=jnp.bfloat16)
        print(f"# loaded real checkpoints in {time.time()-t0:.1f}s",
              file=sys.stderr)
        kw = dict(
            num_steps=args.steps, batch_size=args.batch, h=res_h, w=res_w,
            sampler=args.sampler, prior_steps="25",
            guidance_scale=4, turbo_interval=args.turbo,
        )
    else:
        pipe = Kandinsky2_1(
            config=cfg, tokenizer1=tok1, tokenizer2=tok2, dtype=jnp.bfloat16
        )
        t0 = time.time()
        pipe.init_random_params(cast=jnp.bfloat16)
        print(f"# init {time.time()-t0:.1f}s on {jax.devices()[0]}", file=sys.stderr)

        kw = dict(
            num_steps=args.steps, batch_size=args.batch, h=res_h, w=res_w,
            sampler=args.sampler,
            prior_steps=("dpmpp10" if args.stack else "25")
            if not args.small else "5",
            guidance_scale=4, turbo_interval=args.turbo,
        )
    if args.tp > 1:
        import jax as _jax

        if len(_jax.devices()) < args.tp:
            sys.exit(f"--tp {args.tp} needs >= {args.tp} devices, "
                     f"have {len(_jax.devices())}")
        pipe.shard(model_parallel=args.tp,
                   min_size=64 if args.small else 1024)

    if args.profile:
        from kandinsky2_tpu.profiling import profile_21, profile_22

        if args.version == "2.2":
            prof = profile_22(
                pipe, h=res_h, w=res_w, batch=args.batch, steps=args.steps,
                prior_steps=kw.get("prior_steps", 25), iters=10,
                hint=(args.task == "controlnet"),
            )
        else:
            ps = str(kw.get("prior_steps", "25"))
            prof = profile_21(
                pipe, h=res_h, w=res_w, batch=args.batch, steps=args.steps,
                prior_steps=int("".join(c for c in ps if c.isdigit()) or 25),
                iters=10,
            )
        prof["device"] = str(jax.devices()[0])
        prof["lora_merged"] = bool(args.lora)
        # one artifact, one entry per profiled configuration (family plus
        # resolution when off the 768² default), accumulated across runs
        key = prof["family"]
        if (res_w, res_h) != (768, 768):
            key += f"@{res_w}x{res_h}"
        if args.small:  # smoke runs must not overwrite real-config entries
            print(json.dumps({key + " [tiny-config smoke]": prof}))
            return
        try:
            with open("BENCH_PROFILE.json") as f:
                book = json.load(f)
            if "stages" in book:  # pre-merge flat format
                book = {book.get("family", "2.1"): book}
        except (OSError, ValueError):
            book = {}
        book[key] = prof
        with open("BENCH_PROFILE.json", "w") as f:
            json.dump(book, f, indent=2)
        print(json.dumps({key: prof}))
        return

    if args.task == "controlnet":
        rng = np.random.RandomState(0)
        hint = rng.rand(res_h, res_w, 3).astype(np.float32)
        gen = lambda prompt: pipe.generate_controlnet(prompt, hint=hint, **kw)
    else:
        gen = lambda prompt: pipe.generate_text2img(prompt, **kw)

    t0 = time.time()
    gen("a portrait of a cosmonaut riding a horse")
    compile_time = time.time() - t0
    print(f"# first call (compile+run) {compile_time:.1f}s", file=sys.stderr)

    runs = []
    for _ in range(3 if not args.small else 2):
        t0 = time.time()
        gen("red sand dunes under a violet sky")
        runs.append(time.time() - t0)
    value = float(min(runs)) / args.batch
    print(f"# steady-state runs: {[f'{r:.3f}' for r in runs]}", file=sys.stderr)

    target = 4.0
    print(
        json.dumps(
            {
                "metric": f"sec/image "
                + (f"{res_w}x{res_h}" if res_w != res_h else f"{res_h}^2")
                + f" {args.steps}-step "
                f"Kandinsky-{args.version} {args.task}"
                + ("+LoRA(folded)" if args.lora else "")
                + " (prior+UNet+MoVQ e2e, bf16, "
                + (f"TP={args.tp})" if args.tp > 1 else "1 chip)")
                + (" [tiny-config smoke]" if args.small else "")
                + (f" sampler={args.sampler}"
                   if args.sampler != "ddim_sampler" else "")
                + (" prior=dpmpp10" if args.stack else "")
                + (f" turbo={args.turbo}" if args.turbo > 1 else "")
                + (f" batch={args.batch}" if args.batch > 1 else ""),
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(target / value, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
