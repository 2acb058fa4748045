"""Attention microbench: XLA einsum vs Pallas flash, forward and fwd+bwd,
across sequence length and batch*heads on the real chip.

This is the in-tree evidence behind the auto-routing thresholds in
kandinsky2_tpu/ops/attention.py and the README flash claims.  Emits one JSON
line per (shape, direction) and writes BENCH_ATTENTION.json.

Usage: python bench_attention.py [--quick]
"""

import argparse
import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402

from kandinsky2_tpu.ops.attention import _xla_attention  # noqa: E402
from kandinsky2_tpu.ops.flash_attention import flash_attention  # noqa: E402

# the attention sites that exist in the real pipelines:
#   UNet 2.1 spatial self-attn at 768²: T in {2304, 9216/4=...}; B*H = 2*?
#   MoVQ codec at 768²: T=9216, single 512-d head, B*H=1..2
#   training batches: larger B*H
CASES = [
    # (label, B, T, H, d)
    ("unet_768_l3", 2, 576, 8, 64),
    ("unet_768_l2", 2, 2304, 8, 64),
    ("unet_1024_l2", 2, 4096, 8, 64),
    ("movq_768", 1, 9216, 1, 512),
    ("movq_1024", 1, 16384, 1, 512),
    ("train_bh32", 4, 2304, 8, 64),
    ("train_long", 4, 4096, 8, 64),
]


CHAIN = 16  # iterations fused into one program to amortize dispatch latency


def sync(x):
    # axon: block_until_ready lies; a host transfer is the only real fence
    return float(jnp.asarray(x, jnp.float32).mean())


def chain(step):
    """Apply ``step`` CHAIN times with a data dependency, renormalizing so
    values stay sane; one program -> per-op time = total / CHAIN."""

    @jax.jit
    def run(q, k, v):
        def body(_, c):
            o = step(c, k, v).astype(jnp.float32)
            o = o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)
            return o.astype(q.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, q)

    return run


def timeit(step, *args, reps=3):
    fn = chain(step)
    sync(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cases = CASES[:4] if args.quick else CASES

    xla_f = _xla_attention
    flash_f = lambda q, k, v: flash_attention(q, k, v)
    xla_g = jax.grad(
        lambda q, k, v: _xla_attention(q, k, v).astype(jnp.float32).sum(),
        argnums=0,
    )
    flash_g = jax.grad(
        lambda q, k, v: flash_attention(q, k, v).astype(jnp.float32).sum(),
        argnums=0,
    )

    rows = []
    for label, B, T, H, d in cases:
        rng = np.random.RandomState(0)
        mk = lambda: jnp.asarray(
            rng.randn(B, T, H, d).astype(np.float32) * 0.2, dtype
        )
        q, k, v = mk(), mk(), mk()
        row = {
            "case": label, "B": B, "T": T, "H": H, "d": d, "BH": B * H,
            "dtype": args.dtype,
            "fwd_xla_ms": timeit(xla_f, q, k, v) * 1e3,
            "fwd_flash_ms": timeit(flash_f, q, k, v) * 1e3,
            "bwd_xla_ms": timeit(xla_g, q, k, v) * 1e3,
            "bwd_flash_ms": timeit(flash_g, q, k, v) * 1e3,
        }
        row["fwd_speedup"] = row["fwd_xla_ms"] / row["fwd_flash_ms"]
        row["bwd_speedup"] = row["bwd_xla_ms"] / row["bwd_flash_ms"]
        print(json.dumps(row), flush=True)
        rows.append(row)

    with open("BENCH_ATTENTION.json", "w") as f:
        json.dump(
            {"device": str(jax.devices()[0]), "rows": rows}, f, indent=1
        )


if __name__ == "__main__":
    main()
