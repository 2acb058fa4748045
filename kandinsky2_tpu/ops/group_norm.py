"""Fused Pallas GroupNorm for NHWC activations.

Why this exists: the UNet/MoVQ hot loops are memory-bound, and XLA:TPU lowers
``(x - mean) * inv * scale + bias`` with per-batch [B, C] coefficients into a
MATERIALIZED fp32 broadcast of the coefficients to the full activation shape
plus a relayout copy on both sides (measured: ~15% of the compiled 768² UNet
step's HBM traffic, see BENCH_PROFILE.json).  The fused kernels below do what
the compiler won't:

* ``_moments_kernel``  — one pass over x accumulating per-channel Σx and Σx²
  in fp32 (sibling reduction, accumulator lives in the revisited output
  block in VMEM).
* tiny [B, C] XLA glue — group-combine the moments, fold GroupNorm's
  scale/bias AND an optional FiLM (scale-shift) conditioning into per-channel
  ``a``/``b`` so the whole normalize+condition chain is one multiply-add.
* ``_apply_kernel``    — one pass computing ``silu?(x·a + b)`` in fp32 with
  the cast back to the activation dtype inside the kernel.

Net traffic: 2 reads + 1 write of x at activation precision — the roofline
floor for an exact (two-pass) normalization.  Gradients: ``custom_vjp`` whose
backward differentiates the equivalent XLA formulation (recompute; the
forward saves only the inputs).

Measured verdict (v5e, 768² 2.1 UNet step, BENCH_PROFILE.json method): these
kernels DO hit the traffic floor — 22.9 GB/step vs 33.0 GB for the best XLA
lowering — but lose on wall clock (78.6 ms vs 51.7) because the step contains
~60 norms → ~120 Mosaic launches whose fixed cost exceeds the bandwidth
saved at [2, 96², 384]-scale blocks.  The default path is therefore the
barriered XLA lowering in models/layers.py (the barrier alone recovers most
of the win by keeping coefficient broadcasts out of HBM); this module stays
as an opt-in (``set_norm_impl("pallas")``) for batch/resolution regimes where
per-launch cost amortizes.

Counterpart of reference GroupNorm32 (kandinsky2/model/nn.py:31-37) and the
FiLM application inside ResBlock (kandinsky2/model/unet.py:110-220).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_CAP_BYTES = 2 * 1024 * 1024


def _pick_tn(N: int, C: int, itemsize: int):
    """Largest divisor of N that is a multiple of 8 and keeps one x block
    under the VMEM cap; None if no usable tiling exists."""
    cap = max(8, _VMEM_CAP_BYTES // max(1, C * itemsize))
    best = None
    for tn in range(8, min(N, cap) + 1, 8):
        if N % tn == 0:
            best = tn
    return best


def _moments_kernel(x_ref, s1_ref, s2_ref):
    xb = x_ref[0].astype(jnp.float32)  # [TN, C]
    p1 = jnp.sum(xb, axis=0, keepdims=True)
    p2 = jnp.sum(xb * xb, axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        s1_ref[0] = p1
        s2_ref[0] = p2

    @pl.when(pl.program_id(1) != 0)
    def _():
        s1_ref[0] = s1_ref[0] + p1
        s2_ref[0] = s2_ref[0] + p2


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, swish: float):
    y = x_ref[0].astype(jnp.float32) * a_ref[0] + b_ref[0]
    if swish == 1.0:
        y = y * jax.nn.sigmoid(y)
    elif swish:
        y = y * jax.nn.sigmoid(y * swish)
    o_ref[0] = y.astype(o_ref.dtype)


def _moments(x3, TN, interpret):
    """x3: [B, N, C] -> (Σx, Σx²) each [B, C] fp32, one pass over x.

    The [B, C] accumulators are carried as [B, 1, C] so the (1, 1, C) block's
    trailing dims equal the array dims (TPU last-two-dims tiling rule)."""
    B, N, C = x3.shape
    grid = (B, N // TN)
    out = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TN, C), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * B * N * C, transcendentals=0,
            bytes_accessed=B * N * C * x3.dtype.itemsize,
        ),
        interpret=interpret,
    )(x3)
    return out[0][:, 0], out[1][:, 0]


def _apply(x3, a, b, swish, TN, interpret):
    """y = silu?(x·a + b): one read of x, one write of y."""
    B, N, C = x3.shape
    a = a[:, None]  # [B, 1, C] — see _moments on the tiling rule
    b = b[:, None]
    return pl.pallas_call(
        functools.partial(_apply_kernel, swish=swish),
        grid=(B, N // TN),
        in_specs=[
            pl.BlockSpec((1, TN, C), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, C), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(2 + (4 if swish else 0)) * B * N * C,
            transcendentals=B * N * C if swish else 0,
            bytes_accessed=2 * B * N * C * x3.dtype.itemsize,
        ),
        interpret=interpret,
    )(x3, a, b)


def _coefficients(s1, s2, cnt, scale, bias, fs, fb, g, eps):
    """Group-combine the moments and fold everything affine into per-channel
    a/b — tiny [B, C] math, stays in XLA."""
    B, C = s1.shape
    cs = C // g
    mean_g = s1.reshape(B, g, cs).sum(-1) / cnt  # [B, G]
    ex2_g = s2.reshape(B, g, cs).sum(-1) / cnt
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    inv_c = jnp.repeat(inv_g, cs, axis=-1)  # [B, C]
    mean_c = jnp.repeat(mean_g, cs, axis=-1)
    a = inv_c * scale
    b = bias - mean_c * a
    if fs is not None:
        m = 1.0 + fs.astype(jnp.float32)
        a = a * m
        b = b * m + fb.astype(jnp.float32)
    return a, b


def _xla_reference(x, scale, bias, fs, fb, g, eps, swish):
    """Pure-XLA equivalent (same math, fp32) — the VJP target and the
    numerical oracle for the kernels."""
    B, C = x.shape[0], x.shape[-1]
    red = tuple(range(1, x.ndim - 1))
    n = 1
    for i in red:
        n *= x.shape[i]
    x32 = x.astype(jnp.float32)
    s1 = x32.sum(axis=red)
    s2 = (x32 * x32).sum(axis=red)
    a, b = _coefficients(
        s1, s2, jnp.float32(n * (C // g)), scale, bias, fs, fb, g, eps
    )
    bshape = (B,) + (1,) * len(red) + (C,)
    y = x32 * a.reshape(bshape) + b.reshape(bshape)
    if swish == 1.0:
        y = jax.nn.silu(y)
    elif swish:
        y = y * jax.nn.sigmoid(y * swish)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused(g: int, eps: float, swish: float, has_film: bool,
                interpret: bool):
    """custom_vjp instance per static config: Pallas forward, XLA-recompute
    backward."""

    def fwd_impl(x, scale, bias, fs, fb):
        B, C = x.shape[0], x.shape[-1]
        N = 1
        for d in x.shape[1:-1]:
            N *= d
        x3 = x.reshape(B, N, C)
        TN = _pick_tn(N, C, x.dtype.itemsize)
        s1, s2 = _moments(x3, TN, interpret)
        cnt = jnp.float32(N * (C // g))
        a, b = _coefficients(s1, s2, cnt, scale, bias, fs, fb, g, eps)
        y = _apply(x3, a, b, swish, TN, interpret)
        return y.reshape(x.shape)

    if has_film:
        @jax.custom_vjp
        def fused(x, scale, bias, fs, fb):
            return fwd_impl(x, scale, bias, fs, fb)

        def fused_fwd(x, scale, bias, fs, fb):
            return fused(x, scale, bias, fs, fb), (x, scale, bias, fs, fb)

        def fused_bwd(res, gy):
            x, scale, bias, fs, fb = res
            _, vjp = jax.vjp(
                lambda *args: _xla_reference(*args, g=g, eps=eps,
                                             swish=swish),
                x, scale, bias, fs, fb,
            )
            return vjp(gy)
    else:
        @jax.custom_vjp
        def fused(x, scale, bias):
            return fwd_impl(x, scale, bias, None, None)

        def fused_fwd(x, scale, bias):
            return fused(x, scale, bias), (x, scale, bias)

        def fused_bwd(res, gy):
            x, scale, bias = res
            _, vjp = jax.vjp(
                lambda xx, sc, bi: _xla_reference(xx, sc, bi, None, None,
                                                  g=g, eps=eps, swish=swish),
                x, scale, bias,
            )
            return vjp(gy)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def pallas_group_norm_ok(x, num_groups: int) -> bool:
    """Static routing predicate: shapes this kernel pair handles."""
    if x.ndim < 3:
        return False
    C = x.shape[-1]
    if C % num_groups or C % 128:
        return False
    N = 1
    for d in x.shape[1:-1]:
        N *= d
    if N < 8:
        return False
    return _pick_tn(N, C, jnp.dtype(x.dtype).itemsize) is not None


def pallas_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    swish: float = 0.0,
    film: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """GroupNorm(+FiLM)(+SiLU) fused: ``silu?(norm(x)·scale+bias folded with
    (1+fs)·~+fb applied per channel)``.  x: [B, ..., C]; film arrays [B, C].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    fused = _make_fused(num_groups, float(eps), float(swish),
                        film is not None, bool(interpret))
    if film is not None:
        return fused(x, scale, bias, film[0], film[1])
    return fused(x, scale, bias)
