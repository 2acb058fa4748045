"""Pallas TPU flash attention (non-causal, unmasked).

This is the framework's native-kernel tier — the counterpart of the
reference's optional CUDA flash-attn import (kandinsky2/model/unet.py:281-284,
303-332).  It targets the two long-sequence attention sites:

* MoVQ codec spatial attention: single head, d=512, T = (H/8)·(W/8)
  (9216 tokens at 768² — the fp32 logits matrix alone is 340 MB, which this
  kernel never materializes)
* UNet spatial self+cross attention at large resolutions.

Blocked online-softmax: grid (batch·heads, q-blocks, kv-blocks) with the KV
dimension innermost ("arbitrary" semantics) carrying running max/denominator/
accumulator in VMEM scratch.  KV padding is masked with -inf; q padding rows
are sliced off by the wrapper.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, kv_len: int, block_k: int):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    # mask KV padding
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_bhd(q, k, v, block_q: int, block_k: int, interpret: bool):
    """q: [BH, T, d]; k/v: [BH, S, d] -> [BH, T, d]."""
    BH, T, d = q.shape
    S = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    Tp, Sp = qp.shape[1], kp.shape[1]
    grid = (BH, Tp // block_q, Sp // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=S, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Tp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tp * Sp * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=BH * Tp * Sp,
        ),
    )(qp, kp, vp)
    return out[:, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """q: [B, T, H, d]; k/v: [B, S, H, d] -> [B, T, H, d].

    Semantics identical to the XLA reference path in ops/attention.py
    (softmax(q·kᵀ/√d)·v with fp32 accumulation).  Differentiable: the VJP
    recomputes through the XLA reference implementation (flash-speed forward,
    correct training gradients; a Pallas backward kernel is a later
    optimization).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, d = q.shape
    S = k.shape[1]
    to_bhd = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], d)
    bq = min(block_q, max(16, 1 << (T - 1).bit_length()))
    bk = min(block_k, max(16, 1 << (S - 1).bit_length()))
    out = _flash_bhd(to_bhd(q), to_bhd(k), to_bhd(v), bq, bk, interpret)
    return out.reshape(B, H, T, d).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    return flash_attention(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(block_q, block_k, interpret, residuals, g):
    from .attention import _xla_attention

    q, k, v = residuals
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
