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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, kv_len: int, block_k: int):
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
        # log-sum-exp residual for the backward kernels, broadcast across a
        # 128-lane trailing dim (TPU block layout needs lane-dim >= 128)
        lse_ref[0] = jnp.broadcast_to(
            m_scr[:] + jnp.log(l_scr[:]), lse_ref.shape[1:]
        )


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr, *,
                          scale: float, q_len: int, kv_len: int,
                          block_q: int, block_k: int):
    """Grid (BH, kv-blocks, q-blocks), q innermost: accumulate this KV
    block's dk/dv over all q blocks (standard flash backward with saved
    lse + delta=rowsum(dO*O))."""
    j = pl.program_id(1)
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * block_q
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    valid = (row < q_len) & (col < kv_len)
    p = jnp.where(valid, jnp.exp(s - lse), 0.0)

    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == ni - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_scr, *, scale: float, kv_len: int,
                         block_k: int):
    """Grid (BH, q-blocks, kv-blocks), kv innermost: accumulate this q
    block's dq over all KV blocks."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    p = jnp.where(col < kv_len, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


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
    """q: [BH, T, d]; k/v: [BH, S, d] -> ([BH, T, d], lse [BH, Tp])."""
    BH, T, d = q.shape
    S = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    Tp, Sp = qp.shape[1], kp.shape[1]
    grid = (BH, Tp // block_q, Sp // block_k)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=S, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Tp, d), q.dtype),
            jax.ShapeDtypeStruct((BH, Tp, 128), jnp.float32),
        ),
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
    return out[:, :T], lse


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_bwd_bhd(q, k, v, o, lse, g, block_q: int, block_k: int,
                   interpret: bool):
    """Blocked flash backward: q/o/g [BH, T, d], k/v [BH, S, d],
    lse [BH, Tp, 128] -> (dq, dk, dv)."""
    BH, T, d = q.shape
    S = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    gp = _pad_to(g, 1, block_q)
    Tp, Sp = qp.shape[1], kp.shape[1]
    # delta_i = sum_d dO_i O_i — fused elementwise+reduce, cheap in XLA;
    # broadcast over the 128-lane trailing dim to match the lse layout
    delta = jnp.broadcast_to(
        _pad_to(
            jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1),
            1, block_q,
        )[..., None],
        (BH, Tp, 128),
    )

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0))
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0))
    row_spec = pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, q_len=T, kv_len=S,
            block_q=block_q, block_k=block_k,
        ),
        grid=(BH, Sp // block_k, Tp // block_q),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Sp, d), k.dtype),
            jax.ShapeDtypeStruct((BH, Sp, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * Tp * Sp * d,
            bytes_accessed=2 * (qp.size + kp.size + vp.size) * 4,
            transcendentals=BH * Tp * Sp,
        ),
    )(qp, kp, vp, gp, lse, delta)

    q_spec2 = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    kv_spec2 = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    row_spec2 = pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0))
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, kv_len=S, block_k=block_k
        ),
        grid=(BH, Tp // block_q, Sp // block_k),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Tp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tp * Sp * d,
            bytes_accessed=2 * (qp.size + kp.size + vp.size) * 4,
            transcendentals=BH * Tp * Sp,
        ),
    )(qp, kp, vp, gp, lse, delta)
    return dq[:, :T], dk[:, :S], dv[:, :S]


def _blocks(block_q, block_k, T, S):
    bq = min(block_q, max(16, 1 << (T - 1).bit_length()))
    bk = min(block_k, max(16, 1 << (S - 1).bit_length()))
    return bq, bk


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
    (softmax(q·kᵀ/√d)·v with fp32 accumulation).  Fully Pallas: the forward
    saves per-row log-sum-exp, and the VJP runs blocked dKV/dQ kernels
    (the counterpart of the reference's CUDA flash-attn fwd+bwd,
    kandinsky2/model/unet.py:281-332) — neither direction materializes the
    [T, S] logits matrix.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, d = q.shape
    S = k.shape[1]
    to_bhd = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], d)
    bq, bk = _blocks(block_q, block_k, T, S)
    out, _ = _flash_bhd(to_bhd(q), to_bhd(k), to_bhd(v), bq, bk, interpret)
    return out.reshape(B, H, T, d).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, d = q.shape
    S = k.shape[1]
    to_bhd = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], d)
    bq, bk = _blocks(block_q, block_k, T, S)
    o_bhd, lse = _flash_bhd(to_bhd(q), to_bhd(k), to_bhd(v), bq, bk, interpret)
    out = o_bhd.reshape(B, H, T, d).transpose(0, 2, 1, 3)
    return out, (q, k, v, o_bhd, lse)


def _flash_bwd(block_q, block_k, interpret, residuals, g):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    q, k, v, o_bhd, lse = residuals
    B, T, H, d = q.shape
    S = k.shape[1]
    to_bhd = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], d)
    from_bhd = lambda x, L: x.reshape(B, H, L, d).transpose(0, 2, 1, 3)
    bq, bk = _blocks(block_q, block_k, T, S)
    dq, dk, dv = _flash_bwd_bhd(
        to_bhd(q), to_bhd(k), to_bhd(v), o_bhd, lse, to_bhd(g),
        bq, bk, interpret,
    )
    return from_bhd(dq, T), from_bhd(dk, S), from_bhd(dv, S)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
