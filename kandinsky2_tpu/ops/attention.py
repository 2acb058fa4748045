"""Attention compute ops.

The semantic spec is the reference's einsum attention (kandinsky2/model/
unet.py:334-340): pre-scale q and k by 1/sqrt(sqrt(head_dim)) (more stable in
low precision than dividing the logits), softmax in fp32.

``qkv_attention`` is the single swap point: the XLA einsum path below is the
correctness reference; ``kandinsky2_tpu.ops.flash_attention`` provides the
Pallas TPU kernel used for large spatial sequences (selected via
``impl="flash"`` or automatically by size).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, mask=None):
    """q: [B,T,H,c], k/v: [B,S,H,c]; mask: additive [B,(H,)T,S] or None.

    The logits tensor materializes in the ACTIVATION dtype (the reference's
    fp16 einsum, unet.py:334-340 — ``th.softmax(weight.float())`` upcasts a
    half-precision weight tensor); the MXU accumulates the dot in fp32
    either way and the softmax runs in fp32 on top.  Forcing an fp32 logits
    buffer instead doubles the dominant HBM term of every big attention
    block — measured +3.2 ms on the 768² 2.1 UNet step (52.9 → 49.7 ms,
    r5 in-graph routing experiment)."""
    ch = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        logits = logits.astype(jnp.float32) + mask.astype(jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshc->bthc", w, v)


def qkv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention.

    Args:
      q: [B, T, H, ch]
      k, v: [B, S, H, ch]
      mask: optional additive mask, [B, T, S] or [B, H, T, S]
      impl: "xla" | "flash" | "auto" (flash for long unmasked sequences when
        the Pallas kernel is usable on this backend)
    Returns: [B, T, H, ch]
    """
    # Measured on v5e (bench_attention.py, BENCH_ATTENTION.json): flash wins
    # 1.6-1.8x fwd AND bwd at T>=4096 with B*H>=16; roughly ties at T=2304;
    # loses for short sequences and the MoVQ single fat 512-d head (B*H=1,
    # bwd 0.70x) — those stay on the XLA path.  Re-validated IN-GRAPH in r5:
    # routing the 768² UNet's T=2304 blocks to flash made the whole step
    # 51.7 -> 62.5 ms (d=64 blocks underfill the MXU), while the bf16-logits
    # XLA path above won 3.2 ms — the isolated tie was the right call.
    if impl == "flash" or (
        impl == "auto"
        and mask is None
        and q.shape[1] >= 3000
        and q.shape[0] * q.shape[2] >= 8
    ):
        try:
            from .flash_attention import flash_attention

            return flash_attention(q, k, v)
        except Exception:
            pass  # fall back to XLA path (e.g. CPU tests)
    return _xla_attention(q, k, v, mask)
