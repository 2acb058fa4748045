"""Shared NN primitives (TPU-native, NHWC).

Counterpart of reference kandinsky2/model/nn.py.  Conventions:

* All image tensors are NHWC (channels-last = TPU lane dimension); sequence
  tensors are [B, T, C].  The torch reference is NCHW / NCL — the weight
  converter (kandinsky2_tpu/weights/convert.py) handles layout transposes.
* 1x1 convolutions are ``nn.Dense`` over the channel axis (pure MXU matmul).
* Norms always compute in float32 regardless of the activation dtype
  (reference nn.py:31-37 upcasts GroupNorm to fp32), then cast back.
* Every submodule is named exactly like its torch reference state_dict path so
  checkpoint conversion is mechanical.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos, sin] order (nn.py:101-121,
    prior.py:15-34).  ``timesteps`` may be fractional; fp32 output."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


# Norm precision policy: "full" upcasts the whole normalize to fp32 (bit-
# parity with the reference's GroupNorm32, nn.py:31-37); "stats" computes only
# mean/var in fp32 and normalizes in the activation dtype (half the HBM
# traffic in bf16 torsos).  Set BEFORE building/jitting a model.
_NORM_MODE = "full"

# Norm implementation: "xla" (default, and what "auto" resolves to) lowers
# the single-stats-pass + coefficient-barrier formulation below — measured
# fastest on the v5e (44.6 ms 768² UNet step in r5 vs 59.0 for the naive
# grouped reshape).  "pallas" routes eligible shapes through the fused
# two-kernel GroupNorm (ops/group_norm.py); it reaches the theoretical
# two-pass traffic floor but loses on wall clock (78.6 ms) because ~120
# Mosaic kernel launches per UNet step cost more than the saved bandwidth —
# kept as an opt-in for shapes/batches where the tradeoff flips.
_NORM_IMPL = "xla"


def set_norm_precision(mode: str) -> None:
    global _NORM_MODE
    assert mode in ("full", "stats")
    _NORM_MODE = mode


def set_norm_impl(impl: str) -> None:
    global _NORM_IMPL
    assert impl in ("pallas", "xla", "auto")
    _NORM_IMPL = impl


# Experiment knob: whether "full"-mode normalize re-reads the bf16 input
# through an optimization_barrier (True, default — measured −2 GB/step on the
# 768² UNet) or shares the fp32 upcast with the stats pass.  Exposed for
# perf experiments only; parity is identical either way.
_NORM_X_BARRIER = True


def set_norm_x_barrier(on: bool) -> None:
    global _NORM_X_BARRIER
    _NORM_X_BARRIER = bool(on)


def _norm_use_pallas() -> bool:
    # pallas only when explicitly requested AND not on the CPU backend's
    # slow interpreter (tests force it via set_norm_impl("pallas")).
    return _NORM_IMPL == "pallas"


class GroupNorm32(nn.Module):
    """GroupNorm over the channel (last) axis, fp32 statistics, optional fused
    SiLU (nn.py:26-37).  Owns its scale/bias directly so the flax path maps
    1:1 onto the torch module path."""

    num_groups: int = 32
    eps: float = 1e-5
    swish: float = 0.0
    # Set to a mesh axis name when the spatial rows are sharded over devices
    # (parallel/spatial.py): mean/var are then psum'd over the axis so the
    # statistics span the full image, not one device's row block.
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        film: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """``film=(scale, shift)`` ([B, C] or [B, 1, 1, C]) applies the
        ResBlock scale-shift conditioning ``norm(x)·(1+scale)+shift`` fused
        into the normalize coefficients (then ``swish`` on top)."""
        orig_dtype = x.dtype
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        g = self.num_groups
        cs = C // g
        if film is not None:
            film = tuple(f.reshape(f.shape[0], C) for f in film)
        if self.axis_name is None and _norm_use_pallas():
            from ..ops.group_norm import (
                pallas_group_norm,
                pallas_group_norm_ok,
            )

            if pallas_group_norm_ok(x, g):
                return pallas_group_norm(
                    x, scale, bias, g, self.eps, swish=self.swish, film=film
                )
        # Stats via per-channel fp32 reductions + a tiny [B, C] -> [B, G]
        # combine.  Reshaping the full tensor into [B, HW, G, C/G] (the
        # obvious translation of torch GroupNorm) splits the lane-minor
        # channel axis, which XLA:TPU implements as a full-tensor relayout
        # copy in HBM on BOTH sides of the stats — at 768² those copies were
        # the largest single traffic term in the compiled UNet step and MoVQ
        # decode.  Per-channel reduce + broadcasted per-channel normalize
        # keeps every big-tensor op in the native layout: the whole norm is
        # two fused passes over x (one reduce, one elementwise).
        red = tuple(range(1, x.ndim - 1))
        n_local = 1
        for i in red:
            n_local *= x.shape[i]
        x32 = x.astype(jnp.float32)
        bshape = (x.shape[0],) + (1,) * len(red) + (C,)
        s1 = x32.sum(axis=red)  # [B, C]
        cnt = jnp.float32(n_local * cs)
        if self.axis_name is not None:
            # spatial rows device-sharded: stats span the full image
            s1 = jax.lax.psum(s1, self.axis_name)
            cnt = jax.lax.psum(cnt, self.axis_name)
        mean_g = s1.reshape(s1.shape[0], g, cs).sum(-1) / cnt  # [B, G]
        if self.axis_name is None:
            # Both moments from ONE pass over x (sibling reduces fuse): a
            # second (x - mean)² pass would make XLA materialize the fp32
            # difference tensor to share it with the normalize — at 768²
            # those fp32 buffers (+ their relayout copies) were ~15% of the
            # compiled UNet step's HBM traffic.  Precision bound of
            # E[x²] − mean² in fp32: relative variance error ≈
            # ε_f32·√N·(mean/std)² (the reduction's own rounding dominates
            # the subtraction) — measured ~4e-3 at |mean|/std = 10² (oracle
            # test in test_precision.py), i.e. < 1e-6 for the |mean|/std ≲ 1
            # activations these conv nets produce after a preceding norm.
            # The sharded/training path below uses the exact two-pass form
            # instead, where activation scales are less controlled
            # (ADVICE r4).
            s2 = (x32 * x32).sum(axis=red)  # [B, C]
            ex2_g = s2.reshape(s2.shape[0], g, cs).sum(-1) / cnt
            var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
        else:
            # exact two-pass E[(x − mean)²] (reference GroupNorm semantics,
            # nn.py:31-37): one extra pass over x + one extra psum, immune
            # to large-|mean| cancellation during training
            mean_c2 = jnp.repeat(mean_g, cs, axis=-1)  # [B, C]
            d = x32 - mean_c2.reshape(bshape)
            s2c = jax.lax.psum((d * d).sum(axis=red), self.axis_name)
            var_g = s2c.reshape(s2c.shape[0], g, cs).sum(-1) / cnt
        inv_g = jax.lax.rsqrt(var_g + self.eps)
        # Fold (x - mean) * inv * scale + bias into x * a + b so the
        # normalize is a single fused multiply-add with per-channel
        # coefficients — no big subexpression shared with the stats pass.
        inv_c = jnp.repeat(inv_g, cs, axis=-1)  # [B, C]
        mean_c = jnp.repeat(mean_g, cs, axis=-1)
        a2 = inv_c * scale
        b2 = bias - mean_c * a2
        if film is not None:
            fm = 1.0 + film[0].astype(jnp.float32)
            a2 = a2 * fm
            b2 = b2 * fm + film[1].astype(jnp.float32)
        # Barrier the tiny [B, C] coefficients: without it XLA materializes
        # their broadcast to the FULL activation shape in fp32 (plus a
        # relayout copy) as standalone ops feeding the conv fusion — ~15% of
        # the compiled 768² UNet step's HBM traffic.  Isolated, the broadcast
        # fuses into the consumer and never touches HBM.
        a2, b2 = jax.lax.optimization_barrier((a2, b2))
        a = a2.reshape(bshape)
        b = b2.reshape(bshape)
        if _NORM_MODE == "full" or self.axis_name is not None:
            # Recompute the fp32 upcast of x in the normalize pass instead
            # of sharing it with the stats pass: CSE'd, XLA materializes
            # the shared x32 tensor in HBM between the two fusions (write +
            # read = 8 B/elem); barriered, each pass re-reads the bf16
            # original (2 B/elem).  Same arithmetic — the upcast is exact.
            x32n = (
                jax.lax.optimization_barrier(x) if _NORM_X_BARRIER else x
            ).astype(jnp.float32)
            y = (x32n * a + b).astype(orig_dtype)
        else:
            # "stats": normalize arithmetic in the activation dtype (the
            # stats themselves are always fp32)
            y = x * a.astype(orig_dtype) + b.astype(orig_dtype)
        if self.swish == 1.0:
            y = jax.nn.silu(y)
        elif self.swish:
            y = y * jax.nn.sigmoid(y * self.swish)
        return y


def group_norm(name: str, num_groups: int = 32, eps: float = 1e-5, swish: float = 0.0):
    return GroupNorm32(num_groups=num_groups, eps=eps, swish=swish, name=name)


class LayerNormF32(nn.Module):
    """LayerNorm with fp32 statistics, cast back to input dtype.  Owns its
    scale/bias directly (torch nn.LayerNorm weight/bias)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        y = x.astype(jnp.float32)
        mean = y.mean(axis=-1, keepdims=True)
        var = y.var(axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(orig)


def dense(
    features: int,
    name: str,
    dtype: Dtype = jnp.float32,
    use_bias: bool = True,
    kernel_init: Callable = nn.initializers.lecun_normal(),
    zero_init: bool = False,
):
    """Linear / 1x1-conv (reference conv_nd(1, ..., 1) and nn.Linear)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else kernel_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


def conv2d(
    features: int,
    name: str,
    kernel: int = 3,
    stride: int = 1,
    padding=1,
    dtype: Dtype = jnp.float32,
    zero_init: bool = False,
):
    """NHWC 3x3/1x1 conv matching torch Conv2d(padding=int) semantics."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros
        if zero_init
        else nn.initializers.lecun_normal(),
        name=name,
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample, NHWC (F.interpolate nearest)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class FoldedUpsampleConv(nn.Module):
    """``conv3x3(pad=1)(nearest_2x(x))`` as ONE lhs-dilated convolution.

    Nearest-2x is a stride-2 transposed conv with a 2x2 ones kernel, so the
    composition is a stride-2 transposed conv whose 4x4 kernel is the 3x3
    kernel correlated with ones(2, 2) — exact same arithmetic, but the 2x
    tensor never materializes.  On the v5e the materialized path pays a
    full write+read of the upsampled activation PLUS a relayout copy chain
    that XLA emits for the broadcast-reshape (the largest non-conv cost in
    the 768² MoVQ decode trace, r5): measured 16.2 -> 10.6 ms at 384->768
    c256 and 12.5 -> 8.5 ms at 192->384 c512 (/tmp cleanroom micro, scalar
    -sync timing).  The phase decomposition of the dilated conv also does
    310 vs 697 GFLOP of MXU work at 768².

    Params are named/shaped exactly like the ``nn.Conv`` it replaces
    (kernel [3, 3, I, O], bias [O]) so torch checkpoint conversion and every
    existing pytree are unchanged.  Counterpart of reference Upsample-with-
    conv (kandinsky2/model/unet.py:48-77, vqgan_blocks.py:93-106)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, in_ch, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        # w4[q] = sum_{a in {0,1}} w[q-a]: each upsampled pixel (2i+a)
        # duplicates x[i], so the 3 taps collapse onto 4 dilated taps
        pad = lambda h, w_: jnp.pad(w, ((h, 1 - h), (w_, 1 - w_),
                                        (0, 0), (0, 0)))
        w4 = pad(0, 0) + pad(1, 0) + pad(0, 1) + pad(1, 1)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w4.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(y.dtype)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize to arbitrary (H, W), matching torch F.interpolate
    mode='nearest' index math: src = floor(dst * in/out).  Identity-size
    resizes return the input unchanged (no identity-gather copy)."""
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    h_idx = (jnp.arange(size[0]) * (H / size[0])).astype(jnp.int32)
    w_idx = (jnp.arange(size[1]) * (W / size[1])).astype(jnp.int32)
    return x[:, h_idx][:, :, w_idx]


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, stride 2, NHWC (torch AvgPool2d(2))."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize, NHWC (torch F.interpolate bilinear,
    align_corners=False — half-pixel centers, same as jax.image 'linear')."""
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method="linear"
    )


class AttentionPooling(nn.Module):
    """Multi-head attention pooling (reference text_encoders.py:24-58):
    full-sequence q/k/v self-attention, return position 0 of the projected
    output."""

    heads: int
    in_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        d_k = self.in_dim // self.heads
        q = dense(self.in_dim, "q_linear", self.dtype)(x)
        k = dense(self.in_dim, "k_linear", self.dtype)(x)
        v = dense(self.in_dim, "v_linear", self.dtype)(x)
        q = q.reshape(B, T, self.heads, d_k)
        k = k.reshape(B, T, self.heads, d_k)
        v = v.reshape(B, T, self.heads, d_k)
        logits = jnp.einsum(
            "bthc,bshc->bhts", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(d_k)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshc->bthc", w, v)
        out = out.reshape(B, T, self.in_dim)
        out = dense(self.out_dim, "out", self.dtype)(out)
        return out[:, 0]
