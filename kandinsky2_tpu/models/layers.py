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


def set_norm_precision(mode: str) -> None:
    global _NORM_MODE
    assert mode in ("full", "stats")
    _NORM_MODE = mode


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
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        g = self.num_groups
        if self.axis_name is not None:
            y = x.astype(jnp.float32)
            grouped = y.reshape(y.shape[0], -1, g, C // g)
            cnt = jax.lax.psum(
                jnp.float32(grouped.shape[1] * grouped.shape[3]), self.axis_name
            )
            mean = jax.lax.psum(
                grouped.sum(axis=(1, 3), keepdims=True), self.axis_name
            ) / cnt
            var = jax.lax.psum(
                ((grouped - mean) ** 2).sum(axis=(1, 3), keepdims=True),
                self.axis_name,
            ) / cnt
            grouped = (grouped - mean) * jax.lax.rsqrt(var + self.eps)
            y = (grouped.reshape(y.shape) * scale + bias).astype(orig_dtype)
        elif _NORM_MODE == "full":
            y = x.astype(jnp.float32)
            grouped = y.reshape(y.shape[0], -1, g, C // g)
            mean = grouped.mean(axis=(1, 3), keepdims=True)
            var = grouped.var(axis=(1, 3), keepdims=True)
            grouped = (grouped - mean) * jax.lax.rsqrt(var + self.eps)
            y = (grouped.reshape(y.shape) * scale + bias).astype(orig_dtype)
        else:
            grouped = x.reshape(x.shape[0], -1, g, C // g)
            g32 = grouped.astype(jnp.float32)
            mean = g32.mean(axis=(1, 3), keepdims=True)
            var = g32.var(axis=(1, 3), keepdims=True)
            inv = jax.lax.rsqrt(var + self.eps)
            y = (grouped - mean.astype(orig_dtype)) * inv.astype(orig_dtype)
            y = y.reshape(x.shape) * scale.astype(orig_dtype) + bias.astype(
                orig_dtype
            )
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


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize to arbitrary (H, W), matching torch F.interpolate
    mode='nearest' index math: src = floor(dst * in/out)."""
    B, H, W, C = x.shape
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
