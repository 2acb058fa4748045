"""Spatial (sequence-style) parallelism for the convolutional codecs.

Beyond the reference: Kandinsky-2 (CUDA/torch) decodes the full image on one
GPU, so its maximum resolution is bounded by a single device's memory.  On a
TPU mesh we shard the *rows* of the image across devices and keep every conv
mathematically exact with one-row halo exchanges over ICI:

* 3x3 stride-1 convs (`sp_conv3x3`): each device `ppermute`s its edge rows to
  its neighbours and convolves VALID over the height axis.  `ppermute` leaves
  zeros in un-targeted destinations, which at the global top/bottom edge is
  exactly torch's ``padding=1`` zero-pad — so the sharded conv is bit-for-bit
  the unsharded one up to reduction order.
* GroupNorm/SpatialNorm statistics span the full image via two `psum`s
  (see ``GroupNorm32(axis_name=...)`` in models/layers.py).
* Full-spatial attention (MoVQ's 32x32 bottleneck) computes local query rows
  against all-gathered keys/values — exact softmax, O(rows/n) work per device.
* Nearest-neighbour resizes (SpatialNorm's zq broadcast, decoder upsamples)
  are integer-factor row maps, so equal row shards stay aligned at every
  scale and need no communication at all.

The same parameter tree drives both paths: the SP modules instantiate
identically-named flax params, so a converted MoVQ checkpoint works
unchanged.  Use::

    out = spatial_decode(movq, params, code, mesh, axis="sp")

to decode latents whose decoded image would not fit on one chip (e.g. 4096²,
where fp32 decoder activations alone exceed 16 GB HBM).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

Dtype = jnp.dtype

SPATIAL_AXIS = "sp"


def halo_exchange_rows(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Concatenate each device's row block with one halo row from each
    neighbour along the sharded height axis: (B, Hl, W, C) -> (B, Hl+2, W, C).

    The first device's top halo and the last device's bottom halo arrive as
    zeros (ppermute semantics), matching torch Conv2d zero padding.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    down = [(i, i + 1) for i in range(n - 1)]  # my last row -> next device
    up = [(i + 1, i) for i in range(n - 1)]  # my first row -> previous device
    from_above = jax.lax.ppermute(x[:, -1:], axis_name, down)
    from_below = jax.lax.ppermute(x[:, :1], axis_name, up)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def halo_below_rows(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """One-sided halo for the codecs' asymmetric-pad stride-2 downsample:
    append the next device's first row (the last device gets zeros — exactly
    the reference's bottom-only zero pad, vqgan_blocks.py:109-126).
    (B, Hl, W, C) -> (B, Hl+1, W, C)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
    up = [(i + 1, i) for i in range(n - 1)]
    from_below = jax.lax.ppermute(x[:, :1], axis_name, up)
    return jnp.concatenate([x, from_below], axis=1)


def sp_conv3x3(
    features: int,
    name: str,
    axis_name: str,
    dtype=jnp.float32,
    zero_init: bool = False,
):
    """3x3 stride-1 padding-1 conv over row-sharded NHWC activations.

    Creates the identical ``nn.Conv`` parameters as models.layers.conv2d
    (same name, same kernel shape, same init) so one weight tree serves both
    layouts.
    """
    conv = nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(1, 1),
        padding=((0, 0), (1, 1)),  # height handled by the halo rows
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros
        if zero_init
        else nn.initializers.lecun_normal(),
        name=name,
    )
    return lambda x: conv(halo_exchange_rows(x, axis_name))


def sp_conv3x3_down(
    features: int,
    name: str,
    axis_name: str,
    dtype=jnp.float32,
):
    """3x3 stride-2 symmetric-padding-1 downsample conv over row-sharded
    activations.  With even global H the bottom pad row is never read
    (output row j touches input rows 2j-1..2j+1, j<H/2), so only a TOP halo
    row is needed: device 0 receives zeros = the top zero pad.  Local rows
    must be even so output shards stay equal."""
    conv = nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(2, 2),
        padding=((0, 0), (1, 1)),
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.lecun_normal(),
        name=name,
    )

    def run(x):
        n = jax.lax.axis_size(axis_name)
        if n == 1:
            top = jnp.zeros_like(x[:, :1])
        else:
            down = [(i, i + 1) for i in range(n - 1)]
            top = jax.lax.ppermute(x[:, -1:], axis_name, down)
        return conv(jnp.concatenate([top, x], axis=1))

    return run


def sp_rows_ok(h: int, sp_n: int, levels: int) -> bool:
    """True when ``h`` rows keep equal EVEN shards across ``levels`` dyadic
    resolutions when sharded ``sp_n``-way."""
    return h % (sp_n * 2 ** (levels - 1)) == 0


def check_sp_rows(h: int, sp_n: int, levels: int,
                  what: str = "latent height") -> None:
    """Raise with a uniform message unless ``sp_rows_ok`` — the shared
    guard for every row-sharded entry point."""
    if not sp_rows_ok(h, sp_n, levels):
        need = sp_n * 2 ** (levels - 1)
        raise ValueError(
            f"{what} {h} must be a multiple of sp_axis*2^(levels-1) = {need} "
            "so every resolution level keeps equal even row shards"
        )


# Above this many TOTAL spatial tokens the gathered-KV attention's
# [local_rows, T] logits buffer stops fitting comfortably in HBM
# (65536 tokens 8-way at fp32 is already a 2.1 GB buffer); switch to the
# ring implementation, whose memory is bounded by q_chunk x T/n.
RING_THRESHOLD_TOKENS = 65536


def sp_attention_rows(q, k, v, axis_name: str, impl: Optional[str] = None):
    """Exact full-spatial single-head attention over row-sharded maps.

    q, k, v: (B, Hl, W, C) local row blocks; returns (B, Hl, W, C), the
    softmax rows this device owns.  Two exact implementations:

    * ``"gathered"`` — all-gather K/V along the axis and take one softmax;
      fastest when the [Hl*W, T] logits buffer fits.
    * ``"ring"`` — K/V never leave their shards: n ring steps ``ppermute``
      the K/V blocks around the axis while an online softmax (flash-style
      running max/sum) folds each block in, with queries processed in
      chunks — memory O(q_chunk x T/n) instead of O(T²/n).

    ``impl=None`` picks by static total size: ring above
    ``RING_THRESHOLD_TOKENS`` total tokens.  Both are pinned equal to the
    single-device softmax in tests/test_spatial_parallel.py.
    """
    B, Hl, W, C = q.shape
    if impl is None:
        n = jax.lax.axis_size(axis_name)
        impl = "ring" if Hl * W * n > RING_THRESHOLD_TOKENS else "gathered"
    if impl == "ring":
        return sp_ring_attention_rows(q, k, v, axis_name)
    kf = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    vf = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    ql = q.reshape(B, Hl * W, C)
    kf = kf.reshape(B, -1, C)
    vf = vf.reshape(B, -1, C)
    logits = jnp.einsum("btc,bsc->bts", ql, kf, preferred_element_type=jnp.float32)
    logits = logits * (C ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vf.dtype)
    return jnp.einsum("bts,bsc->btc", w, vf).reshape(B, Hl, W, C)


def sp_ring_attention_rows(q, k, v, axis_name: str, q_chunk: int = 2048):
    """Ring attention over row-sharded feature maps (exact softmax).

    Each device keeps flash-style running (max, sum, accumulator) state for
    its own query rows while the K/V row blocks travel around the ring one
    ``ppermute`` hop per step; after ``axis_size`` steps every query has
    seen every key exactly once.  Queries are processed ``q_chunk`` rows at
    a time inside a ``lax.scan``, so the live logits buffer is
    [q_chunk, T/n] — the full [T/n, T] matrix of the gathered path is never
    materialized.  fp32 state regardless of input dtype (softmax exactness);
    output cast back to the value dtype.
    """
    B, Hl, W, C = q.shape
    n = jax.lax.axis_size(axis_name)
    tl = Hl * W
    qc = min(q_chunk, tl)
    nq = -(-tl // qc)  # ceil
    pad = nq * qc - tl

    ql = q.reshape(B, tl, C).astype(jnp.float32) * (C ** -0.5)
    if pad:
        ql = jnp.pad(ql, ((0, 0), (0, pad), (0, 0)))
    # chunk-major so scan carries one query chunk's state per step
    qx = ql.reshape(B, nq, qc, C).transpose(1, 0, 2, 3)  # [nq, B, qc, C]
    kc0 = k.reshape(B, tl, C).astype(jnp.float32)
    vc0 = v.reshape(B, tl, C).astype(jnp.float32)
    # receive the NEXT device's block each step (downstream neighbours send
    # back); after n steps the blocks are home again
    ring = [(i, (i - 1) % n) for i in range(n)]

    def ring_step(carry, _):
        state, kc, vc = carry  # state: (m, s, acc) stacked over query chunks

        def fold(qstate, qq):
            m, s, acc = qstate  # [B,qc], [B,qc], [B,qc,C]
            logits = jnp.einsum(
                "btc,bsc->bts", qq, kc, preferred_element_type=jnp.float32
            )
            m_new = jnp.maximum(m, logits.max(axis=-1))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])
            s_new = s * corr + p.sum(axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum("bts,bsc->btc", p, vc)
            return (m_new, s_new, acc_new)

        def qscan(_, xs):
            qstate, qq = xs
            return None, fold(qstate, qq)

        _, state = jax.lax.scan(qscan, None, (state, qx))
        if n > 1:
            kc = jax.lax.ppermute(kc, axis_name, ring)
            vc = jax.lax.ppermute(vc, axis_name, ring)
        return (state, kc, vc), None

    m0 = jnp.full((nq, B, qc), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((nq, B, qc), jnp.float32)
    acc0 = jnp.zeros((nq, B, qc, C), jnp.float32)
    (state, _, _), _ = jax.lax.scan(
        ring_step, ((m0, s0, acc0), kc0, vc0), None, length=n
    )
    _, s, acc = state
    out = acc / s[..., None]  # [nq, B, qc, C]
    out = out.transpose(1, 0, 2, 3).reshape(B, nq * qc, C)[:, :tl]
    return out.astype(v.dtype).reshape(B, Hl, W, C)


def sp_ring_attention_mh(q, k, v, axis_name: str, extra_k=None, extra_v=None,
                         q_chunk: int = 1024):
    """Multi-head ring attention over row-sharded token sequences — the
    UNet flavor of ``sp_ring_attention_rows``: softmax over [extra; spatial]
    keys where ``extra_k``/``extra_v`` is a replicated prefix block (the
    text/encoder tokens concatenated into spatial attention,
    models/unet.py AttentionBlock) and the spatial K/V stay sharded,
    travelling the ring one ``ppermute`` hop per step.

    q: [B, Tl, H, c] local query rows; k/v: [B, Tl, H, c] local spatial K/V;
    extra_k/extra_v: [B, E, H, c] replicated.  Matches ``qkv_attention``'s
    scaling (q and k pre-scaled by 1/sqrt(sqrt(c))), fp32 accumulators,
    output cast to v.dtype.  Exact softmax; memory O(q_chunk · Tl · H)
    instead of the gathered path's [B, Tl·n, H, c] K/V + flash buffers.
    Differentiable (scan + ppermute transpose); gradient parity is pinned in
    tests/test_spatial_parallel.py.
    """
    import math

    B, Tl, H, c = q.shape
    n = jax.lax.axis_size(axis_name)
    scale = 1.0 / math.sqrt(math.sqrt(c))
    qf = q.astype(jnp.float32) * scale
    kc0 = k.astype(jnp.float32) * scale
    vc0 = v.astype(jnp.float32)

    qc = min(q_chunk, Tl)
    nq = -(-Tl // qc)
    pad = nq * qc - Tl
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qx = qf.reshape(B, nq, qc, H, c).transpose(1, 0, 2, 3, 4)

    def fold(state, qq, kc, vc):
        m, s, acc = state  # [B,qc,H], [B,qc,H], [B,qc,H,c]
        logits = jnp.einsum(
            "bthc,bshc->bths", qq, kc, preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, logits.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        s_new = s * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bths,bshc->bthc", p, vc
        )
        return (m_new, s_new, acc_new)

    m0 = jnp.full((nq, B, qc, H), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((nq, B, qc, H), jnp.float32)
    acc0 = jnp.zeros((nq, B, qc, H, c), jnp.float32)
    state = (m0, s0, acc0)

    if extra_k is not None:
        ek = extra_k.astype(jnp.float32) * scale
        ev = extra_v.astype(jnp.float32)

        def qscan_extra(_, xs):
            qstate, qq = xs
            return None, fold(qstate, qq, ek, ev)

        _, state = jax.lax.scan(qscan_extra, None, (state, qx))

    ring = [(i, (i - 1) % n) for i in range(n)]

    def ring_step(carry, _):
        state, kc, vc = carry

        def qscan(_, xs):
            qstate, qq = xs
            return None, fold(qstate, qq, kc, vc)

        _, state = jax.lax.scan(qscan, None, (state, qx))
        if n > 1:
            kc = jax.lax.ppermute(kc, axis_name, ring)
            vc = jax.lax.ppermute(vc, axis_name, ring)
        return (state, kc, vc), None

    (state, _, _), _ = jax.lax.scan(
        ring_step, (state, kc0, vc0), None, length=n
    )
    _, s, acc = state
    out = acc / s[..., None]  # [nq, B, qc, H, c]
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, nq * qc, H, c)[:, :Tl]
    return out.astype(v.dtype)


def spatial_decode(
    movq: nn.Module,
    params,
    codes_or_quant: jnp.ndarray,
    mesh: Mesh,
    axis: str = SPATIAL_AXIS,
    method: str = "decode_code",
) -> jnp.ndarray:
    """Run ``movq.decode_code`` / ``movq.decode`` with rows sharded over
    ``mesh[axis]``.

    ``codes_or_quant``: (B, Hl, Wl) int codes for ``decode_code`` or
    (B, Hl, Wl, C) pre-quant latents for ``decode``.  Latent rows must divide
    by the axis size.  Returns the decoded image, row-sharded over the mesh
    (a global jnp array; ``np.asarray`` gathers it to host).
    """
    n = mesh.shape[axis]
    h_latent = codes_or_quant.shape[1]
    if h_latent % n != 0:
        raise ValueError(
            f"latent height {h_latent} must be a multiple of the spatial "
            f"axis size {n} (equal row shards; 'divide' evenly)"
        )
    sp = movq.clone(sp_axis=axis, parent=None)
    in_spec = P(None, axis) if method == "decode_code" else P(None, axis, None, None)

    def run(p, c):
        return sp.apply({"params": p}, c, method=getattr(type(sp), method))

    f = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), in_spec),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return f(params, codes_or_quant)


def spatial_encode(
    codec: nn.Module,
    params,
    image: jnp.ndarray,
    mesh: Mesh,
    axis: str = SPATIAL_AXIS,
    method: str = "encode",
):
    """Run the codec's ``encode`` with image rows sharded over ``mesh[axis]``.

    The stride-2 downsamples take a one-row bottom halo per level
    (`halo_below_rows`), so the per-device rows must stay even through every
    level: H must divide by ``axis_size * 2**(levels-1)``.  Returns the
    row-sharded latent (or the (mean, logvar) tuple for the KL codec).
    """
    n = mesh.shape[axis]
    h = image.shape[1]
    check_sp_rows(h, n, len(codec.ch_mult), what="image height")
    sp = codec.clone(sp_axis=axis, parent=None)

    def run(p, x):
        return sp.apply({"params": p}, x, method=getattr(type(sp), method))

    f = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return f(params, image)
