"""Absolute performance accounting: per-stage wall time, XLA-reported FLOPs,
and achieved model-FLOPs utilization (MFU) against the chip's bf16 peak.

The e2e benchmark (bench.py) answers "how fast"; this module answers "how
close to the hardware ceiling" — the per-stage breakdown the README's
roofline claims rest on.  Stage FLOP counts come from the compiled
executable's own cost analysis (``Compiled.cost_analysis()``), not hand
math, so they track the model configs exactly; wall time is measured on the
live device with ``block_until_ready``.

Stages profiled for the 2.1 flagship (768² defaults):

* ``unet_step``  — one CFG-doubled 1.22B-UNet denoise call (the hot loop
  body; ~50 of these per image)
* ``prior_step`` — one CFG-doubled 1B prior transformer call (~25/image)
* ``movq_decode`` — the latent→pixel conv decoder (once per image)
* ``clip_text`` / ``xlmr`` — conditioning encoders (once per image)

and the same shape of breakdown for the 2.2 family (``profile_22``),
including the ControlNet hint stack for BASELINE config 5.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["chip_peak_flops", "_chip_peaks", "profile_21", "profile_22", "stage_report"]

# (bf16 peak TFLOP/s, HBM GB/s) per chip, by device_kind prefix (public
# spec sheets).  Both roofline axes: a stage is compute-bound when its
# arithmetic intensity exceeds peak_flops/peak_bw (v5e: ~240 FLOP/byte),
# memory-bound below it.
_PEAKS = {
    "TPU v6 lite": (918.0, 1640.0),  # v6e / Trillium
    "TPU v5 lite": (197.0, 819.0),   # v5e
    "TPU v5p": (459.0, 2765.0),
    "TPU v5": (459.0, 2765.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v3": (123.0, 900.0),
    "TPU v2": (46.0, 700.0),
}


def _chip_peaks(device=None):
    """(bf16 peak FLOP/s, HBM bytes/s) of ``device``, or (None, None) when
    the chip is unknown (CPU test runs).  Override with the
    ``KANDINSKY2_TPU_PEAK_TFLOPS`` / ``KANDINSKY2_TPU_PEAK_GBS`` env vars on
    unlisted hardware."""
    import os

    import jax

    tf = os.environ.get("KANDINSKY2_TPU_PEAK_TFLOPS")
    gb = os.environ.get("KANDINSKY2_TPU_PEAK_GBS")
    if tf:
        return float(tf) * 1e12, float(gb) * 1e9 if gb else None
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for prefix, (tfl, gbs) in _PEAKS.items():
        if kind.startswith(prefix):
            return tfl * 1e12, gbs * 1e9
    return None, None


def chip_peak_flops(device=None) -> Optional[float]:
    """bf16 peak FLOP/s of ``device`` (see _chip_peaks)."""
    return _chip_peaks(device)[0]


def _cost(compiled) -> Dict[str, float]:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def _sync(out) -> None:
    """Force completion with a device→host fetch.  Through the tunneled
    (axon) TPU client ``block_until_ready`` can return before the device
    work drains, which inflates throughput to impossible numbers; a host
    copy of one output leaf cannot."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def _measure(jfn, args, iters: int) -> Dict[str, float]:
    """Compile, then time ``iters`` back-to-back dispatches with ONE host
    sync at the end (min over 3 rounds, divided by ``iters``).

    Queueing the calls and syncing once is what the e2e pipelines do (a
    scanned ladder is one dispatch); syncing per call would charge every
    stage the full host→device round-trip — through the tunneled (axon)
    TPU client that is tens of milliseconds, which at 768² inflated the
    isolated UNet step ~1.7× over its share of the measured e2e wall."""
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    _sync(compiled(*args))
    rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = compiled(*args)
        _sync(out)
        rounds.append((time.perf_counter() - t0) / iters)
    stats = _cost(compiled)
    stats["seconds"] = float(min(rounds))
    return stats


def stage_report(stages: Dict[str, Dict[str, float]],
                 peak_flops: Optional[float],
                 peak_bw: Optional[float] = None) -> Dict[str, Any]:
    """Attach achieved TFLOP/s, MFU %, arithmetic intensity, and the
    two-axis roofline verdict to each measured stage: which hardware limit
    (MXU FLOPs or HBM bytes) binds it, and what fraction of that limit the
    measured wall time achieves.

    ``bytes accessed`` is the optimized-HLO operand+result byte count; XLA
    fusions that keep re-reads resident in VMEM can move LESS actual HBM
    traffic, so ``pct_of_roofline`` for memory-bound stages is conservative
    and can exceed 100 (small stages with high reuse)."""
    out = {}
    for name, s in stages.items():
        sec = s["seconds"]
        achieved = s["flops"] / sec if sec > 0 else 0.0
        row = {
            "seconds": round(sec, 6),
            "gflops": round(s["flops"] / 1e9, 3),
            "achieved_tflops": round(achieved / 1e12, 3),
            "bytes_gb": round(s["bytes"] / 1e9, 4),
            "flops_per_byte": round(s["flops"] / s["bytes"], 2)
            if s["bytes"] else None,
        }
        if peak_flops:
            row["mfu_pct"] = round(100.0 * achieved / peak_flops, 2)
        if peak_bw and s["bytes"]:
            row["achieved_gbps"] = round(s["bytes"] / sec / 1e9, 1)
            row["hbm_bw_pct"] = round(100.0 * s["bytes"] / sec / peak_bw, 2)
        if peak_flops and peak_bw and s["bytes"]:
            compute_floor = s["flops"] / peak_flops
            bw_floor = s["bytes"] / peak_bw
            bound = "compute" if compute_floor >= bw_floor else "memory"
            floor = max(compute_floor, bw_floor)
            row["roofline_bound"] = bound
            row["roofline_floor_seconds"] = round(floor, 6)
            row["pct_of_roofline"] = round(100.0 * floor / sec, 2)
        out[name] = row
    return out


def profile_21(pipe, h: int = 768, w: int = 768, batch: int = 1,
               steps: int = 50, prior_steps: int = 25,
               iters: int = 10) -> Dict[str, Any]:
    """Per-stage profile of a (random- or real-weight) 2.1 pipeline.

    Returns ``{"stages": {...}, "model": {...}, "peak_tflops": ...}`` with a
    per-image cost model: steps·unet_step + prior_steps·prior_step +
    movq_decode + encoders.
    """
    import jax
    import jax.numpy as jnp

    from .utils import get_new_h_w

    new_h, new_w = get_new_h_w(h, w)
    B = batch
    mc = pipe.config["model_config"]
    hp = pipe.config["prior"]["params"]["model"]["hparams"]
    dt = pipe.dtype
    unet, params = pipe.unet, pipe.params
    key = jax.random.PRNGKey(0)

    # conditioning tensors at the exact shapes generate_img uses (2B CFG)
    full_emb = jnp.zeros((2 * B, 77, mc["text_encoder_in_dim1"]), dt)
    pooled = jnp.zeros((2 * B, mc["text_encoder_in_dim2"]), dt)
    image_emb = jnp.zeros((2 * B, mc["image_encoder_in_dim"]), dt)
    xf_proj, xf_out = jax.jit(
        lambda p, a, b, c: unet.apply(
            {"params": p}, a, b, c, method=type(unet).encode_conditioning)
    )(params["unet"], full_emb, pooled, image_emb)

    stages: Dict[str, Dict[str, float]] = {}

    x2 = jax.random.normal(key, (2 * B, new_h, new_w, mc["in_channels"]),
                           jnp.float32)
    t2 = jnp.zeros((2 * B,), jnp.float32)
    unet_fn = jax.jit(lambda p, x, t, a, b: unet.apply(
        {"params": p}, x, t, a, b, method=type(unet).denoise))
    stages["unet_step"] = _measure(
        unet_fn, (params["unet"], x2, t2, xf_proj, xf_out), iters)

    lat = jax.random.normal(key, (B, new_h, new_w, 4), jnp.float32).astype(dt)
    movq_fn = jax.jit(lambda p, z: pipe.movq.apply(
        {"params": p}, z, method=type(pipe.movq).decode))
    stages["movq_decode"] = _measure(movq_fn, (params["movq"], lat), iters)

    xp = jax.random.normal(key, (2 * B, hp["clip_dim"]), jnp.float32)
    tp = jnp.zeros((2 * B,), jnp.float32)
    feat = jnp.zeros((2 * B, hp["clip_dim"]), dt)
    seq = jnp.zeros((2 * B, hp["text_ctx"], hp["clip_xf_width"]), dt)
    mask = jnp.ones((2 * B, hp["text_ctx"]), bool)
    prior_fn = jax.jit(lambda p, x, t, f, s, m: pipe.prior.apply(
        {"params": p}, x, t, text_emb=f, text_enc=s, mask=m))
    stages["prior_step"] = _measure(
        prior_fn, (params["prior"], xp, tp, feat, seq, mask), iters)

    ctx = pipe.clip_text.context_length
    toks = jnp.ones((2 * B, ctx), jnp.int32)
    clip_fn = jax.jit(lambda p, t: pipe.clip_text.apply({"params": p}, t))
    stages["clip_text"] = _measure(clip_fn, (params["clip_text"], toks), iters)

    te_len = min(77, pipe.text_encoder.max_positions - 2)
    ttoks = jnp.ones((2 * B, te_len), jnp.int32)
    tmask = jnp.ones((2 * B, te_len), jnp.int32)
    xlmr_fn = jax.jit(lambda p, t, m: pipe.text_encoder.apply(
        {"params": p}, t, m))
    stages["xlmr"] = _measure(
        xlmr_fn, (params["text_encoder"], ttoks, tmask), iters)

    peak, peak_bw = _chip_peaks()
    report = stage_report(stages, peak, peak_bw)
    model = {
        "per_image_seconds_modeled": round(
            steps * stages["unet_step"]["seconds"]
            + prior_steps * stages["prior_step"]["seconds"]
            + stages["movq_decode"]["seconds"]
            + stages["clip_text"]["seconds"] + stages["xlmr"]["seconds"], 4),
        "steps": steps, "prior_steps": prior_steps,
        "resolution": [h, w], "batch": batch,
        "unet_share_pct": round(
            100 * steps * stages["unet_step"]["seconds"]
            / max(1e-9, steps * stages["unet_step"]["seconds"]
                  + prior_steps * stages["prior_step"]["seconds"]
                  + stages["movq_decode"]["seconds"]), 2),
    }
    return {
        "family": "2.1",
        "stages": report,
        "model": model,
        "peak_tflops": None if peak is None else round(peak / 1e12, 1),
    }


def profile_22(pipe, h: int = 768, w: int = 768, batch: int = 1,
               steps: int = 50, prior_steps: int = 25, iters: int = 10,
               hint: bool = False) -> Dict[str, Any]:
    """Per-stage profile of a 2.2 pipeline; ``hint=True`` profiles the
    ControlNet-depth UNet step (BASELINE config 5's hot loop)."""
    import jax
    import jax.numpy as jnp

    from .pipelines.kandinsky2_2 import get_new_h_w_64

    h, w = get_new_h_w_64(h, w)
    lat_h, lat_w = h // 8, w // 8
    B = batch
    unet, params = pipe.unet, pipe.params
    D = pipe.prior.embedding_dim
    dt = pipe.dtype
    key = jax.random.PRNGKey(0)

    image_embeds = jnp.zeros((2 * B, unet.encoder_hid_dim), dt)
    kw = {}
    if hint:
        kw["hint"] = jnp.zeros((2 * B, h, w, 3), jnp.float32)
    enc_fn = jax.jit(lambda p, e: unet.apply(
        {"params": p}, e, method=type(unet).encode_conditioning, **kw))
    encoder_states, aug_emb, hint_latent = enc_fn(
        params["unet"], image_embeds)

    stages: Dict[str, Dict[str, float]] = {}
    in_ch = unet.in_channels - (4 if hint else 0)
    x2 = jax.random.normal(key, (2 * B, lat_h, lat_w, in_ch), jnp.float32)
    t2 = jnp.zeros((2 * B,), jnp.float32)
    unet_fn = jax.jit(lambda p, x, t, es, ae, hl: unet.apply(
        {"params": p}, x, t, es, ae, hl, method=type(unet).denoise))
    stages["unet_step"] = _measure(
        unet_fn,
        (params["unet"], x2, t2, encoder_states, aug_emb, hint_latent),
        iters)

    lat = jax.random.normal(key, (B, lat_h, lat_w, 4), jnp.float32).astype(dt)
    movq_fn = jax.jit(lambda p, z: pipe.movq.apply(
        {"params": p}, z, method=type(pipe.movq).decode))
    stages["movq_decode"] = _measure(movq_fn, (params["movq"], lat), iters)

    xp = jax.random.normal(key, (2 * B, D), jnp.float32)
    tp = jnp.zeros((2 * B,), jnp.float32)
    proj = jnp.zeros((2 * B, D), dt)
    hidden = jnp.zeros(
        (2 * B, pipe.prior.num_embeddings, pipe.text_encoder.hidden), dt)
    mask = jnp.ones((2 * B, pipe.prior.num_embeddings), bool)
    prior_fn = jax.jit(lambda p, x, t, pr, hi, m: pipe.prior.apply(
        {"params": p}, x, t, pr, hi, m))
    stages["prior_step"] = _measure(
        prior_fn, (params["prior"], xp, tp, proj, hidden, mask), iters)

    ctx = pipe.text_encoder.context_length
    toks = jnp.ones((2 * B, ctx), jnp.int32)
    text_fn = jax.jit(lambda p, t: pipe.text_encoder.apply({"params": p}, t))
    stages["clip_text_bigG"] = _measure(
        text_fn, (params["text_encoder"], toks), iters)

    peak, peak_bw = _chip_peaks()
    report = stage_report(stages, peak, peak_bw)
    model = {
        "per_image_seconds_modeled": round(
            steps * stages["unet_step"]["seconds"]
            + prior_steps * stages["prior_step"]["seconds"]
            + stages["movq_decode"]["seconds"]
            + stages["clip_text_bigG"]["seconds"], 4),
        "steps": steps, "prior_steps": prior_steps,
        "resolution": [h, w], "batch": batch, "controlnet_hint": hint,
        "unet_share_pct": round(
            100 * steps * stages["unet_step"]["seconds"]
            / max(1e-9, steps * stages["unet_step"]["seconds"]
                  + prior_steps * stages["prior_step"]["seconds"]
                  + stages["movq_decode"]["seconds"]), 2),
    }
    return {
        "family": "2.2" + ("-controlnet" if hint else ""),
        "stages": report,
        "model": model,
        "peak_tflops": None if peak is None else round(peak / 1e12, 1),
    }
