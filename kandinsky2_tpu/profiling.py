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
    out = {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }
    try:
        out.update(hlo_traffic(compiled.as_text()))
    except Exception:
        # traffic accounting is best-effort: an unparseable HLO dialect
        # falls back to the XLA aggregate only
        pass
    return out


# --------------------------------------------------------------------------
# HBM traffic accounting from the optimized HLO
#
# XLA's aggregate ``bytes accessed`` counts operand bytes per USE — an
# operand a fusion re-reads while it is VMEM-resident is charged as HBM
# traffic it never causes, which round 4 measured at up to 1.45x the
# physically possible bandwidth (BENCH_PROFILE r4 prior_step).  The parser
# below walks the ENTRY computation of the optimized HLO instead and builds
# two numbers from the buffers the compiled program actually materializes,
# respecting each buffer's memory-space annotation (``S(1)`` VMEM, ``S(2)``
# SMEM destinations are not HBM traffic):
#
# * ``hbm_bytes``        — traffic MODEL: every non-free top-level
#   instruction writes its HBM-resident result once and reads each distinct
#   operand's HBM bytes once (duplicate operands of one instruction
#   deduped; alias-only ops — bitcast / tuple / get-tuple-element /
#   parameter / constant / *-done — move nothing).
# * ``hbm_floor_bytes``  — traffic FLOOR: each materialized buffer is
#   written once and each consumed buffer is read at most ONCE total (reads
#   through async slices accumulate, capped at the source's size), i.e.
#   perfect inter-instruction VMEM reuse.  This is a true lower bound for
#   the compiled graph, so ``floor_seconds <= wall`` and
#   ``pct_of_roofline <= 100`` hold by construction — the property the r4
#   model lacked.
#
# Async ops (the weight-streaming pattern XLA:TPU emits for
# parameter-dominated matmul chains — measured on the 2.1 prior, where the
# whole transformer runs VMEM-resident and only weight slices touch HBM):
#
# * ``copy-start``  = (dest, src-alias, ctx): write charged at the dest
#   component's memory space (0 for a VMEM prefetch), read = full source.
# * ``async-start`` = ((operands), dest, ctx): write likewise from the dest
#   component; read = the dest component's RAW size (the bytes the wrapped
#   slice actually pulls from the source), so four 512-row slices of one
#   2048-row weight charge one full read of it, not four.
# * ``copy-done`` / ``async-done`` alias the dest component: free to
#   produce; consumers reading them are charged the dest's HBM bytes
#   (zero when the dest lives in VMEM).
#
# Known model limits (both numbers are per compiled graph, not per
# function): synchronous slice/gather operands are charged full size
# (overcounts the model, never the floor), and ``while`` bodies are charged
# once (the profiled stages contain no loops).
# --------------------------------------------------------------------------

_HLO_FREE_OPS = {
    "parameter", "constant", "bitcast", "tuple", "get-tuple-element",
    "after-all", "add-dependency", "iota",
    # completion halves alias their start's dest component — the write was
    # charged at *-start; their own shape carries the dest's memory space,
    # so consumer reads price correctly through resolve()
    "copy-done", "async-done",
}

_HLO_DTYPE_BYTES = {
    "pred": 1, "s4": 0.5, "u4": 0.5, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
    "s32": 4, "u32": 4, "s64": 8, "u64": 8, "f8e5m2": 1, "f8e4m3fn": 1,
    "f8e4m3b11fnuz": 1, "f8e5m2fnuz": 1, "f8e4m3fnuz": 1, "bf16": 2,
    "f16": 2, "f32": 4, "f64": 8, "c64": 8, "c128": 16, "token": 0,
    "opaque": 0, "u1": 1, "s1": 1,
}

_SHAPE_RE = None  # compiled lazily


def _hlo_shape_bytes(shape: str, raw: bool = False) -> float:
    """Byte size of an HLO shape string — ``bf16[2,96,96,384]{...}`` or a
    tuple ``(f32[...], bf16[...])``.  By default pieces whose layout carries
    a non-default memory space (``S(1)`` VMEM, ``S(2)`` SMEM, ``S(5)`` host)
    live off-HBM and count zero; ``raw=True`` counts them anyway (the size
    of the data moved INTO such a buffer)."""
    import re

    global _SHAPE_RE
    if _SHAPE_RE is None:
        _SHAPE_RE = re.compile(
            r"([a-z]+[0-9a-z]*)\[([0-9,]*)\](\{[^}]*\})?")
    total = 0.0
    for dtype, dims, layout in _SHAPE_RE.findall(shape):
        unit = _HLO_DTYPE_BYTES.get(dtype)
        if unit is None or (not raw and "S(" in layout):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * unit
    return total


def _hlo_tuple_components(shape: str) -> list:
    """Top-level components of a tuple shape string; a non-tuple shape is
    its own single component."""
    s = shape.strip()
    if not s.startswith("("):
        return [s]
    return _hlo_split_operands(s[1:-1])


def _hlo_split_operands(argstr: str) -> list:
    """Split the top-level comma-separated operand list of ``op(...)``."""
    parts, depth, cur = [], 0, []
    for ch in argstr:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def hlo_traffic(hlo_text: str) -> Dict[str, float]:
    """Parse optimized HLO module text -> ``{"hbm_bytes", "hbm_floor_bytes",
    "param_bytes", "output_bytes"}`` (see the block comment above)."""
    import re

    lines = hlo_text.splitlines()
    # locate the ENTRY computation body
    entry_start = None
    for i, ln in enumerate(lines):
        if ln.startswith("ENTRY "):
            entry_start = i + 1
            break
    if entry_start is None:
        raise ValueError("no ENTRY computation in HLO text")
    op_re = re.compile(r"([\w\-]+)\((.*)$", re.DOTALL)
    # name -> (bytes, opcode, [operand names])
    table: Dict[str, tuple] = {}
    order: list = []
    root_name = None
    for ln in lines[entry_start:]:
        if ln.startswith("}"):
            break
        s = ln.strip()
        is_root = s.startswith("ROOT ")
        if is_root:
            s = s[5:]
        eq = s.find(" = ")
        if eq < 0:
            continue
        name = s[:eq].strip().lstrip("%")
        rhs = s[eq + 3:]
        # shape: tuple shapes contain parens (layout tilings like
        # T(8,128)(2,1)) — scan to the balanced close; plain shapes have no
        # spaces before the opcode
        if rhs.startswith("("):
            depth, j = 0, 0
            for j, ch in enumerate(rhs):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
            shape, rest_s = rhs[:j + 1], rhs[j + 1:].lstrip()
        else:
            sp = rhs.find(" ")
            if sp < 0:
                continue
            shape, rest_s = rhs[:sp], rhs[sp + 1:]
        m = op_re.match(rest_s)
        if not m:
            continue
        opcode, rest = m.groups()
        # operand list = rest up to the matching close paren at depth 0
        depth, end = 1, len(rest)
        for j, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = j
                    break
        ops = []
        if opcode not in ("constant",):
            for tok in _hlo_split_operands(rest[:end]):
                tok = tok.strip()
                if tok.startswith("%"):
                    tok = tok[1:]
                if re.fullmatch(r"[\w.\-]+", tok) and not tok[0].isdigit():
                    ops.append(tok)
        table[name] = (_hlo_shape_bytes(shape), opcode, ops, shape)
        order.append(name)
        if is_root:
            root_name = name

    def resolve(name):
        """Follow alias-only ops to the buffer actually read, priced at its
        own shape's memory space (an S(1) VMEM resident reads as zero)."""
        seen = set()
        while name in table and name not in seen:
            seen.add(name)
            size, opcode, ops = table[name][:3]
            if opcode == "bitcast" and ops:
                name = ops[0]
            else:
                return name, size
        return name, table.get(name, (0.0,))[0]

    writes = 0.0
    reads_model = 0.0
    consumed: Dict[str, float] = {}
    param_bytes = 0.0

    def charge_read(rname, rsize):
        nonlocal reads_model
        reads_model += rsize
        # floor: each buffer read at most once in total — partial (sliced)
        # reads accumulate, capped at the buffer's full size
        cap = table.get(rname, (0.0,))[0]
        consumed[rname] = min(cap, consumed.get(rname, 0.0) + rsize) \
            if cap else rsize

    for name in order:
        size, opcode, ops, shape = table[name]
        if opcode == "parameter":
            param_bytes += size
        if opcode in _HLO_FREE_OPS:
            continue
        if opcode == "copy-start":
            # (dest, src-alias, ctx): write only the dest component (zero
            # for a VMEM cross-program prefetch); read the full source below
            comps = _hlo_tuple_components(shape)
            writes += _hlo_shape_bytes(comps[0]) if comps else 0.0
        elif opcode == "async-start":
            # ((operands), dest, ctx): write the dest component; read the
            # dest's RAW size from the largest real operand — the bytes the
            # wrapped slice pulls, not the whole source per slice
            comps = _hlo_tuple_components(shape)
            dest = comps[1] if len(comps) > 1 else ""
            writes += _hlo_shape_bytes(dest)
            moved = _hlo_shape_bytes(dest, raw=True)
            src, src_size = None, -1.0
            for op_name in ops:
                if op_name not in table:
                    continue
                rname, rsize = resolve(op_name)
                if rsize > src_size:
                    src, src_size = rname, rsize
            if src is not None and src_size > 0:
                charge_read(src, min(moved, src_size))
            continue
        else:
            writes += size
        uniq = {}
        for op_name in ops:
            if op_name not in table:
                continue
            rname, rsize = resolve(op_name)
            rop = table.get(rname, (0.0, "", []))[1]
            if rop in ("constant", "after-all", "iota"):
                continue
            uniq[rname] = rsize
        for rname, rsize in uniq.items():
            charge_read(rname, rsize)
    # tuple/gte plumbing around the root doesn't change totals: outputs were
    # written by their producing instructions already
    output_bytes = table.get(root_name, (0.0,))[0] if root_name else 0.0
    reads_floor = sum(consumed.values())
    return {
        "hbm_bytes": writes + reads_model,
        "hbm_floor_bytes": writes + reads_floor,
        "param_bytes": param_bytes,
        "output_bytes": output_bytes,
    }


def _sync(out) -> None:
    """Force completion with a device→host fetch.  Through the tunneled
    (axon) TPU client ``block_until_ready`` can return before the device
    work drains, which inflates throughput to impossible numbers; a host
    fetch cannot.  Fetch a device-side SCALAR reduce of one leaf, not the
    leaf itself — pulling a full activation tensor through the tunnel
    (~MB/ms) would bill host transfer to the measured stage."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))


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

    Byte accounting (round-5 correction — see the ``hlo_traffic`` block
    comment): ``hbm_gb`` is the per-read traffic model of the compiled
    graph, ``hbm_floor_gb`` the re-read-free floor; ``xla_bytes_gb`` keeps
    XLA's aggregate (which charges VMEM-resident re-reads as HBM traffic
    and exceeded the physically possible bandwidth in round 4) for
    reference only.  ``roofline_floor_seconds`` is built from the FLOOR
    bytes, so ``pct_of_roofline <= 100`` holds by construction — asserted,
    with a 2% allowance for timer jitter."""
    out = {}
    for name, s in stages.items():
        sec = s["seconds"]
        achieved = s["flops"] / sec if sec > 0 else 0.0
        have_traffic = "hbm_bytes" in s and s["hbm_bytes"] > 0
        traffic = s["hbm_bytes"] if have_traffic else s["bytes"]
        floor_bytes = s.get("hbm_floor_bytes", s["bytes"])
        row = {
            "seconds": round(sec, 6),
            "gflops": round(s["flops"] / 1e9, 3),
            "achieved_tflops": round(achieved / 1e12, 3),
            "xla_bytes_gb": round(s["bytes"] / 1e9, 4),
            "flops_per_byte": round(s["flops"] / traffic, 2)
            if traffic else None,
        }
        if have_traffic:
            row["hbm_gb"] = round(s["hbm_bytes"] / 1e9, 4)
            row["hbm_floor_gb"] = round(floor_bytes / 1e9, 4)
            row["param_gb"] = round(s.get("param_bytes", 0.0) / 1e9, 4)
        if peak_flops:
            row["mfu_pct"] = round(100.0 * achieved / peak_flops, 2)
        if peak_bw and traffic:
            row["achieved_gbps"] = round(traffic / sec / 1e9, 1)
            row["hbm_bw_pct"] = round(100.0 * traffic / sec / peak_bw, 2)
        if peak_flops and peak_bw and floor_bytes:
            compute_floor = s["flops"] / peak_flops
            bw_floor = floor_bytes / peak_bw
            bound = "compute" if compute_floor >= bw_floor else "memory"
            floor = max(compute_floor, bw_floor)
            row["roofline_bound"] = bound
            row["roofline_floor_seconds"] = round(floor, 6)
            pct = 100.0 * floor / sec
            if have_traffic and pct > 102.0:
                raise AssertionError(
                    f"stage {name}: floor {floor:.6f}s above measured wall "
                    f"{sec:.6f}s ({pct:.1f}% of roofline) — the floor model "
                    "is not a floor; investigate hlo_traffic accounting"
                )
            row["pct_of_roofline"] = round(pct, 2)
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
