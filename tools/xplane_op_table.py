#!/usr/bin/env python
"""Per-op device-time tables from a ``jax.profiler.trace`` capture — no
TensorFlow/tensorboard dependency.

``jax.profiler.trace(dir)`` writes an ``*.xplane.pb`` proto; the stock
reader lives in tensorboard_plugin_profile, whose generated protos don't
load against this image's protobuf.  The XSpace schema is small and stable
(tensorflow/core/profiler/protobuf/xplane.proto), so this module decodes
the wire format directly and aggregates event durations per HLO op — the
tool every r5 kernel decision was measured with (attention logits dtype,
upsample-conv folding, SpatialNorm machinery).

Usage:
    python tools/xplane_op_table.py /tmp/trace_dir [top_n]         # per-op
    python tools/xplane_op_table.py /tmp/trace_dir [top_n] --agg   # by
                                                   (opcode, result shape)

Caveats: durations of async ops (``copy-start``/``slice-start``) span until
their completion and overlap compute — treat them as occupancy, not cost;
``jit_<fn>`` umbrella events give the per-dispatch device wall.
"""

from __future__ import annotations

import collections
import glob
import re
import sys

# --- minimal protobuf wire-format decoding ---------------------------------


def _read_varint(b: bytes, i: int):
    r = 0
    s = 0
    while True:
        x = b[i]
        i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def _fields(b: bytes):
    """Yield (field_no, wire_type, value) over a message body."""
    i, n = 0, len(b)
    while i < n:
        key, i = _read_varint(b, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(b, i)
        elif wt == 1:
            v = b[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(b, i)
            v = b[i:i + ln]
            i += ln
        elif wt == 5:
            v = b[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


# --- XSpace schema (field numbers from xplane.proto) ------------------------


def _parse_event(b):
    md, dur = 0, 0
    for fno, _, v in _fields(b):
        if fno == 1:
            md = v
        elif fno == 3:
            dur = v
    return md, dur


def _parse_line(b):
    name, events = "", []
    for fno, _, v in _fields(b):
        if fno == 2:
            name = v.decode()
        elif fno == 11 and v:
            name = v.decode()
        elif fno == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_md_entry(b):
    k, name = 0, ""
    for fno, _, v in _fields(b):
        if fno == 1:
            k = v
        elif fno == 2:
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode()
    return k, name


def _parse_plane(b):
    name, lines, emd = "", [], {}
    for fno, _, v in _fields(b):
        if fno == 2:
            name = v.decode()
        elif fno == 3:
            lines.append(_parse_line(v))
        elif fno == 4:
            k, nm = _parse_md_entry(v)
            emd[k] = nm
    return name, lines, emd


def read_xspace(path: str):
    """xplane.pb -> [(plane_name, [(line_name, [(md_id, dur_ps)])], {md_id:
    op_name})]."""
    buf = open(path, "rb").read()
    return [_parse_plane(v) for fno, _, v in _fields(buf) if fno == 1]


def latest_xplane(trace_dir: str) -> str:
    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not files:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    return files[-1]


def op_table(trace_dir: str, device_substr: str = "TPU"):
    """{op_name: (total_us, count)} summed over all lines of the device
    plane of the NEWEST capture under ``trace_dir``."""
    out = {}
    for name, lines, emd in read_xspace(latest_xplane(trace_dir)):
        if device_substr not in name:
            continue
        tot = collections.Counter()
        cnt = collections.Counter()
        for _, events in lines:
            for md, dur in events:
                op = emd.get(md, str(md))
                tot[op] += dur / 1e6
                cnt[op] += 1
        out = {op: (us, cnt[op]) for op, us in tot.items()}
    return out


def agg_table(trace_dir: str, device_substr: str = "TPU"):
    """Like op_table but keyed by (opcode, result-shape prefix) — merges the
    per-instruction noise into per-kind totals."""
    pat = re.compile(r"%([a-zA-Z\-_]+)[\d.]* = (\S+)")
    out = collections.Counter()
    cnt = collections.Counter()
    for op, (us, c) in op_table(trace_dir, device_substr).items():
        if op.startswith("jit_"):
            continue
        m = pat.match(op)
        key = (m.group(1), m.group(2)[:46]) if m else (op[:30], "")
        out[key] += us
        cnt[key] += c
    return {k: (us, cnt[k]) for k, us in out.items()}


def main(argv):
    trace_dir = argv[1]
    top = int(argv[2]) if len(argv) > 2 and argv[2].isdigit() else 30
    table = agg_table(trace_dir) if "--agg" in argv else op_table(trace_dir)
    rows = sorted(table.items(), key=lambda kv: -kv[1][0])
    grand = sum(us for us, _ in table.values())
    print(f"total device-op time: {grand / 1e3:.3f} ms "
          f"({sum(c for _, c in table.values())} events)")
    for key, (us, c) in rows[:top]:
        label = " ".join(key) if isinstance(key, tuple) else key
        print(f"  {us:10.1f} us {c:6d}x  {label[:110]}")


if __name__ == "__main__":
    main(sys.argv)
