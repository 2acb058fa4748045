"""tools/xplane_op_table.py: the no-dependency xplane.pb decoder, checked
against a hand-encoded XSpace proto (wire format built byte-by-byte here,
so the test pins the schema the tool assumes)."""

import struct
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

from xplane_op_table import read_xspace, op_table  # noqa: E402


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _field(fno: int, wt: int, payload) -> bytes:
    key = _varint((fno << 3) | wt)
    if wt == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _event(md: int, dur_ps: int) -> bytes:
    return _field(1, 0, md) + _field(3, 0, dur_ps)


def _line(name: str, events) -> bytes:
    b = _field(2, 2, name.encode())
    for ev in events:
        b += _field(4, 2, ev)
    return b


def _md_entry(k: int, name: str) -> bytes:
    inner = _field(1, 0, k) + _field(2, 2, name.encode())
    return _field(1, 0, k) + _field(2, 2, inner)


def _plane(name: str, lines, mds) -> bytes:
    b = _field(2, 2, name.encode())
    for ln in lines:
        b += _field(3, 2, ln)
    for k, nm in mds:
        b += _field(4, 2, _md_entry(k, nm))
    return b


def test_reader_roundtrip(tmp_path):
    plane = _plane(
        "/device:TPU:0",
        [_line("stream0", [_event(1, 2_000_000), _event(2, 500_000),
                           _event(1, 1_000_000)])],
        [(1, "%fusion.1 = bf16[8,8] fusion(...)"), (2, "%copy.2 = ...")],
    )
    host = _plane("/host:CPU", [_line("py", [_event(7, 9_000_000)])],
                  [(7, "python")])
    xspace = _field(1, 2, plane) + _field(1, 2, host)
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(xspace)

    planes = read_xspace(str(d / "vm.xplane.pb"))
    assert [p[0] for p in planes] == ["/device:TPU:0", "/host:CPU"]

    table = op_table(str(tmp_path))
    assert table["%fusion.1 = bf16[8,8] fusion(...)"] == (3.0, 2)  # us
    assert table["%copy.2 = ..."] == (0.5, 1)
    assert "python" not in table  # host plane filtered
