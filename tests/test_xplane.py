"""Unit test for the dependency-free .xplane.pb reader: a handcrafted
XSpace protobuf (tsl/profiler xplane.proto wire format) must decode to
the expected planes/lines/events/stats. Guards scripts/profile_xprof.py
against wire-format regressions without needing jax.profiler."""
import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gcl_tpu.utils.xplane import parse_xspace


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload) -> bytes:
    tag = _varint((num << 3) | wire)
    if wire == 0:
        return tag + _varint(payload)
    if wire == 1:
        return tag + payload  # caller packs 8 bytes
    return tag + _varint(len(payload)) + payload  # wire 2


def _msg(*fields: bytes) -> bytes:
    return b"".join(fields)


def test_parse_handcrafted_xspace(tmp_path):
    # metadata tables: event id 7 -> "fusion.1" (display name wins),
    # stat id 3 -> "hlo_category"
    ev_meta = _field(4, 2, _msg(
        _field(1, 0, 7),
        _field(2, 2, _msg(_field(1, 0, 7), _field(2, 2, b"raw"),
                          _field(4, 2, b"fusion.1")))))
    stat_meta = _field(5, 2, _msg(
        _field(1, 0, 3),
        _field(2, 2, _msg(_field(1, 0, 3),
                          _field(2, 2, b"hlo_category")))))
    stat = _field(4, 2, _msg(_field(1, 0, 3),
                             _field(5, 2, b"convolution")))
    dstat = _field(4, 2, _msg(_field(1, 0, 3),
                              _field(2, 1, struct.pack("<d", 2.5))))
    ev1 = _field(4, 2, _msg(_field(1, 0, 7), _field(2, 0, 1000),
                            _field(3, 0, 500), stat))
    ev2 = _field(4, 2, _msg(_field(1, 0, 99), _field(2, 0, 2000),
                            _field(3, 0, 250), dstat))
    line = _field(3, 2, _msg(_field(2, 2, b"XLA Ops"),
                             _field(3, 0, 123456789), ev1, ev2))
    plane = _field(1, 2, _msg(_field(2, 2, b"/device:TPU:0"),
                              ev_meta, stat_meta, line))
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(plane)

    planes = parse_xspace(str(path))
    assert len(planes) == 1
    p = planes[0]
    assert p.name == "/device:TPU:0"
    assert len(p.lines) == 1
    ln = p.lines[0]
    assert ln.name == "XLA Ops" and ln.timestamp_ns == 123456789
    assert len(ln.events) == 2
    e1, e2 = ln.events
    assert e1.name == "fusion.1"  # display_name preferred
    assert (e1.offset_ps, e1.duration_ps) == (1000, 500)
    assert e1.stats["hlo_category"] == "convolution"
    assert e2.name == "99"  # unknown metadata id falls back to the id
    assert e2.stats["hlo_category"] == 2.5  # double-typed stat
