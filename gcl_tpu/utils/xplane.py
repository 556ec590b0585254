"""Minimal pure-Python reader for XLA profiler `.xplane.pb` traces.

`jax.profiler.trace` writes an XSpace protobuf per host
(`plugins/profile/<run>/<host>.xplane.pb`). The installed
tensorboard_plugin_profile's compiled converters are incompatible with
the baked TF build, so this module decodes the wire format directly —
just enough structure (planes → lines → events + metadata tables) to
aggregate device-side op times for perf analysis (scripts/
profile_xprof.py). No protobuf runtime needed.

Schema (tsl/profiler/protobuf/xplane.proto):
  XSpace.planes=1
  XPlane: id=1 name=2 lines=3 event_metadata(map)=4 stat_metadata(map)=5
  XLine:  id=1 name=2 timestamp_ns=3 events=4 duration_ps=9
  XEvent: metadata_id=1 offset_ps=2 duration_ps=3 stats=4
  XEventMetadata: id=1 name=2 display_name=4
  XStatMetadata:  id=1 name=2
  XStat: metadata_id=1 double=2 uint64=3 int64=4 str=5 bytes=6 ref=7
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message body."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:  # pragma: no cover - groups unused by xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


@dataclasses.dataclass
class Event:
    name: str
    offset_ps: int
    duration_ps: int
    stats: Dict[str, object]


@dataclasses.dataclass
class Line:
    name: str
    timestamp_ns: int
    events: List[Event]


@dataclasses.dataclass
class Plane:
    name: str
    lines: List[Line]


def _decode_map_entry(buf: bytes) -> Tuple[int, bytes]:
    key, val = 0, b""
    for fnum, _, v in _fields(buf):
        if fnum == 1:
            key = v
        elif fnum == 2:
            val = v
    return key, val


def _decode_stat(buf: bytes, stat_names: Dict[int, str]
                 ) -> Tuple[str, object]:
    mid, val = 0, None
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            mid = v
        elif fnum == 2:
            import struct
            val = struct.unpack("<d", v)[0]
        elif fnum in (3, 4, 7):
            val = v
        elif fnum == 5:
            val = v.decode("utf-8", "replace")
        elif fnum == 6:
            val = v
    return stat_names.get(mid, str(mid)), val


def _decode_event(buf: bytes, ev_names: Dict[int, str],
                  stat_names: Dict[int, str]) -> Event:
    mid = 0
    off = 0
    dur = 0
    stats: Dict[str, object] = {}
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            mid = v
        elif fnum == 2:
            off = v
        elif fnum == 3:
            dur = v
        elif fnum == 4:
            k, sv = _decode_stat(v, stat_names)
            stats[k] = sv
    return Event(ev_names.get(mid, str(mid)), off, dur, stats)


def _decode_line(buf: bytes, ev_names: Dict[int, str],
                 stat_names: Dict[int, str]) -> Line:
    name = ""
    ts = 0
    events: List[Event] = []
    for fnum, wt, v in _fields(buf):
        if fnum == 2:
            name = v.decode("utf-8", "replace")
        elif fnum == 3:
            ts = v
        elif fnum == 4:
            events.append(_decode_event(v, ev_names, stat_names))
    return Line(name, ts, events)


def _decode_event_metadata(buf: bytes) -> str:
    name = ""
    display = ""
    for fnum, wt, v in _fields(buf):
        if fnum == 2:
            name = v.decode("utf-8", "replace")
        elif fnum == 4:
            display = v.decode("utf-8", "replace")
    return display or name


def _decode_stat_metadata(buf: bytes) -> str:
    for fnum, wt, v in _fields(buf):
        if fnum == 2:
            return v.decode("utf-8", "replace")
    return ""


def _decode_plane(buf: bytes) -> Plane:
    name = ""
    line_bufs: List[bytes] = []
    ev_names: Dict[int, str] = {}
    stat_names: Dict[int, str] = {}
    for fnum, wt, v in _fields(buf):
        if fnum == 2:
            name = v.decode("utf-8", "replace")
        elif fnum == 3:
            line_bufs.append(v)
        elif fnum == 4:
            k, mv = _decode_map_entry(v)
            ev_names[k] = _decode_event_metadata(mv)
        elif fnum == 5:
            k, mv = _decode_map_entry(v)
            stat_names[k] = _decode_stat_metadata(mv)
    lines = [_decode_line(b, ev_names, stat_names) for b in line_bufs]
    return Plane(name, lines)


def parse_xspace(path: str) -> List[Plane]:
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fnum, wt, v in _fields(buf):
        if fnum == 1:
            planes.append(_decode_plane(v))
    return planes
