"""Minimal XSpace/XPlane protobuf reader (no tensorflow dependency).

jax.profiler captures write a ``*.xplane.pb`` (tsl XSpace proto) next to the
``*.trace.json.gz``. Through the axon tunnel the json conversion only carries
host events, but the xplane retains the DEVICE plane (``/device:TPU:0``) with
per-event ``duration_ps`` measured on the device clock — immune to the
~25 ms tunnel RTT that poisons host-side wall timing (CLAUDE.md). This module
hand-decodes the few message types we need:

    XSpace { repeated XPlane planes = 1; }
    XPlane { id=1; name=2; repeated XLine lines=3;
             map<int64,XEventMetadata> event_metadata=4; }
    XLine  { id=1; name=2; timestamp_ns=3; repeated XEvent events=4; }
    XEvent { metadata_id=1; offset_ps=2; duration_ps=3; }
    XEventMetadata { id=1; name=2; }

Used by tools/kernel_trace.py (in-kernel phase anatomy) and ad-hoc device
profiling; the reference had no profiler integration at all (SURVEY §5.1).
"""
from __future__ import annotations

import dataclasses
from typing import Iterator


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = res = 0
    while True:
        b = buf[i]
        res |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return res, i
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, i = _varint(buf, i)
        elif wire == 1:  # 64-bit
            val = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


@dataclasses.dataclass
class Event:
    name: str
    offset_ps: int
    duration_ps: int


@dataclasses.dataclass
class Line:
    name: str
    events: list[Event]


@dataclasses.dataclass
class Plane:
    name: str
    lines: list[Line]


def _parse_event(buf: bytes) -> tuple[int, int, int]:
    mid = off = dur = 0
    for f, _, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            off = v
        elif f == 3:
            dur = v
    return mid, off, dur


def _parse_line(buf: bytes, names: dict[int, str]) -> Line:
    name, events = "", []
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 4:
            mid, off, dur = _parse_event(v)
            events.append(Event(names.get(mid, f"#{mid}"), off, dur))
    return Line(name, events)


def _parse_plane(buf: bytes) -> Plane:
    name = ""
    line_bufs: list[bytes] = []
    names: dict[int, str] = {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            line_bufs.append(v)
        elif f == 4:  # map<int64, XEventMetadata> entry {key=1, value=2}
            key, meta = 0, b""
            for ff, _, vv in _fields(v):
                if ff == 1:
                    key = vv
                elif ff == 2:
                    meta = vv
            mname = ""
            for ff, _, vv in _fields(meta):
                if ff == 2:
                    mname = vv.decode("utf-8", "replace")
            names[key] = mname
    return Plane(name, [_parse_line(b, names) for b in line_bufs])


def parse_xspace(path: str) -> list[Plane]:
    data = open(path, "rb").read()
    return [_parse_plane(v) for f, _, v in _fields(data) if f == 1]


def device_planes(path: str) -> list[Plane]:
    return [p for p in parse_xspace(path) if "/device:" in p.name]


def op_kind(name: str) -> str:
    """Coarse HLO op kind from an XLA-Ops event name: '%foo.3 = bf16[...]
    custom-call(...)' → 'custom-call', plus the %var stem for custom calls
    and fusions (the stem identifies WHICH kernel/fusion)."""
    stem = name.split(" ", 1)[0].lstrip("%").rstrip("0123456789").rstrip(".")
    rhs = name.split("} ", 1)[-1]
    for kind in ("custom-call", "fusion", "copy-start", "copy-done", "copy",
                 "convolution", "dot", "broadcast", "transpose", "reduce",
                 "dynamic-slice", "dynamic-update-slice", "iota", "select",
                 "all-reduce", "all-gather", "convert", "pad", "slice"):
        if rhs.startswith(kind + "(") or f" {kind}(" in name:
            return f"{kind}:{stem}" if kind in (
                "custom-call", "fusion") else kind
    return stem


def summarize(path: str, topk: int = 30, line_name: str = "XLA Ops"):
    """Aggregate device time per op kind from a capture's xplane.pb.
    Returns [(kind, count, total_ms)] sorted by total time desc."""
    import collections

    agg = collections.defaultdict(lambda: [0, 0.0])
    for plane in device_planes(path):
        for line in plane.lines:
            if line.name != line_name:
                continue
            for e in line.events:
                k = op_kind(e.name)
                agg[k][0] += 1
                agg[k][1] += e.duration_ps / 1e9
    rows = sorted(
        ((k, c, ms) for k, (c, ms) in agg.items()), key=lambda r: -r[2]
    )
    return rows[:topk]


if __name__ == "__main__":
    import sys

    for plane in parse_xspace(sys.argv[1]):
        print(f"plane {plane.name!r}: {len(plane.lines)} lines")
        for line in plane.lines:
            tot = sum(e.duration_ps for e in line.events)
            print(f"  line {line.name!r}: {len(line.events)} events, "
                  f"{tot / 1e9:.3f} ms total")
            from collections import Counter

            c = Counter(e.name for e in line.events)
            for nm, cnt in c.most_common(10):
                dur = sum(e.duration_ps for e in line.events if e.name == nm)
                print(f"    {cnt:6d}× {nm[:70]:70s} {dur / 1e9:9.3f} ms")
