"""Minimal pure-python reader for jax.profiler XSpace traces.

`jax.profiler.start_trace(dir)` writes `plugins/profile/<run>/*.xplane.pb` —
an `XSpace` protobuf (tensorflow/tsl/profiler/protobuf/xplane.proto). The
usual consumer is TensorBoard's profile plugin, which is not in this image,
so this module decodes the wire format directly (protobuf wire encoding is
simple: varint keys, length-delimited submessages) and exposes the planes /
lines / events with their durations — enough to build per-op time tables
(tools/profile_top_ops.py) without any TF dependency.

Schema subset (field numbers from xplane.proto):
  XSpace:   planes=1 (XPlane)
  XPlane:   id=1, name=2, lines=3 (XLine), event_metadata=4 (map<int64,
            XEventMetadata>), stat_metadata=5 (map<int64, XStatMetadata>)
  XLine:    id=1, name=2, timestamp_ns=3, events=4 (XEvent),
            display_name=11  (verified against a real trace: the events
            field is 4, not the 9 some proto mirrors show)
  XEvent:   metadata_id=1, offset_ps=2, duration_ps=3, stats=4 (XStat),
            num_occurrences=5
  XEventMetadata: id=1, name=2, display_name=3
  XStatMetadata:  id=1, name=2
  XStat:    metadata_id=1, double=2, uint64=3, int64=4, str=5, bytes=6,
            ref=7 (index into stat_metadata of str values)
  map entries: key=1, value=2
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _zigzag(v: int) -> int:  # not used by xplane (no sint fields) but cheap
    return (v >> 1) ^ -(v & 1)


def iter_fields(buf: bytes) -> Iterator[Tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) over a serialized message.

    wire types: 0 varint (int), 1 fixed64 (bytes[8]), 2 length-delimited
    (bytes), 5 fixed32 (bytes[4]).
    """
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wt} at byte {i}")
        yield field, wt, v


def _map_entry(buf: bytes) -> Tuple[int, bytes]:
    k, v = 0, b""
    for f, wt, val in iter_fields(buf):
        if f == 1:
            k = val
        elif f == 2:
            v = val
    return k, v


class XEvent:
    __slots__ = ("metadata_id", "offset_ps", "duration_ps",
                 "num_occurrences", "stats")

    def __init__(self, buf: bytes):
        self.metadata_id = 0
        self.offset_ps = 0
        self.duration_ps = 0
        self.num_occurrences = 0
        self.stats: List[bytes] = []
        for f, wt, v in iter_fields(buf):
            if f == 1:
                self.metadata_id = v
            elif f == 2:
                self.offset_ps = v
            elif f == 3:
                self.duration_ps = v
            elif f == 4:
                self.stats.append(v)
            elif f == 5:
                self.num_occurrences = v


class XLine:
    __slots__ = ("id", "name", "timestamp_ns", "events", "display_name")

    def __init__(self, buf: bytes):
        self.id = 0
        self.name = ""
        self.timestamp_ns = 0
        self.events: List[XEvent] = []
        self.display_name = ""
        for f, wt, v in iter_fields(buf):
            if f == 1:
                self.id = v
            elif f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 3:
                self.timestamp_ns = v
            elif f == 4:
                self.events.append(XEvent(v))
            elif f == 11:
                self.display_name = v.decode("utf-8", "replace")


def _named(buf: bytes) -> Tuple[int, str, str]:
    """(id, name, display_name) of an X{Event,Stat}Metadata message."""
    mid, name, disp = 0, "", ""
    for f, wt, v in iter_fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            disp = v.decode("utf-8", "replace")
    return mid, name, disp


class XPlane:
    __slots__ = ("id", "name", "lines", "event_metadata", "stat_metadata")

    def __init__(self, buf: bytes):
        self.id = 0
        self.name = ""
        self.lines: List[XLine] = []
        self.event_metadata: Dict[int, str] = {}
        self.stat_metadata: Dict[int, str] = {}
        for f, wt, v in iter_fields(buf):
            if f == 1:
                self.id = v
            elif f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 3:
                self.lines.append(XLine(v))
            elif f == 4:
                k, mv = _map_entry(v)
                mid, name, disp = _named(mv)
                self.event_metadata[k or mid] = disp or name
            elif f == 5:
                k, mv = _map_entry(v)
                mid, name, _ = _named(mv)
                self.stat_metadata[k or mid] = name


def load_xspace(path: str) -> List[XPlane]:
    with open(path, "rb") as fh:
        buf = fh.read()
    return [XPlane(v) for f, wt, v in iter_fields(buf) if f == 1]


def find_xplane_files(trace_dir: str) -> List[str]:
    out = []
    for root, _dirs, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                out.append(os.path.join(root, f))
    return sorted(out)


def op_time_table(planes: List[XPlane], plane_filter: str = "") -> Dict[str, dict]:
    """Aggregate event durations by event name across matching planes.

    Returns {event_name: {"total_ps", "count", "plane"}} — for device planes
    (names like '/device:TPU:0') the events on XLA-op lines are the per-op
    executions; summing durations over a steady-state window gives the op
    time distribution.
    """
    table: Dict[str, dict] = {}
    for plane in planes:
        if plane_filter and plane_filter not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata.get(ev.metadata_id,
                                                f"#{ev.metadata_id}")
                row = table.setdefault(name, {"total_ps": 0, "count": 0,
                                              "plane": plane.name,
                                              "line": line.name})
                row["total_ps"] += ev.duration_ps
                row["count"] += max(1, ev.num_occurrences)
    return table
