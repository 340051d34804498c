"""Minimal XSpace (jax.profiler xplane.pb) parser + per-op aggregation.

tensorboard_plugin_profile in this image can't convert xplane (its TF build
lacks xspace_to_tools_data), so this decodes the protobuf wire format
directly with the known XPlane schema and aggregates device-side HLO op
durations — enough to answer "where does the step time go?".

Schema (tensorflow/tsl xplane.proto, stable for years):
  XSpace:   planes=1(repeated XPlane)
  XPlane:   id=1, name=2, lines=3, event_metadata=4(map), stat_metadata=5(map)
  XLine:    id=1, display_id=2, name=3, display_name=4, timestamp_ns=5,
            events=8? -> actually events=8 in some versions; handle 6..8
  XEvent:   metadata_id=1, offset_ps=2, duration_ps=3, stats=4,
            num_occurrences=5
  XEventMetadata: id=1, name=2, display_name=3
Map entries: key=1, value=2.

Usage:
  python bench/xplane.py <trace_dir_or_pb> [top_n]
"""
from __future__ import annotations

import collections
import glob
import os
import struct
import sys


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack("<q", buf[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<i", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf):
    """XPlane: name=2, lines=3, event_metadata=4 (inline XEventMetadata
    {id=1, name=2}) — layout confirmed against this jax build's traces."""
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3 and wt == 2:
            lines.append(v)
        elif fn == 4 and wt == 2:
            k = None
            mname = ""
            for fn2, wt2, v2 in fields(v):
                if fn2 == 1 and wt2 == 0:
                    k = v2
                elif fn2 == 2 and wt2 == 2:
                    mname = v2.decode("utf-8", "replace")
            if k is not None:
                meta[k] = mname
    return name, lines, meta


def parse_line(buf):
    """XLine: id=1, name=2, events=4."""
    name = ""
    events = []
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4 and wt == 2:
            events.append(v)
    return name, events


def parse_event(buf):
    mid = dur = occ = 0
    for fn, wt, v in fields(buf):
        if fn == 1 and wt == 0:
            mid = v
        elif fn == 3 and wt == 0:
            dur = v
        elif fn == 5 and wt == 0:
            occ = v
    return mid, dur, occ


def load(path):
    """path: trace dir or .xplane.pb file → list of (plane_name, line_name,
    op_name, total_dur_ps, count)."""
    if os.path.isdir(path):
        pbs = glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                        recursive=True)
        if not pbs:
            raise FileNotFoundError(f"no xplane.pb under {path}")
        path = max(pbs, key=os.path.getmtime)
    buf = open(path, "rb").read()
    rows = []
    for fn, wt, v in fields(buf):
        if fn != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(v)
        for lb in lines:
            lname, events = parse_line(lb)
            agg = collections.Counter()
            cnt = collections.Counter()
            for eb in events:
                try:
                    mid, dur, occ = parse_event(eb)
                except Exception:
                    continue
                agg[mid] += dur
                cnt[mid] += max(occ, 1)
            for mid, dur in agg.items():
                rows.append((pname, lname, meta.get(mid, f"#{mid}"), dur,
                             cnt[mid]))
    return rows


def device_op_table(path, top=30):
    rows = load(path)
    dev = [r for r in rows if "TPU" in r[0] or "/device" in r[0].lower()]
    if not dev:
        dev = rows
    # XLA op lines are usually named 'XLA Ops' / 'Steps'; aggregate per op
    agg = collections.Counter()
    cnt = collections.Counter()
    for pname, lname, op, dur, c in dev:
        if "op" in lname.lower() or "xla" in lname.lower():
            agg[op] += dur
            cnt[op] += c
    if not agg:  # fall back: everything on the device plane
        for pname, lname, op, dur, c in dev:
            agg[op] += dur
            cnt[op] += c
    total = sum(agg.values())
    out = []
    for op, dur in agg.most_common(top):
        out.append((op, dur / 1e9, 100.0 * dur / max(total, 1), cnt[op]))
    return out, total / 1e9


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_trace"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    table, total_ms = device_op_table(path, top)
    print(f"total device op time: {total_ms:.2f} ms")
    print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
    for op, ms, pct, c in table:
        print(f"{ms:10.2f} {pct:6.1f} {c:7d}  {op[:110]}")
