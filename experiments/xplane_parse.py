"""Minimal XSpace (TPU profiler xplane.pb) parser + per-op aggregator.

tensorboard-plugin-profile in this image ships no xplane_pb2, so this
decodes the protobuf wire format directly (field numbers from
tsl/profiler/protobuf/xplane.proto, stable across TF/TSL releases):

  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4(map),
  stat_metadata=5(map)}; XLine{id=1,name=2,timestamp_ns=3,events=4};
  XEvent{metadata_id=1,offset_ps=2,duration_ps=3,stats=4};
  XEventMetadata{id=1,name=2,metadata=3,stats=5};
  XStat{metadata_id=1,double=2,uint64=3,int64=4,str=5,bytes=6,ref=7};
  XStatMetadata{id=1,name=2}.

Usage: python experiments/xplane_parse.py <xplane.pb> [top_n]
Prints, for each TPU device plane line, total/per-op aggregated durations
with HLO category and op name — the per-op breakdown of the bulk serving
program that ablation monkeypatching can only approximate.
"""

from __future__ import annotations

import struct
import sys
from collections import defaultdict


def _read_varint(buf, i):
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
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _read_varint(buf, i)
        elif wt == 1:
            val = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:
            val = struct.unpack_from("<I", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_stat(buf, stat_md):
    sid = None
    val = None
    for fnum, wt, v in fields(buf):
        if fnum == 1:
            sid = v
        elif fnum == 2:
            val = struct.unpack("<d", struct.pack("<Q", v))[0]
        elif fnum in (3, 4, 7):
            val = v
        elif fnum in (5, 6):
            val = v.decode("utf-8", "replace")
    return stat_md.get(sid, str(sid)), val


def parse_plane(buf):
    name = ""
    lines = []
    event_md = {}
    stat_md = {}
    raw_lines = []
    raw_emd = []
    for fnum, wt, v in fields(buf):
        if fnum == 2:
            name = v.decode()
        elif fnum == 3:
            raw_lines.append(v)
        elif fnum == 4:
            raw_emd.append(v)
        elif fnum == 5:
            k = None
            nm = None
            for f2, _, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    for f3, _, v3 in fields(v2):
                        if f3 == 1:
                            k = v3
                        elif f3 == 2:
                            nm = v3.decode()
            if k is not None:
                stat_md[k] = nm
    for v in raw_emd:
        k = None
        md = {}
        for f2, _, v2 in fields(v):
            if f2 == 1:
                k = v2
            elif f2 == 2:
                for f3, _, v3 in fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        md["name"] = v3.decode()
                    elif f3 == 5:
                        s, sval = parse_stat(v3, stat_md)
                        md[s] = sval
        if k is not None:
            event_md[k] = md
    for v in raw_lines:
        lname = ""
        events = []
        for f2, _, v2 in fields(v):
            if f2 == 2:
                lname = v2.decode()
            elif f2 == 4:
                mid = None
                dur = 0
                for f3, _, v3 in fields(v2):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 3:
                        dur = v3
                events.append((mid, dur))
        lines.append((lname, events))
    return name, lines, event_md, stat_md


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    buf = open(path, "rb").read()
    for fnum, wt, v in fields(buf):
        if fnum != 1:
            continue
        name, lines, emd, smd = parse_plane(v)
        if "TPU" not in name or "#Chip" in name.split(":")[-1] and False:
            continue
        print(f"\n=== plane: {name} ===")
        for lname, events in lines:
            if not events:
                continue
            total = sum(d for _, d in events) / 1e6  # us
            agg = defaultdict(lambda: [0, 0])
            for mid, dur in events:
                md = emd.get(mid, {})
                key = md.get("name", str(mid))
                agg[key][0] += dur
                agg[key][1] += 1
            print(f"-- line '{lname}': {len(events)} events, total {total/1e3:.1f} ms")
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
            for key, (dur, cnt) in rows:
                md = next((m for m in emd.values() if m.get("name") == key), {})
                cat = md.get("hlo_category", "")
                extra = ""
                if md.get("bytes_accessed"):
                    extra = f" bytes={md['bytes_accessed']}"
                print(f"   {dur/1e6:10.2f} us  x{cnt:6d}  [{cat:>18s}] {key[:70]}{extra}")


if __name__ == "__main__":
    main()
