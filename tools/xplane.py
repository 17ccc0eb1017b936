"""Minimal XSpace/XPlane wire-format parser for jax.profiler traces.

On the axon-tunnelled runtime, wall-clock timings include ~3 ms/step of relay
dispatch overhead and `block_until_ready` can return before device execution
completes (NOTES_r2.md "bench honesty") — the device trace is the only ground
truth. This tool reads the `*.xplane.pb` file that `jax.profiler.trace(dir)`
drops under `<dir>/plugins/profile/<ts>/` WITHOUT needing tensorboard or
tensorflow: it walks the protobuf wire format directly (XSpace field 1 =
planes; plane: 2=name, 3=lines, 4=event_metadata; line: 2/11=name, 4=events;
event: 1=metadata_id, 2=offset_ps, 3=duration_ps).

Usage:
    python tools/xplane.py agg  <trace.xplane.pb>   # per-op total durations
    python tools/xplane.py tl   <trace.xplane.pb>   # TPU timeline (first 40)

`agg` prints per-plane op-name totals (the fwd/bwd/kernel breakdown); `tl`
prints the ordered TPU event timeline with offsets.
"""

from __future__ import annotations

import collections
import struct
import sys


def _varint(buf: bytes, i: int):
    r = s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    """Yield (field_number, value) pairs of one protobuf message."""
    i = 0
    while i < len(buf):
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fn, v
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fn, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fn, struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wt == 1:
            yield fn, struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        else:  # pragma: no cover - groups don't appear in XSpace
            raise ValueError(f"unsupported wire type {wt}")


def _parse_plane(plane: bytes):
    """(name, {metadata_id: op_name}, [line bytes])."""
    name, emeta, lines = "", {}, []
    for f2, v in _fields(plane):
        if f2 == 2:
            name = v.decode()
        elif f2 == 4:  # event_metadata map entry
            mid, mname = None, ""
            for f3, v3 in _fields(v):
                if f3 == 1:
                    mid = v3
                elif f3 == 2:
                    for f4, v4 in _fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 2:
                            mname = v4.decode()
            emeta[mid] = mname
        elif f2 == 3:
            lines.append(v)
    return name, emeta, lines


def _parse_line(line: bytes):
    """(line_name, [(offset_ps, duration_ps, metadata_id)])."""
    lname, evs = "", []
    for f3, v3 in _fields(line):
        if f3 in (2, 11) and isinstance(v3, bytes):
            lname = v3.decode()
        elif f3 == 4 and isinstance(v3, bytes):
            mid = dur = off = 0
            for f4, v4 in _fields(v3):
                if f4 == 1:
                    mid = v4
                elif f4 == 2:
                    off = v4
                elif f4 == 3:
                    dur = v4
            evs.append((off, dur, mid))
    return lname, evs


def aggregate(path: str, top: int = 15) -> None:
    space = open(path, "rb").read()
    for fn, plane in _fields(space):
        if fn != 1:
            continue
        name, emeta, lines = _parse_plane(plane)
        agg, cnt, lnames = collections.Counter(), collections.Counter(), []
        for ln in lines:
            lname, evs = _parse_line(ln)
            lnames.append(lname)
            for _, dur, mid in evs:
                key = emeta.get(mid, mid)
                agg[key] += dur
                cnt[key] += 1
        if agg:
            print(f"=== plane: {name} (lines: {lnames})")
            for n, d in agg.most_common(top):
                print(f"  {d / 1e9:9.3f} ms x{cnt[n]:5d}  {str(n)[:100]}")


def device_module_ms(path: str, match: str = "") -> dict:
    """Programmatic module-level device times: {module_name: total_ms} from
    the TPU plane's 'XLA Modules' line (ground truth for step timings — the
    tunnelled runtime's wall clocks carry ~3 ms dispatch overhead). `match`
    filters module names by substring. Used by bench.py's roofline fields."""
    space = open(path, "rb").read()
    out = {}
    for fn, plane in _fields(space):
        if fn != 1:
            continue
        name, emeta, lines = _parse_plane(plane)
        if "TPU" not in name:
            continue
        for ln in lines:
            lname, evs = _parse_line(ln)
            if lname != "XLA Modules":
                continue
            for _, dur, mid in evs:
                key = str(emeta.get(mid, mid))
                if match and match not in key:
                    continue
                out[key] = out.get(key, 0.0) + dur / 1e9
    return out


def timeline(path: str, limit: int = 40) -> None:
    space = open(path, "rb").read()
    for fn, plane in _fields(space):
        if fn != 1:
            continue
        name, emeta, lines = _parse_plane(plane)
        if "TPU" not in name:
            continue
        for ln in lines:
            lname, evs = _parse_line(ln)
            evs.sort()
            print(f"--- plane {name!r} line {lname!r} n={len(evs)}")
            for off, dur, mid in evs[:limit]:
                print(f"  t={off / 1e9:9.3f} ms dur={dur / 1e9:8.3f} ms  "
                      f"{str(emeta.get(mid, mid))[:80]}")


if __name__ == "__main__":
    if len(sys.argv) < 3 or sys.argv[1] not in ("agg", "tl"):
        sys.exit(__doc__)
    (aggregate if sys.argv[1] == "agg" else timeline)(sys.argv[2])


def device_bucket_ms(path: str) -> dict:
    """Occupancy buckets from the TPU plane's sync 'XLA Ops' line:
    {'kernel': ms, 'fusion': ms, 'copy': ms, 'other': ms, 'while': ms}.
    'kernel' counts custom-calls (Pallas launches); 'while' is the whole
    loop span (the step total when the trace is one scanned dispatch)."""
    space = open(path, "rb").read()
    out = {"kernel": 0.0, "fusion": 0.0, "copy": 0.0, "other": 0.0,
           "while": 0.0}
    for fn, plane in _fields(space):
        if fn != 1:
            continue
        name, emeta, lines = _parse_plane(plane)
        if "TPU" not in name:
            continue
        for ln in lines:
            lname, evs = _parse_line(ln)
            if lname != "XLA Ops":
                continue
            for _, dur, mid in evs:
                key = str(emeta.get(mid, mid))
                base = key.split("=", 1)[0].strip().lstrip("%")
                if base.startswith("while"):
                    out["while"] += dur / 1e9
                elif "custom-call" in key:
                    out["kernel"] += dur / 1e9
                elif base.startswith("fusion") or "_fusion" in base.split(
                        ".")[0]:
                    out["fusion"] += dur / 1e9
                elif base.startswith(("copy", "slice", "reshape",
                                      "transpose", "bitcast")):
                    out["copy"] += dur / 1e9
                else:
                    out["other"] += dur / 1e9
    return out
