"""Device-op profiling: trace a region and summarize WHERE device time goes.

The reference's only observability is a wall-clock bracket per cudaCall
(main.cu:73-76). Wall clock is misleading on this runtime twice over:
dispatch is async, and tunneled fetches cost ~35 ms regardless of size —
subtracting wall clocks mis-attributes device work (it under-measured the
flagship scan kernel 2.7x in round 3). ``jax.profiler`` works through the
tunnel and writes an xplane protobuf with per-XLA-op device times; this
module parses it so a perf investigation starts from ground truth:

    from nns_tpu.utils.profiling import profile_device_ops
    report = profile_device_ops(lambda: np.asarray(engine.query_queue_staged(dq)[-1]))
    print(report)          # per-op device totals, sorted
    report.total_ms        # device-busy total
    report.ops["fusion"]   # (count, ms) per op kind

The parser reads the xplane proto with a minimal field-number decoder (no
tensorflow dependency): XSpace.planes(1) -> XPlane{name=2, lines=3,
event_metadata=4} -> XLine{name=2, events=4} -> XEvent{metadata_id=1,
duration_ps=3}; XEventMetadata{id=1, name=2}.
"""

from __future__ import annotations

import glob
import os
import re
import tempfile
from dataclasses import dataclass, field


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:  # pragma: no cover - unused wire types in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


@dataclass
class DeviceOpReport:
    """Per-op-kind device time of one traced region.

    ``ops``/``total_ms`` SUM over every device plane in the trace (one per
    chip on a multi-chip run — divide by len(devices) for a per-chip
    average); ``devices`` lists the planes that contributed."""

    devices: list[str] = field(default_factory=list)
    ops: dict[str, tuple[int, float]] = field(default_factory=dict)

    @property
    def device(self) -> str:
        return ", ".join(self.devices)

    @property
    def total_ms(self) -> float:
        return float(sum(t for _, t in self.ops.values()))

    def __str__(self) -> str:
        lines = [
            f"{len(self.devices)} device plane(s) [{self.device}]: "
            f"{self.total_ms:.3f} ms busy (summed)"
        ]
        for k, (n, t) in sorted(self.ops.items(), key=lambda kv: -kv[1][1]):
            lines.append(f"  {t:9.3f} ms x{n:5d}  {k}")
        return "\n".join(lines)


def parse_xplane(path: str, line_name: str = "XLA Ops") -> DeviceOpReport:
    """Aggregate per-op device durations from one vm.xplane.pb file."""
    buf = open(path, "rb").read()
    rep = DeviceOpReport()
    for fnum, _, plane in _fields(buf):
        if fnum != 1:  # XSpace.planes
            continue
        name = b""
        lines = []
        metas: dict[int, str] = {}
        for pf, _, pv in _fields(plane):
            if pf == 2:
                name = pv
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid, mname = 0, b""
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        mid = mv
                    elif mf == 2:  # XEventMetadata
                        for ef, _, ev in _fields(mv):
                            if ef == 1:
                                mid = ev
                            elif ef == 2:
                                mname = ev
                metas[mid] = mname.decode(errors="replace")
        if not name.startswith(b"/device:"):
            continue
        for line in lines:
            lname = b""
            events = []
            for lf, _, lv in _fields(line):
                if lf == 2:
                    lname = lv
                elif lf == 4:
                    events.append(lv)
            if lname.decode(errors="replace") != line_name:
                continue
            dev = name.decode(errors="replace")
            if dev not in rep.devices:
                rep.devices.append(dev)
            for ev in events:
                mid = 0
                dur = 0
                for ef, _, evv in _fields(ev):
                    if ef == 1:
                        mid = evv
                    elif ef == 3:
                        dur = evv
                opname = metas.get(mid, f"op{mid}")
                kind = re.sub(r"%|\.\d+| =.*", "", opname).strip() or opname
                n, t = rep.ops.get(kind, (0, 0.0))
                rep.ops[kind] = (n + 1, t + dur / 1e9)
    return rep


def profile_device_ops(fn, trace_dir: str | None = None,
                       line_name: str = "XLA Ops") -> DeviceOpReport:
    """Run ``fn()`` under jax.profiler.trace and return per-op device times.

    ``fn`` must force completion itself (end in a host fetch — on tunneled
    runtimes ``block_until_ready`` does not block, CLAUDE.md invariant).
    With ``trace_dir`` the raw trace is kept for TensorBoard/xprof;
    otherwise a temp dir is used and cleaned up.
    """
    import jax

    own = trace_dir is None
    d = tempfile.mkdtemp(prefix="nns_tpu_prof_") if own else trace_dir
    try:
        with jax.profiler.trace(d):
            fn()
        pbs = sorted(glob.glob(os.path.join(d, "plugins/profile/*/*.xplane.pb")))
        if not pbs:  # pragma: no cover - backend without xplane support
            return DeviceOpReport(devices=["(no xplane produced)"])
        return parse_xplane(pbs[-1], line_name=line_name)
    finally:
        if own:
            import shutil

            shutil.rmtree(d, ignore_errors=True)
