"""Device-op profiler: xplane parsing + trace integration."""

import numpy as np

from nns_tpu.utils.profiling import DeviceOpReport, parse_xplane, profile_device_ops


def _tag(fnum: int, wt: int) -> bytes:
    return _vint((fnum << 3) | wt)


def _vint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _msg(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _vint(len(payload)) + payload


def test_parse_xplane_synthetic(tmp_path):
    # Hand-encode an XSpace: one /device: plane, one "XLA Ops" line with two
    # events of the same op kind (different .N suffixes) and one other op.
    def event_meta(mid, name):
        inner = _tag(1, 0) + _vint(mid) + _msg(2, name.encode())
        return _msg(4, _tag(1, 0) + _vint(mid) + _msg(2, inner))

    def xevent(mid, dur_ps):
        # XLine.events is field 4; XEvent{metadata_id=1, duration_ps=3}
        return _msg(4, _tag(1, 0) + _vint(mid) + _tag(3, 0) + _vint(dur_ps))

    line = _msg(2, b"XLA Ops") + xevent(1, 2_000_000_000) + \
        xevent(2, 1_000_000_000) + xevent(3, 500_000_000)
    plane = (
        _msg(2, b"/device:TPU:0")
        + event_meta(1, "%fusion.1 = f32[8]{0} fusion(...)")
        + event_meta(2, "%fusion.7 = f32[8]{0} fusion(...)")
        + event_meta(3, "%copy.2 = f32[8]{0} copy(...)")
        + _msg(3, line)
    )
    space = _msg(1, plane)
    p = tmp_path / "vm.xplane.pb"
    p.write_bytes(space)

    rep = parse_xplane(str(p))
    assert rep.devices == ["/device:TPU:0"]
    assert rep.ops["fusion"] == (2, 3.0)
    assert rep.ops["copy"] == (1, 0.5)
    assert abs(rep.total_ms - 3.5) < 1e-9
    assert "fusion" in str(rep)


def test_profile_device_ops_runs():
    # Integration: trace a tiny jitted computation; the report must come
    # back well-formed whatever the backend names its device plane.
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x * 2.0 + 1.0))

    def run():
        np.asarray(f(jnp.arange(1024.0)))

    run()  # compile outside the trace
    rep = profile_device_ops(run)
    assert isinstance(rep, DeviceOpReport)
    assert isinstance(rep.total_ms, float)
    # The CPU backend emits no "/device:" plane (the per-op "XLA Ops" line
    # is a TPU feature); an empty-but-well-formed report is the contract.
    assert isinstance(rep.ops, dict)
