"""Round-4 k=16: two-phase expansion — min-only phase-1 kernel + a tiny
winning-tile rescan — vs the round-3 single-pass kernel.

Round-3 decomposition (exp_r3_k16.py) showed the full kernel at 61.1 ms
with a min-only floor of 46.9 ms at (256, 2048) — but that floor itself
is ~3.6x the 13 ms MXU speed-of-light. Hypothesis: per-grid-step fixed
cost (20,480 tiles at (1024, 512)) dominates, and the full epilogue's
VMEM temporaries (cols iota, masked selects — 5+ f32/i32 tiles of
tm x tn) are what forbade bigger tiles. A min-only kernel carries just
(min1, winning tile id, cross-tile min2) — three (tm, 1) vectors — so
the e tile is the only big temporary and (1024-2048) x (1024-4096)
tiles become feasible, cutting grid steps up to 16x.

Phase 2 re-derives the in-tile argmin and in-tile min2 in full f32 by
gathering ONLY each query's winning tile of raw reference points
(m x tn x k f32 — 3x cheaper than gathering the 6-way bf16 splits) and
scanning it with (q - r)^2 on the VPU. Certificate stays sound:
min(in-tile min2 - d2, cross-tile m2x - d1) > min1 + d2 is implied by
min2_combined > min1 + 2*delta with delta = the phase-1 band (phase-2
error <= phase-1 error).

Run on the real chip: python benchmarks/exp_r4_k16.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import nns_tpu  # noqa: F401  (compile cache)
from nns_tpu.kernels import layouts
from nns_tpu.kernels.mxu_expansion import (
    MXUExpansion,
    _cat_q,
    _phase1_kernel,
    _split_bf16x3,
)

M, N, K = 10240, 1 << 20, 16


@functools.partial(jax.jit, static_argnames=("tm", "tn", "ts"))
def _phase1s(qc, rc, r2h, tm, tn, ts):
    """The PRODUCTION phase-1 kernel (subtile ids; ts == tn -> plain
    per-tile ids) at arbitrary tile shapes, for the sweep."""
    m_pad = layouts.round_up(qc.shape[0], 8)
    if m_pad != qc.shape[0]:
        qc = jnp.pad(qc, ((0, m_pad - qc.shape[0]), (0, 0)))
    kc = qc.shape[1]
    grid = (pl.cdiv(m_pad, tm), pl.cdiv(rc.shape[1], tn))
    o_spec = pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_phase1_kernel, ts=ts, ns=tn // ts,
                          ks=(rc.shape[0] // 3)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rc.shape[0], tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(o_spec,) * 6,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ),
        interpret=False,
    )(qc, rc, r2h)[:3]


def _phase1(qc, rc, r2h, tm, tn):
    """Plain per-tile ids (ns == 1)."""
    return _phase1s(qc, rc, r2h, tm, tn, tn)


@functools.partial(jax.jit, static_argnames=("tn",))
def _phase2(q, refs_t, r2h_t, tid, min1, m2x, delta, tn):
    """Full-f32 rescan of each query's winning tile.

    refs_t: (n_tiles, tn, kp) f32 raw (zero-padded) reference tiles;
    r2h_t: (n_tiles, tn) f32 half-norms (+inf on padding).
    Returns (idx, cert, min1_refined).
    """
    m = q.shape[0]
    rsel = jnp.take(refs_t, tid, axis=0)          # (m, tn, kp) block gather
    r2sel = jnp.take(r2h_t, tid, axis=0)          # (m, tn)
    # f32 on the VPU (explicit mul+sum — jnp.dot would bf16-truncate on TPU)
    cross = jnp.sum(rsel * q[:, None, :], axis=2)  # (m, tn)
    ew = r2sel - cross
    wmin1 = jnp.min(ew, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, ew.shape, 1)
    warg = jnp.min(jnp.where(ew == wmin1[:, None], cols, tn), axis=1)
    wmin2 = jnp.min(jnp.where(cols == warg[:, None], jnp.inf, ew), axis=1)
    idx = tid * tn + warg
    min2 = jnp.minimum(wmin2, m2x)
    cert = min2 > wmin1 + 2.0 * delta
    return idx, cert, wmin1


def main():
    rng = np.random.default_rng(1000)
    refs = rng.random((N, K), dtype=np.float32)
    queries = rng.random((M, K), dtype=np.float32)
    q = jnp.asarray(queries)
    qc = jax.device_put(_cat_q(*_split_bf16x3(q)))
    eng = MXUExpansion(refs)  # rc/r2h staging + production reference point
    print(f"qc {qc.shape} {qc.dtype}; rc {eng.rc.shape} {eng.rc.dtype}",
          flush=True)

    # --- phase-1 sweep ---------------------------------------------------
    results = {}
    for tm, tn in ((1024, 512), (1024, 1024), (1024, 2048), (2048, 512),
                   (2048, 1024), (2048, 2048), (2048, 4096), (1024, 4096)):
        try:
            t0 = time.perf_counter()
            out = _phase1(qc, eng.rc, eng.r2h, tm, tn)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][:8])
            c = time.perf_counter() - t0
            best = np.inf
            for _ in range(8):
                t0 = time.perf_counter()
                out = _phase1(qc, eng.rc, eng.r2h, tm, tn)
                _ = np.asarray(out[0][:8])  # sync fetch
                best = min(best, time.perf_counter() - t0)
            steps = (layouts.round_up(M, tm) // tm) * (eng.rc.shape[1] // tn)
            print(f"phase1 tm={tm} tn={tn}: best {best*1e3:.1f} ms "
                  f"({steps} grid steps, compile {c:.1f}s)", flush=True)
            results[(tm, tn)] = best
        except Exception as ex:
            print(f"phase1 tm={tm} tn={tn}: FAILED {str(ex)[:140]}", flush=True)

    # --- subtile-id variant: big phase-1 tiles, ts=512 phase-2 gather ----
    sub_results = {}
    for tm, tn in ((1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096)):
        try:
            t0 = time.perf_counter()
            out = _phase1s(qc, eng.rc, eng.r2h, tm, tn, 512)
            _ = np.asarray(out[0][:8])
            c = time.perf_counter() - t0
            best = np.inf
            for _ in range(8):
                t0 = time.perf_counter()
                out = _phase1s(qc, eng.rc, eng.r2h, tm, tn, 512)
                _ = np.asarray(out[0][:8])
                best = min(best, time.perf_counter() - t0)
            print(f"phase1s tm={tm} tn={tn} ts=512: best {best*1e3:.1f} ms "
                  f"(compile {c:.1f}s)", flush=True)
            sub_results[(tm, tn)] = best
        except Exception as ex:
            print(f"phase1s tm={tm} tn={tn}: FAILED {str(ex)[:140]}", flush=True)

    if not results:
        print("all phase-1 variants failed")
        return
    (btm, btn), bp1 = min(results.items(), key=lambda kv: kv[1])
    print(f"--> best phase1: ({btm}, {btn}) at {bp1*1e3:.1f} ms", flush=True)
    if sub_results:
        (stm, stn), sp1 = min(sub_results.items(), key=lambda kv: kv[1])
        print(f"--> best phase1s: ({stm}, {stn}) at {sp1*1e3:.1f} ms",
              flush=True)

    # --- phase-2 cost at the best tn (and one narrower) ------------------
    kp = eng.kp
    for tn in sorted({btn, 512, 1024}):
        n_pad = layouts.round_up(N, tn)
        n_tiles = n_pad // tn
        r_np = np.zeros((n_pad, kp), dtype=np.float32)
        r_np[:N, :K] = refs
        refs_t = jax.device_put(r_np.reshape(n_tiles, tn, kp))
        r2h_np = np.full((n_pad,), np.inf, dtype=np.float32)
        r2h_np[:N] = 0.5 * (refs.astype(np.float64) ** 2).sum(axis=1)
        r2h_t = jax.device_put(r2h_np.reshape(n_tiles, tn))
        tid = jax.device_put(
            jnp.asarray(rng.integers(0, n_tiles, size=M), dtype=jnp.int32))
        min1 = jnp.zeros((M,), jnp.float32)
        m2x = jnp.full((M,), jnp.inf, jnp.float32)
        t0 = time.perf_counter()
        out = _phase2(q, refs_t, r2h_t, tid, min1, m2x, jnp.float32(1e-6), tn)
        _ = np.asarray(out[0][:8])
        c = time.perf_counter() - t0
        best = np.inf
        for _ in range(8):
            t0 = time.perf_counter()
            out = _phase2(q, refs_t, r2h_t, tid, min1, m2x,
                          jnp.float32(1e-6), tn)
            _ = np.asarray(out[0][:8])
            best = min(best, time.perf_counter() - t0)
        gb = M * tn * kp * 4 / 1e9
        print(f"phase2 tn={tn}: best {best*1e3:.1f} ms "
              f"(gather {gb:.2f} GB, compile {c:.1f}s)", flush=True)

    # --- end-to-end two-phase at the best combo, correctness-checked -----
    n_pad = layouts.round_up(N, btn)
    n_tiles = n_pad // btn
    r_np = np.zeros((n_pad, kp), dtype=np.float32)
    r_np[:N, :K] = refs
    refs_t = jax.device_put(r_np.reshape(n_tiles, btn, kp))
    r2h_np = np.full((n_pad,), np.inf, dtype=np.float32)
    r2h_np[:N] = 0.5 * (refs.astype(np.float64) ** 2).sum(axis=1)
    r2h_t = jax.device_put(r2h_np.reshape(n_tiles, btn))
    delta = jnp.float32(2.0 ** -21 * K * 4.0)

    def two_phase():
        min1, tid, m2x = _phase1(qc, eng.rc, eng.r2h, btm, btn)
        idx, cert, _ = _phase2(q, refs_t, r2h_t, tid[:M, 0], min1[:M, 0],
                               m2x[:M, 0], delta, btn)
        return np.asarray(idx), np.asarray(cert)

    idx, cert = two_phase()  # compile
    best = np.inf
    for _ in range(8):
        t0 = time.perf_counter()
        idx, cert = two_phase()
        best = min(best, time.perf_counter() - t0)
    print(f"two-phase ({btm}, {btn}): best {best*1e3:.1f} ms, "
          f"cert_frac {cert.mean():.4f}", flush=True)

    # --- end-to-end with the subtile kernel (phase 2 fixed at ts=512) ----
    if sub_results:
        ts = 512
        n_pad_s = layouts.round_up(N, ts)
        r_np_s = np.zeros((n_pad_s, kp), dtype=np.float32)
        r_np_s[:N, :K] = refs
        refs_ts = jax.device_put(r_np_s.reshape(-1, ts, kp))
        r2h_np_s = np.full((n_pad_s,), np.inf, dtype=np.float32)
        r2h_np_s[:N] = 0.5 * (refs.astype(np.float64) ** 2).sum(axis=1)
        r2h_ts = jax.device_put(r2h_np_s.reshape(-1, ts))

        def two_phase_sub():
            min1, tid, m2x = _phase1s(qc, eng.rc, eng.r2h, stm, stn, ts)
            i2, c2, _ = _phase2(q, refs_ts, r2h_ts, tid[:M, 0], min1[:M, 0],
                                m2x[:M, 0], delta, ts)
            return np.asarray(i2), np.asarray(c2)

        idx_s, cert_s = two_phase_sub()
        best = np.inf
        for _ in range(8):
            t0 = time.perf_counter()
            idx_s, cert_s = two_phase_sub()
            best = min(best, time.perf_counter() - t0)
        print(f"two-phase-sub ({stm}, {stn}, ts=512): best {best*1e3:.1f} ms, "
              f"cert_frac {cert_s.mean():.4f}", flush=True)
        both_s = cert_s & cert
        if both_s.any():
            agree_s = (idx_s[both_s] == idx[both_s]).mean()
            print(f"sub/plain agreement on co-certified rows: {agree_s:.6f}",
                  flush=True)

    # correctness vs the production engine on certified rows
    _, pidx, pcert = eng.query_min_idx_cert(queries)
    both = cert & pcert
    agree = (idx[both] == pidx[both]).mean() if both.any() else 1.0
    print(f"agreement with production on co-certified rows: {agree:.6f} "
          f"({both.sum()} rows)", flush=True)

    # production reference, same process
    best = np.inf
    for _ in range(8):
        t0 = time.perf_counter()
        _, pidx, pcert = eng.query_min_idx_cert(queries)
        best = min(best, time.perf_counter() - t0)
    print(f"prod ({eng.tile_m}x{eng.tile_n}): best {best*1e3:.1f} ms "
          f"cert_frac {pcert.mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
