"""Round-3/4 k=16 decomposition: where do v9's 41 ms/10K-query go?

The triple-bf16 wide contraction at kc=96 has an MXU speed-of-light of
~13 ms for (m=10240) x (n=1M): 2*m*n*96 bf16 FLOPs / (197e12 * 96/128).
The kernel's epilogue runs ~7 elementwise/reduction passes over each
(tm, tn) f32 tile on the VPU (min1, e==min1 compare, col select, i32 min,
col==targ compare, inf select, min2) — ~7e10 VPU ops ≈ 18 ms at peak.
This experiment measures kernel variants same-process to locate the time:

  matmul  — dot_general + a single jnp.min (floor: MXU + 1 VPU pass)
  noargs  — + min2 via value-masking (2 extra passes, no argmin)
  full    — the production kernel (min1, argmin, duplicate-aware min2)

Run on the real chip: python benchmarks/exp_r3_k16.py
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
    _split_bf16x3,
)

# Historical copy of the round-3 single-pass production kernel (replaced in
# round 4 by the two-phase design; kept here so this experiment still runs).
def _expansion_kernel(qc_ref, rc_ref, r2h_ref, min1_ref, idx_ref, min2_ref,
                      *, tile_n: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min1_ref[:] = jnp.full(min1_ref.shape, jnp.inf, dtype=jnp.float32)
        idx_ref[:] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)
        min2_ref[:] = jnp.full(min2_ref.shape, jnp.inf, dtype=jnp.float32)

    cross = jax.lax.dot_general(
        qc_ref[:], rc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e = r2h_ref[:] - cross
    tmin1 = jnp.min(e, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    targ = jnp.min(jnp.where(e == tmin1, cols, tile_n), axis=1, keepdims=True)
    tmin2 = jnp.min(jnp.where(cols == targ, jnp.inf, e), axis=1, keepdims=True)
    tgidx = j * tile_n + targ
    c1, ci, c2 = min1_ref[:], idx_ref[:], min2_ref[:]
    better = tmin1 < c1
    min1_ref[:] = jnp.where(better, tmin1, c1)
    idx_ref[:] = jnp.where(better, tgidx, ci)
    min2_ref[:] = jnp.minimum(
        jnp.minimum(c2, tmin2), jnp.where(better, c1, tmin1)
    )

M, N, K = 10240, 1 << 20, 16
TM, TN = 256, 2048


def _variant_kernel(qc_ref, rc_ref, r2h_ref, min1_ref, idx_ref, min2_ref,
                    *, tile_n: int, mode: str):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min1_ref[:] = jnp.full(min1_ref.shape, jnp.inf, dtype=jnp.float32)
        idx_ref[:] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)
        min2_ref[:] = jnp.full(min2_ref.shape, jnp.inf, dtype=jnp.float32)

    cross = jax.lax.dot_general(
        qc_ref[:], rc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e = r2h_ref[:] - cross
    tmin1 = jnp.min(e, axis=1, keepdims=True)
    if mode == "matmul":
        min1_ref[:] = jnp.minimum(min1_ref[:], tmin1)
        return
    # min2 via strict value masking (WRONG for duplicates; measurement only)
    tmin2 = jnp.min(jnp.where(e > tmin1, e, jnp.inf), axis=1, keepdims=True)
    c1, c2 = min1_ref[:], min2_ref[:]
    better = tmin1 < c1
    min1_ref[:] = jnp.where(better, tmin1, c1)
    min2_ref[:] = jnp.minimum(jnp.minimum(c2, tmin2),
                              jnp.where(better, c1, tmin1))


@functools.partial(jax.jit, static_argnames=("mode", "tm", "tn"))
def _run(qc, rc, r2h, mode, tm=TM, tn=TN):
    m_pad = layouts.round_up(qc.shape[0], 8)
    if m_pad != qc.shape[0]:
        qc = jnp.pad(qc, ((0, m_pad - qc.shape[0]), (0, 0)))
    kc = qc.shape[1]
    grid = (pl.cdiv(m_pad, tm), pl.cdiv(rc.shape[1], tn))
    o_spec = pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    body = (functools.partial(_expansion_kernel, tile_n=tn) if mode == "full"
            else functools.partial(_variant_kernel, tile_n=tn, mode=mode))
    min1, idx, min2 = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(o_spec, o_spec, o_spec),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ),
        interpret=False,
    )(qc, rc, r2h)
    # one scalar fetch per timed call
    return jnp.sum(min1) + jnp.sum(min2) + jnp.sum(idx.astype(jnp.float32))


def _legacy_rc(eng):
    """Round 4 deduplicated MXUExpansion.rc to the [rh; rm; rl] split
    stack; this historical experiment's kernel expects the round-3
    duplicated 6-term layout, so rebuild it from the stack."""
    kp = eng.kp
    rh, rm, rl = eng.rc[:kp], eng.rc[kp:2 * kp], eng.rc[2 * kp:]
    return jnp.concatenate([rh, rm, rh, rl, rh, rm], axis=0)


def main():
    rng = np.random.default_rng(1000)
    refs = rng.random((N, K), dtype=np.float32)
    queries = rng.random((M, K), dtype=np.float32)
    eng = MXUExpansion(refs, tile_m=TM, tile_n=TN)  # legacy tiles for the variant rows
    rc6 = _legacy_rc(eng)
    q = jnp.asarray(queries)
    qc = jax.device_put(_cat_q(*_split_bf16x3(q)))
    print(f"qc {qc.shape} {qc.dtype}; rc6 {rc6.shape} {rc6.dtype}")

    for mode in ("matmul", "noargs", "full"):
        t0 = time.perf_counter()
        float(_run(qc, rc6, eng.r2h, mode))
        print(f"{mode}: compile+1 {time.perf_counter() - t0:.1f}s")
        best = np.inf
        for _ in range(8):
            t0 = time.perf_counter()
            float(_run(qc, rc6, eng.r2h, mode))
            best = min(best, time.perf_counter() - t0)
        print(f"{mode}: best {best * 1e3:.1f} ms")

    # (tm, tn) sweep on the full kernel: rc HBM passes = ceil(m/tm), so taller
    # query tiles cut reference streaming 4-8x if VMEM tolerates the e tile.
    for tm, tn in ((256, 2048), (512, 1024), (1024, 512), (2048, 256),
                   (512, 2048), (1024, 1024), (512, 512)):
        try:
            t0 = time.perf_counter()
            float(_run(qc, rc6, eng.r2h, "full", tm, tn))
            c = time.perf_counter() - t0
            best = np.inf
            for _ in range(8):
                t0 = time.perf_counter()
                float(_run(qc, rc6, eng.r2h, "full", tm, tn))
                best = min(best, time.perf_counter() - t0)
            print(f"full tm={tm} tn={tn}: best {best * 1e3:.1f} ms (compile {c:.1f}s)")
        except Exception as ex:
            print(f"full tm={tm} tn={tn}: FAILED {str(ex)[:120]}")

    # production reference point, same process — CURRENT defaults
    peng = MXUExpansion(refs)
    t0 = time.perf_counter()
    peng.query_min_idx_cert(queries)
    print(f"prod(defaults {peng.tile_m}x{peng.tile_n}): compile+1 "
          f"{time.perf_counter() - t0:.1f}s")
    best = np.inf
    for _ in range(8):
        t0 = time.perf_counter()
        _, idx, cert = peng.query_min_idx_cert(queries)
        best = min(best, time.perf_counter() - t0)
    print(f"prod: best {best * 1e3:.1f} ms  cert_frac {cert.mean():.4f}")


if __name__ == "__main__":
    main()
