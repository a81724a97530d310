"""Round-5 beam sweep on the clustered k=16 serving workload (1M refs,
in-distribution queries): per-beam BASE-pass certificate coverage and
drained serving cost, after the _select_buckets rework (unrolled argmin
replaced the sort-lowered lax.top_k — prof_r5_beam.py measured the sort
at ~48% of drain device time).

Answers two questions in ONE process (tunnel swings 2-3x between
minutes): (1) which beam's base pass covers this workload — the ladder's
promotion should pick a beam that serves in one pass, not base + a
near-total 4x retry; (2) the drained ms/batch at each beam via the full
serving path (query_staged_with_coverage: base + retry + fallback).

Run on the real chip: python benchmarks/drive_r5_beam_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nns_tpu  # noqa: F401  (compile cache)
from nns_tpu.data import make_dataset
from nns_tpu.kernels.oracle import recall_at_1
from nns_tpu.trees.kdtree import KDTree

N = int(os.environ.get("NNS_BENCH_N", str(1 << 20)))
M = 10_000
K = 16
W = int(os.environ.get("NNS_BENCH_K16_W", "16"))
SEED = 1000
TRIALS = 5
BEAMS = tuple(int(b) for b in os.environ.get(
    "NNS_SWEEP_BEAMS", "4,8,16").split(",") if b)
BUDGETS = tuple(int(b) for b in os.environ.get(
    "NNS_SWEEP_BUDGETS", "64,128,256").split(",") if b)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    log(f"backend={jax.default_backend()}")
    _, refs = make_dataset(K, 1, N, SEED, clustered=True)
    rng = np.random.default_rng(SEED + 1)

    def indist(m: int) -> np.ndarray:
        base = refs[rng.integers(0, N, size=m)]
        return (base + rng.normal(0, 0.01, size=base.shape)).astype(np.float32)

    allq = indist(W * M)
    sub = np.random.default_rng(0).choice(M, 512, replace=False)

    t0 = time.perf_counter()
    bi = KDTree.build(refs).device_index()
    st = bi.stage_queries(allq)
    log(f"KD build + staging {time.perf_counter()-t0:.1f}s "
        f"(F={bi.lo.shape[0]} cap={bi.pts.shape[1]} "
        f"extras={bi.extras.shape[0]})")

    out = {}
    for beam in BEAMS:
        t0 = time.perf_counter()
        idx, ok = bi.query_staged_with_flags(st, beam=beam)  # compile
        log(f"beam={beam}: compile+first {time.perf_counter()-t0:.1f}s; "
            f"BASE coverage {ok.mean():.5f}")
        base_best = np.inf
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            bi.query_staged_with_flags(st, beam=beam)
            base_best = min(base_best, time.perf_counter() - t0)
        full_best = np.inf
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            idx_f, cov = bi.query_staged_with_coverage(st, beam=beam)
            full_best = min(full_best, time.perf_counter() - t0)
        r = recall_at_1(idx_f[:M][sub], allq[:M][sub], refs)
        log(f"beam={beam}: base {base_best/W*1e3:.2f} ms/batch; full "
            f"serving {full_best/W*1e3:.2f} ms/batch (cov {cov:.5f}, "
            f"recall {r})")
        out[beam] = {
            "base_cov": round(float(ok.mean()), 5),
            "base_ms": round(base_best / W * 1e3, 2),
            "full_ms": round(full_best / W * 1e3, 2),
            "cov": round(float(cov), 5),
            "recall": float(r),
        }

    # The round-5 chunk-scan drain: ONE shared budget-bucket candidate set
    # per locality-sorted chunk + the exact fused scan (beam._chunk_scan_core)
    # — the per-query bucket gather was the beam drain's bottleneck, so this
    # trades gather traffic for a wider (still pruned) fused scan.
    for budget in BUDGETS:
        t0 = time.perf_counter()
        idx, ok = bi.query_staged_scan_with_flags(st, budget)  # compile
        log(f"scan b={budget}: compile+first {time.perf_counter()-t0:.1f}s; "
            f"BASE coverage {ok.mean():.5f}")
        base_best = np.inf
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            bi.query_staged_scan_with_flags(st, budget)
            base_best = min(base_best, time.perf_counter() - t0)
        full_best = np.inf
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            idx_f, cov = bi.query_staged_with_coverage(st, beam=16,
                                                       budget=budget)
            full_best = min(full_best, time.perf_counter() - t0)
        r = recall_at_1(idx_f[:M][sub], allq[:M][sub], refs)
        log(f"scan b={budget}: base {base_best/W*1e3:.2f} ms/batch; full "
            f"serving {full_best/W*1e3:.2f} ms/batch (cov {cov:.5f}, "
            f"recall {r})")
        out[f"scan{budget}"] = {
            "base_cov": round(float(ok.mean()), 5),
            "base_ms": round(base_best / W * 1e3, 2),
            "full_ms": round(full_best / W * 1e3, 2),
            "cov": round(float(cov), 5),
            "recall": float(r),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
