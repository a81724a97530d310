"""Round-5 A/B: VPU chunk scan vs the MXU-ranked chunk scan on the
clustered k=16 serving workload (1M refs, in-distribution queries).

The xplane decomposition (prof_r5_scan.py) put the VPU fused scan at
~8.0 of the drain's ~9.3 ms/batch device time; _chunk_scan_mxu_core
moves the candidate ranking to a triple-bf16 MXU matmul (centered per
chunk so the error band survives clustered densities) with a direct-f32
top-scan_t-subtile rescan. One process, interleaved trials, staged
queries untimed; recall asserted on an f64-oracle subsample per arm.

Run on the real chip: python benchmarks/drive_r5_scan_mxu.py
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
TRIALS = 6
# (label, mxu, budget, scan_t)
ARMS = (
    ("vpu_b128", False, 128, 0),
    ("mxu_b128_t8", True, 128, 8),
    ("mxu_b128_t4", True, 128, 4),
    ("mxu_b128_t16", True, 128, 16),
)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    log(f"backend={jax.default_backend()}")
    _, refs = make_dataset(K, 1, N, SEED, clustered=True)
    rng = np.random.default_rng(SEED + 1)
    base = refs[rng.integers(0, N, size=W * M)]
    allq = (base + rng.normal(0, 0.01, size=base.shape)).astype(np.float32)
    sub = np.random.default_rng(0).choice(M, 512, replace=False)

    t0 = time.perf_counter()
    bi = KDTree.build(refs).device_index()
    st = bi.stage_queries(allq)
    log(f"KD build + staging {time.perf_counter()-t0:.1f}s "
        f"(F={bi.lo.shape[0]} cap={bi.pts.shape[1]} "
        f"extras={bi.extras.shape[0]})")

    state = {}
    for label, mxu, budget, scan_t in ARMS:
        t0 = time.perf_counter()
        idx, ok = bi.query_staged_scan_with_flags(
            st, budget, mxu=mxu, scan_t=scan_t or 8
        )  # compile
        log(f"{label}: compile+first {time.perf_counter()-t0:.1f}s; "
            f"BASE cov {ok.mean():.5f}")
        idx_f, cov = bi.query_staged_with_coverage(
            st, beam=16, budget=budget, mxu=mxu
        )
        r = recall_at_1(idx_f[:M][sub], allq[:M][sub], refs)
        assert r == 1.0, (label, r)
        state[label] = (mxu, budget, scan_t, float(ok.mean()), [])

    for _ in range(TRIALS):
        for label, (mxu, budget, scan_t, _, times) in state.items():
            t0 = time.perf_counter()
            bi.query_staged_with_coverage(st, beam=16, budget=budget, mxu=mxu)
            times.append((time.perf_counter() - t0) / W * 1e3)

    out = {}
    for label, (mxu, budget, scan_t, base_cov, times) in state.items():
        a = np.asarray(times)
        log(f"{label}: full serving best {a.min():.2f} / p50 "
            f"{np.percentile(a, 50):.2f} / max {a.max():.2f} ms/batch "
            f"(base_cov {base_cov:.5f})")
        out[label] = {
            "best_ms": round(float(a.min()), 2),
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "base_cov": round(base_cov, 5),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
