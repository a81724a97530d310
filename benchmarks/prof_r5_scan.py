"""Round-5 ground truth: xplane device-op decomposition of the promoted
chunk-scan drain (the clustered k=16 serving headline, 13.0 ms/batch).

The frontier-granularity experiment (drive_r5_frontier.py) showed the
drain is NOT purely scan-bound: a 21% scanned-volume cut at doubled F
served ~6% SLOWER. This script separates the candidates on the xplane:
the (m, F) box-bound accumulation, the chunk-level top_k row, the
(budget, cap, k) shared gather, the fused Pallas scan of the candidate
set, and the certificate epilogue — so the next optimization targets the
real majority term.

Run on the real chip: python benchmarks/prof_r5_scan.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nns_tpu  # noqa: F401  (compile cache)
from nns_tpu.data import make_dataset
from nns_tpu.trees.kdtree import KDTree
from nns_tpu.utils.profiling import profile_device_ops

N = int(os.environ.get("NNS_BENCH_N", str(1 << 20)))
M = 10_000
K = 16
W = int(os.environ.get("NNS_BENCH_K16_W", "8"))
SEED = 1000
BUDGET = int(os.environ.get("NNS_SCAN_BUDGET", "128"))


def main() -> None:
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    _, refs = make_dataset(K, 1, N, SEED, clustered=True)
    rng = np.random.default_rng(SEED + 1)
    base = refs[rng.integers(0, N, size=W * M)]
    allq = (base + rng.normal(0, 0.01, size=base.shape)).astype(np.float32)

    t0 = time.perf_counter()
    bi = KDTree.build(refs).device_index()
    print(f"KD build + frontier staging: {time.perf_counter()-t0:.1f}s "
          f"(F={bi.lo.shape[0]} cap={bi.pts.shape[1]} "
          f"extras={bi.extras.shape[0]})", flush=True)

    st = bi.stage_queries(allq)
    idx, ok = bi.query_staged_scan_with_flags(st, BUDGET)  # compile
    print(f"warm: BASE coverage {ok.mean():.5f} (budget {BUDGET})",
          flush=True)

    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        bi.query_staged_scan_with_flags(st, BUDGET)
        best = min(best, time.perf_counter() - t0)
    print(f"wall: drain {best*1e3:.1f} ms ({best/W*1e3:.2f} ms/batch)",
          flush=True)

    rep = profile_device_ops(
        lambda: np.asarray(bi.query_staged_scan_with_flags(st, BUDGET)[0])
    )
    print(rep, flush=True)
    print(f"device total: {rep.total_ms:.1f} ms "
          f"({rep.total_ms/W:.2f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
