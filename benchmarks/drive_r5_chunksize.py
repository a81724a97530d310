"""Round-5 sweep: chunk size x budget for the VPU chunk-scan drain on the
clustered k=16 serving workload.

The chunk scan's work per batch is ~m * (budget * cap + extras): a
locality-sorted 1024-query chunk needs budget 128 buckets to base-cover,
but a 256-query chunk concentrates in fewer blobs, so its bucket union
should cover at a much smaller budget — scan volume falls ~linearly with
chunk size until extras (scanned once per chunk) and per-chunk
selection/gather overheads eat the gain. One process, one staged queue
per chunk size, interleaved full-serving trials, recall asserted per arm.

Run on the real chip: python benchmarks/drive_r5_chunksize.py
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
# (chunk_m, budgets)
ARMS = (
    (1024, (128,)),        # control: the landed default
    (512, (64, 96)),
    (256, (40, 64)),
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
    log(f"KD build {time.perf_counter()-t0:.1f}s (F={bi.lo.shape[0]} "
        f"cap={bi.pts.shape[1]} extras={bi.extras.shape[0]})")

    arms = []
    for chunk_m, budgets in ARMS:
        st = bi.stage_queries(allq, chunk_m=chunk_m)
        for budget in budgets:
            t0 = time.perf_counter()
            idx, ok = bi.query_staged_scan_with_flags(st, budget)  # compile
            log(f"cm{chunk_m}/b{budget}: compile+first "
                f"{time.perf_counter()-t0:.1f}s; BASE cov {ok.mean():.5f}")
            idx_f, cov = bi.query_staged_with_coverage(st, beam=16,
                                                       budget=budget)
            r = recall_at_1(idx_f[:M][sub], allq[:M][sub], refs)
            assert r == 1.0, (chunk_m, budget, r)
            arms.append((chunk_m, budget, st, float(ok.mean()), []))

    for _ in range(TRIALS):
        for chunk_m, budget, st, _, times in arms:
            t0 = time.perf_counter()
            bi.query_staged_with_coverage(st, beam=16, budget=budget)
            times.append((time.perf_counter() - t0) / W * 1e3)

    out = {}
    for chunk_m, budget, st, base_cov, times in arms:
        a = np.asarray(times)
        vol = budget * bi.pts.shape[1] + bi.extras.shape[0]
        key = f"cm{chunk_m}_b{budget}"
        log(f"{key}: full serving best {a.min():.2f} / p50 "
            f"{np.percentile(a, 50):.2f} / max {a.max():.2f} ms/batch "
            f"(vol/chunk {vol}, base_cov {base_cov:.5f})")
        out[key] = {
            "best_ms": round(float(a.min()), 2),
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "base_cov": round(base_cov, 5),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
