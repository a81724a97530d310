"""Round-5 experiment: chunk-scan frontier granularity on the clustered
k=16 serving workload.

The chunk-scan drain's scanned volume is budget * cap points per chunk
(plus extras). The default KD frontier holds ~512 points per bucket
(F=2048); a finer frontier (cap_target 256 -> F=4096) tracks the blob
geometry more tightly, so the same coverage MIGHT come at a smaller
scanned volume (e.g. budget 192 x cap 256 = 49K points vs the default
128 x 512 = 65.5K). Counter-pressure: the (m, F) bound matrix and the
bucket-score row double, and extras grow (4095 vs 2047 medians).

One process, same staged queue per variant, interleaved trials.
Run on the real chip: python benchmarks/drive_r5_frontier.py
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
from nns_tpu.trees.beam import kd_beam_index
from nns_tpu.trees.kdtree import KDTree

N = int(os.environ.get("NNS_BENCH_N", str(1 << 20)))
M = 10_000
K = 16
W = int(os.environ.get("NNS_BENCH_K16_W", "16"))
SEED = 1000
TRIALS = 5
# (cap_target, budgets to try at that granularity)
VARIANTS = (
    (512, (128,)),            # control: the landed default
    (256, (128, 192, 256)),   # finer frontier, matched + smaller volumes
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

    tree = KDTree.build(refs)
    arms = []
    for cap_target, budgets in VARIANTS:
        t0 = time.perf_counter()
        bi = kd_beam_index(tree, cap_target=cap_target)
        st = bi.stage_queries(allq)
        log(f"cap_target={cap_target}: F={bi.lo.shape[0]} "
            f"cap={bi.pts.shape[1]} extras={bi.extras.shape[0]} "
            f"(index+stage {time.perf_counter()-t0:.1f}s)")
        for budget in budgets:
            t0 = time.perf_counter()
            idx, ok = bi.query_staged_scan_with_flags(st, budget)  # compile
            vol = budget * bi.pts.shape[1] + bi.extras.shape[0]
            log(f"  cap{cap_target}/b{budget}: compile+first "
                f"{time.perf_counter()-t0:.1f}s; BASE cov {ok.mean():.5f} "
                f"(scan volume {vol})")
            arms.append((cap_target, budget, bi, st, vol, float(ok.mean()), []))

    for rd in range(TRIALS):
        for cap_target, budget, bi, st, _, _, times in arms:
            t0 = time.perf_counter()
            idx_f, cov = bi.query_staged_with_coverage(st, beam=16,
                                                       budget=budget)
            times.append((time.perf_counter() - t0) / W * 1e3)
            if rd == 0:
                r = recall_at_1(idx_f[:M][sub], allq[:M][sub], refs)
                assert r == 1.0, (cap_target, budget, r)

    out = {}
    for cap_target, budget, _, _, vol, base_cov, times in arms:
        a = np.asarray(times)
        key = f"cap{cap_target}_b{budget}"
        log(f"{key}: full serving best {a.min():.2f} / p50 "
            f"{np.percentile(a, 50):.2f} / max {a.max():.2f} ms/batch "
            f"(vol {vol}, base_cov {base_cov:.5f})")
        out[key] = {
            "best_ms": round(float(a.min()), 2),
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "vol": vol,
            "base_cov": round(base_cov, 5),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
