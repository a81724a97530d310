"""Headline benchmark: exact 1-NN, 1M 3-D reference points x 10K queries,
single chip, flagship fused Pallas kernel (prepare-once/query-many).

Prints ONE JSON line:
  {"metric": ..., "value": qps, "unit": "queries/sec", "vs_baseline": ...}

vs_baseline normalizes against the BASELINE.md north-star target of
2,000,000 qps (= 5x an estimated ~400K qps for the reference's V9 on its
4-GPU sm_70 setup at this workload; the reference publishes no numbers —
BASELINE.md "published: none" — so the driver-set 5x goal IS the baseline).
vs_baseline >= 1.0 means the north star is met.

Protocol (mirrors the reference's, SURVEY.md §6): seeded data (seed 1000),
warm-up runs excluded from timing (core.cu:1900-1933 analog), best-of-5
timed query batches with jax.block_until_ready, build/stage time reported
separately (stderr), recall@1 verified against the f64 oracle on a
256-query subsample (must be 1.0 or the benchmark reports failure).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_REFS = 1_000_000
N_QUERIES = 10_000
K = 3
SEED = 1000
BASELINE_QPS = 2_000_000.0  # north-star target (see module docstring)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    from nns_tpu.data import make_dataset
    from nns_tpu.kernels.oracle import recall_at_1
    from nns_tpu.kernels.pallas_fused import FusedBruteForce

    log(f"[bench] backend={jax.default_backend()} devices={jax.devices()}")
    queries, refs = make_dataset(K, N_QUERIES, N_REFS, SEED)

    t0 = time.perf_counter()
    engine = FusedBruteForce(refs)
    build_s = time.perf_counter() - t0
    log(f"[bench] reference staging (pad + dim-major + device_put): {build_s*1e3:.1f} ms")

    # Timing note: under remote-tunneled TPU runtimes, block_until_ready can
    # return before device execution completes; only a host fetch
    # (np.asarray) reliably synchronizes. So: time W chained query batches
    # (distinct inputs, defeating any caching) ending in one fetch, and
    # divide — per-batch device time, amortizing dispatch overhead the way a
    # serving loop would.
    W = 8
    q_batches = [
        jax.device_put(np.asarray(queries, dtype=np.float32) + np.float32(i) * np.float32(1e-7))
        for i in range(W)
    ]
    q_batches[0] = jax.device_put(np.asarray(queries, dtype=np.float32))
    _ = np.asarray(engine.query(q_batches[0]))  # warm-up: compile + settle

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [engine.query(qb) for qb in q_batches]
        for o in outs:
            _ = np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / W)
    idx = outs[0]
    qps = N_QUERIES / best
    log(f"[bench] query: {best*1e3:.2f} ms/batch for {N_QUERIES} queries x {N_REFS} refs -> {qps:,.0f} qps")

    idx_np = np.asarray(idx)
    sub = np.random.default_rng(0).choice(N_QUERIES, size=256, replace=False)
    recall = recall_at_1(idx_np[sub], queries[sub], refs)
    log(f"[bench] recall@1 (256-query f64 oracle subsample): {recall}")

    value = qps if recall == 1.0 else 0.0
    print(
        json.dumps(
            {
                "metric": "exact_1nn_qps_1M_refs_10k_queries_k3_1chip",
                "value": round(value, 1),
                "unit": "queries/sec",
                "vs_baseline": round(value / BASELINE_QPS, 4),
            }
        )
    )
    return 0 if recall == 1.0 else 1


if __name__ == "__main__":
    sys.exit(main())
