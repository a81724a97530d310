"""Round-5 A/B: phase-2 gather width (ts) of the v9 MXU drain, re-measured
now that BOTH refine tiers run in-program (_expansion_drain: tier-1 band
rescan + tier-2 full scan — the round-4 choice ts=256 was measured against
the old host-round-trip refine protocol).

One process, interleaved trials (tunnel throughput swings 2-3x between
minutes — CLAUDE.md), staged queries untimed, best-of-trials per variant.

Usage (real chip): python benchmarks/drive_r5_v9_ts.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_REFS = int(os.environ.get("NNS_BENCH_N", str(1 << 20)))
N_QUERIES = int(os.environ.get("NNS_BENCH_M", str(10_000)))
K = 16
SEED = 1000
W = int(os.environ.get("NNS_BENCH_K16_W", "64"))
ROUNDS = 6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    from nns_tpu.data import make_dataset
    from nns_tpu.kernels.mxu_expansion import MXUExpansion
    from nns_tpu.kernels.oracle import recall_at_1

    log(f"[ts_ab] backend={jax.default_backend()}")
    queries, refs = make_dataset(K, N_QUERIES, N_REFS, SEED)
    rng = np.random.default_rng(SEED + 1)
    allq = np.concatenate(
        [queries] + [rng.random((N_QUERIES, K), dtype=np.float32)
                     for _ in range(W - 1)], axis=0)

    variants = {}
    for ts in (256, 512):
        t0 = time.perf_counter()
        eng = MXUExpansion(refs, tile_s=ts)
        st = eng.stage_queries(allq)
        idx = eng.query_staged(st)  # compile
        log(f"[ts_ab] ts={ts}: staging+compile {time.perf_counter()-t0:.1f}s")
        sub = np.random.default_rng(0).choice(N_QUERIES, 512, replace=False)
        r = recall_at_1(np.asarray(idx)[:N_QUERIES][sub], queries[sub], refs)
        assert r == 1.0, (ts, r)
        variants[ts] = (eng, st, [])

    for rd in range(ROUNDS):
        for ts, (eng, st, times) in variants.items():
            t0 = time.perf_counter()
            eng.query_staged(st)
            times.append((time.perf_counter() - t0) / W * 1e3)

    out = {}
    for ts, (_, _, times) in variants.items():
        a = np.asarray(times)
        log(f"[ts_ab] ts={ts}: best {a.min():.2f} / p50 "
            f"{np.percentile(a, 50):.2f} / max {a.max():.2f} ms/batch "
            f"over {len(a)} interleaved trials")
        out[f"ts{ts}_best_ms"] = round(float(a.min()), 3)
        out[f"ts{ts}_p50_ms"] = round(float(np.percentile(a, 50)), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
