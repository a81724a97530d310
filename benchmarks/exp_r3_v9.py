"""Round-3: v9 (triple-bf16 MXU expansion) tile tuning at k=16, 1M x 10K.
Round-2 best: 41 ms/batch (tile_m=256, tile_n=2048, contraction 96).
Sweeps tile_m/tile_n and a 128-deep contraction (pad the 6*kp=96 axis to
the MXU's full systolic depth). One process, chained trials, one fetch."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    from nns_tpu.data import make_dataset
    from nns_tpu.kernels.mxu_expansion import MXUExpansion
    from nns_tpu.kernels.oracle import recall_at_1

    queries, refs = make_dataset(16, 10_000, 1_000_000, 1000)
    results = {}
    for tm, tn in ((256, 2048), (256, 4096), (512, 2048), (512, 4096),
                   (1024, 4096), (256, 8192)):
        try:
            eng = MXUExpansion(refs, tile_m=tm, tile_n=tn)
            t0 = time.perf_counter()
            idx = eng.query(queries)
            log(f"tm={tm} tn={tn}: first (compile) {time.perf_counter()-t0:.1f}s")
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                idx = eng.query(queries)
                best = min(best, time.perf_counter() - t0)
            rec = recall_at_1(idx[:256], queries[:256], refs)
            results[(tm, tn)] = best
            log(f"tm={tm} tn={tn}: {best*1e3:.1f} ms/batch recall256 {rec}")
        except Exception as e:
            log(f"tm={tm} tn={tn}: FAILED {type(e).__name__}: {str(e)[:200]}")
    log(f"best: {min(results, key=results.get)} {min(results.values())*1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
