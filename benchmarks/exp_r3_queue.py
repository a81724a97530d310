"""Round-3 experiment: queue-dispatch geometry for the headline bench.

Compares, on the real chip, draining W=32 staged 10K-query batches as
4x QW=8 / 2x QW=16 / 1x QW=32 dispatches, and full-result vs last-slice
fetches. Many trials to expose the tunnel's 2-3x swing. Results feed the
hardened bench.py (VERDICT round 3 item 1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_REFS = 1_000_000
N_QUERIES = 10_000
K = 3
SEED = 1000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from nns_tpu.data import make_dataset
    from nns_tpu.kernels.cell_list import CellListEngine

    log(f"backend={jax.default_backend()}")
    queries, refs = make_dataset(K, N_QUERIES, N_REFS, SEED)
    t0 = time.perf_counter()
    engine = CellListEngine(refs)
    log(f"build {time.perf_counter()-t0:.2f}s D={engine.D} R_max={engine.R_max}")

    W = 32
    rng = np.random.default_rng(SEED + 1)
    lo, hi = refs.min(axis=0), refs.max(axis=0)
    batches = [queries] + [
        (rng.random((N_QUERIES, K), dtype=np.float32) * (hi - lo) + lo).astype(np.float32)
        for _ in range(W - 1)
    ]
    t0 = time.perf_counter()
    dstack, fstack, orders = engine.stage_queue(batches)
    log(f"stage_queue {time.perf_counter()-t0:.2f}s dstack={dstack.shape}")

    for qw in (8, 16, 32):
        queues = [
            (jax.device_put(dstack[i : i + qw]), jax.device_put(fstack[i : i + qw]))
            for i in range(0, W, qw)
        ]
        jax.block_until_ready(queues)
        # compile + settle
        t0 = time.perf_counter()
        _ = np.asarray(engine.query_queue_staged(*queues[0]))
        log(f"QW={qw}: first call (compile) {time.perf_counter()-t0:.1f}s")
        for fetch in ("full", "slice"):
            times = []
            for _ in range(20):
                t0 = time.perf_counter()
                outs = [engine.query_queue_staged(d, f) for d, f in queues]
                if fetch == "full":
                    _ = [np.asarray(o) for o in outs]
                else:
                    _ = np.asarray(outs[-1][-1])
                times.append((time.perf_counter() - t0) / W)
            times = np.array(times) * 1e3
            log(
                f"QW={qw} fetch={fetch}: best {times.min():.2f} ms/batch "
                f"p50 {np.percentile(times,50):.2f} p90 {np.percentile(times,90):.2f} "
                f"max {times.max():.2f}  (qps best {N_QUERIES/times.min()*1e3:,.0f})"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
