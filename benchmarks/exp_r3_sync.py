"""Round-3: is jax Array.is_ready() a truthful completion signal under the
axon tunnel? If time-to-ready scales linearly with K chained drains and is
False right after dispatch, polling it is a sound sync that avoids the
~35 ms fetch round-trip. Also: W=64/96 drains for fetch amortization."""

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
    from nns_tpu.kernels.cell_list import CellListEngine

    N = 10_000
    queries, refs = make_dataset(3, N, 1_000_000, 1000)
    engine = CellListEngine(refs)
    rng = np.random.default_rng(1001)

    W = 32
    batches = [queries] + [rng.random((N, 3), dtype=np.float32) for _ in range(W - 1)]
    dstack, fstack, orders = engine.stage_queue(batches)
    dq = jax.device_put(dstack)
    jax.block_until_ready(dq)
    out = engine.query_queue_staged(dq)
    _ = np.asarray(out[-1])

    # Truthfulness probe: immediately after dispatch, is_ready must be
    # False; time-to-True must scale with chained drains K.
    for K in (1, 2, 4, 8):
        readies = []
        polls = []
        for _ in range(8):
            t0 = time.perf_counter()
            for _k in range(K):
                out = engine.query_queue_staged(dq)
            r0 = out.is_ready()
            while not out.is_ready():
                pass
            readies.append((time.perf_counter() - t0) * 1e3)
            polls.append(r0)
        log(f"K={K}: ready-immediately={sum(polls)}/8, "
            f"time-to-ready best {min(readies):.1f} ms "
            f"({min(readies)/(K*W):.3f} ms/batch)")

    # Cross-check: after is_ready, a fetch must return instantly-ish?
    t0 = time.perf_counter()
    out = engine.query_queue_staged(dq)
    while not out.is_ready():
        pass
    t_ready = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = np.asarray(out[-1])
    t_fetch = time.perf_counter() - t0
    log(f"ready {t_ready*1e3:.1f} ms then fetch {t_fetch*1e3:.1f} ms "
        f"(checksum {int(res.sum())})")

    # W sweep with fetch sync (the conservative protocol).
    for W2 in (64, 96):
        b2 = [queries] + [rng.random((N, 3), dtype=np.float32) for _ in range(W2 - 1)]
        d2, f2, o2 = engine.stage_queue(b2)
        dq2 = jax.device_put(d2)
        jax.block_until_ready(dq2)
        t0 = time.perf_counter()
        _ = np.asarray(engine.query_queue_staged(dq2)[-1])
        log(f"W={W2}: first call (compile) {time.perf_counter()-t0:.1f} s")
        best = float("inf")
        for _ in range(12):
            t0 = time.perf_counter()
            _ = np.asarray(engine.query_queue_staged(dq2)[-1])
            best = min(best, (time.perf_counter() - t0) / W2)
        log(f"W={W2} fetch-sync: {best*1e3:.3f} ms/batch -> {N/best:,.0f} qps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
