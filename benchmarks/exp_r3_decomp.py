"""Round-3: decompose the 32-batch drain into compute slope + fetch/dispatch
intercept by chaining K drains before one sync fetch, and a tiny-output
variant that reduces the result on device (fetch = 4 bytes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_REFS = 1_000_000
N_QUERIES = 10_000
SEED = 1000
W = 32


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from nns_tpu.data import make_dataset
    from nns_tpu.kernels.cell_list import CellListEngine, _cell_scan
    from nns_tpu.kernels.pallas_fused import _interpret

    queries, refs = make_dataset(3, N_QUERIES, N_REFS, SEED)
    engine = CellListEngine(refs)
    rng = np.random.default_rng(SEED + 1)
    batches = [queries] + [
        rng.random((N_QUERIES, 3), dtype=np.float32) for _ in range(W - 1)
    ]
    dstack, fstack, orders = engine.stage_queue(batches)
    dq, fq = jax.device_put(dstack), jax.device_put(fstack)
    jax.block_until_ready((dq, fq))

    # K chained drains, one sync fetch.
    _ = np.asarray(engine.query_queue_staged(dq)[-1])
    for K in (1, 2, 4):
        best = float("inf")
        for _ in range(12):
            t0 = time.perf_counter()
            for _k in range(K):
                out = engine.query_queue_staged(dq)
            _ = np.asarray(out[-1])
            best = min(best, time.perf_counter() - t0)
        log(f"K={K} drains + 1 fetch: {best*1e3:.1f} ms total "
            f"({best*1e3/(K*W):.3f} ms/batch marginal-inclusive)")

    # Tiny-output variant: scans only, result reduced to (1,) on device.
    halo2 = jnp.float32(engine.halo) ** 2

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def drain_tiny(dstack_, halo_dm, halo_ids, interpret):
        acc = jnp.int32(0)
        for w in range(W):
            dmin, dgid = _cell_scan(dstack_[w], halo_dm, halo_ids, halo2, interpret)
            ok = dmin[:, :, 0] <= halo2
            acc = acc + jnp.where(ok, dgid[:, :, 0], -dgid[:, :, 0] - 1).sum()
        return acc.reshape(1)

    _ = np.asarray(drain_tiny(dq, engine.halo_dm, engine.halo_ids_dev, _interpret()))
    best = float("inf")
    for _ in range(15):
        t0 = time.perf_counter()
        _ = np.asarray(drain_tiny(dq, engine.halo_dm, engine.halo_ids_dev, _interpret()))
        best = min(best, time.perf_counter() - t0)
    log(f"tiny-output drain (scan-only + 4 B fetch): {best*1e3:.1f} ms total "
        f"({best*1e3/W:.3f} ms/batch)")

    # Fetch-only cost: fetch a precomputed full result repeatedly.
    out = engine.query_queue_staged(dq)
    _ = np.asarray(out[-1])
    best_s = float("inf")
    best_f = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(out[-1])
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(out)
        best_f = min(best_f, time.perf_counter() - t0)
    log(f"fetch-only: slice {best_s*1e3:.1f} ms ({out[-1].nbytes/1e3:.0f} KB), "
        f"full {best_f*1e3:.1f} ms ({out.nbytes/1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
