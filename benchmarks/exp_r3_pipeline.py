"""Round-3: (1) do result fetches overlap with subsequent drains through the
tunnel? (2) which part of the queue epilogue costs — the where/sign-encode,
the stack, or the scan itself?"""

import functools
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
    dq = jax.device_put(dstack)
    jax.block_until_ready(dq)
    halo2 = jnp.float32(engine.halo) ** 2
    hd, hi_ = engine.halo_dm, engine.halo_ids_dev
    interp = _interpret()

    # --- epilogue variants, all one jit over 32 scans ------------------
    @functools.partial(jax.jit, static_argnames=())
    def drain_current(dq_):
        outs = []
        for w in range(W):
            dmin, dgid = _cell_scan(dq_[w], hd, hi_, halo2, interp)
            ok = dmin[:, :, 0] <= halo2
            outs.append(jnp.where(ok, dgid[:, :, 0], -dgid[:, :, 0] - 1).reshape(-1))
        return jnp.stack(outs)

    @functools.partial(jax.jit, static_argnames=())
    def drain_raw(dq_):
        mins, gids = [], []
        for w in range(W):
            dmin, dgid = _cell_scan(dq_[w], hd, hi_, halo2, interp)
            mins.append(dmin[:, :, 0])
            gids.append(dgid[:, :, 0])
        return jnp.stack(mins), jnp.stack(gids)  # no where/sign encode

    @functools.partial(jax.jit, static_argnames=())
    def drain_tiny(dq_):
        acc = jnp.int32(0)
        for w in range(W):
            dmin, dgid = _cell_scan(dq_[w], hd, hi_, halo2, interp)
            acc = acc + jnp.where(dmin[:, :, 0] <= halo2, dgid[:, :, 0], 0).sum()
        return acc.reshape(1)

    for name, fn, pick in (
        ("current (where+stack i32)", drain_current, lambda o: o[-1]),
        ("raw (stack min+gid)", drain_raw, lambda o: o[1][-1]),
        ("tiny (device reduce)", drain_tiny, lambda o: o),
    ):
        out = fn(dq)
        _ = np.asarray(pick(out))
        best = float("inf")
        for _ in range(15):
            t0 = time.perf_counter()
            out = fn(dq)
            _ = np.asarray(pick(out))
            best = min(best, time.perf_counter() - t0)
        log(f"{name}: {best*1e3:.1f} ms / {best*1e3/W:.3f} ms/batch")

    # --- pipelined fetches: R rounds, submit-all then fetch-all --------
    R = 6
    for mode in ("sequential", "submit-all-then-fetch"):
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            if mode == "sequential":
                for _r in range(R):
                    out = drain_current(dq)
                    _ = np.asarray(out[-1])
            else:
                outs = [drain_current(dq) for _r in range(R)]
                for o in outs:
                    _ = np.asarray(o[-1])
            best = min(best, time.perf_counter() - t0)
        log(f"pipeline {mode}: {best*1e3:.1f} ms for {R} rounds "
            f"({best*1e3/(R*W):.3f} ms/batch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
