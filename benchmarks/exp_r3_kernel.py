"""Round-3 scan-kernel experiments (VERDICT item 2): race the current
per-group-reduction kernel against (a) a scratch-stacked variant doing ONE
(gb*QM, TR) reduction pass per grid step, and (b) gb sweeps. All timings in
one process, scans-only (device-reduced output, 4-byte fetch) so kernel
deltas aren't drowned by the ~35 ms fetch floor."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 10_000
W = 32


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nns_tpu.data import make_dataset
    from nns_tpu.kernels.cell_list import CellListEngine, _cell_scan
    from nns_tpu.kernels.pallas_fused import _interpret

    queries, refs = make_dataset(3, N, 1_000_000, 1000)
    engine = CellListEngine(refs)
    rng = np.random.default_rng(1001)
    batches = [queries] + [rng.random((N, 3), dtype=np.float32) for _ in range(W - 1)]
    dstack, fstack, orders = engine.stage_queue(batches)
    dq = jax.device_put(dstack)
    jax.block_until_ready(dq)
    halo2 = jnp.float32(engine.halo) ** 2
    hd, hid = engine.halo_dm, engine.halo_ids_dev
    interp = _interpret()
    G = engine.D ** 3
    r_max = engine.R_max
    qm = dstack.shape[2]
    log(f"G={G} R_max={r_max} QM={qm}")

    # --- stacked-reduction kernel ------------------------------------
    def stacked_kernel(q_ref, h_ref, id_ref, min_ref, gid_ref, scratch,
                       *, gb, qm, tr):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            min_ref[:] = jnp.full(min_ref.shape, jnp.inf, dtype=jnp.float32)
            gid_ref[:] = jnp.zeros(gid_ref.shape, dtype=jnp.int32)

        for g in range(gb):
            q = q_ref[g]
            h = h_ref[g]
            d2 = jnp.zeros((qm, tr), dtype=jnp.float32)
            for d in range(3):
                diff = q[:, d : d + 1] - h[d : d + 1, :]
                d2 = d2 + diff * diff
            scratch[g * qm:(g + 1) * qm, :] = d2
        s = scratch[:, :]
        ids_all = id_ref[:, 0, :]  # (gb, tr)
        # one reduction pass over the whole (gb*qm, tr) scratch
        local_min = jnp.min(s, axis=1, keepdims=True)          # (gb*qm, 1)
        # one-hot id min needs each row's group ids: broadcast by reshape
        s3 = s.reshape(gb, qm, tr)
        lm3 = local_min.reshape(gb, qm, 1)
        masked = jnp.where(s3 == lm3, ids_all[:, None, :], jnp.int32(1 << 30))
        local_gid = jnp.min(masked, axis=2)                    # (gb, qm)
        lm = lm3[:, :, 0]
        better = lm < min_ref[:, :, 0]
        gid_ref[:, :, 0] = jnp.where(better, local_gid, gid_ref[:, :, 0])
        min_ref[:, :, 0] = jnp.where(better, lm, min_ref[:, :, 0])

    def cell_scan_stacked(dense_q, gb):
        g_total = dense_q.shape[0]
        cap = min(8192, (1 << 20) // max(qm, 1))
        lane_divisors = [d for d in range(128, r_max + 1, 128) if r_max % d == 0]
        tr = max((d for d in lane_divisors if d <= cap), default=lane_divisors[0])
        hg = G // gb
        if g_total == G:
            h_index = lambda g, j: (g, 0, j)
        else:
            h_index = lambda g, j: (g % hg, 0, j)
        return pl.pallas_call(
            functools.partial(stacked_kernel, gb=gb, qm=qm, tr=tr),
            grid=(g_total // gb, r_max // tr),
            in_specs=[
                pl.BlockSpec((gb, qm, 3), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 3, tr), h_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 1, tr), h_index, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((gb, qm, 1), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, qm, 1), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((g_total, qm, 1), jnp.float32),
                jax.ShapeDtypeStruct((g_total, qm, 1), jnp.int32),
            ),
            scratch_shapes=[pltpu.VMEM((gb * qm, tr), jnp.float32)],
            interpret=interp,
        )(dense_q, hd, hid[:, None, :])

    def make_drain(scan_fn):
        @jax.jit
        def drain(dq_):
            acc = jnp.int32(0)
            for w in range(W):
                dmin, dgid = scan_fn(dq_[w])
                acc = acc + jnp.where(dmin[:, :, 0] <= halo2, dgid[:, :, 0], 0).sum()
            return acc.reshape(1)
        return drain

    @jax.jit
    def drain_scan_form(dq_):
        def body(acc, dense):
            dmin, dgid = _cell_scan(dense, hd, hid, halo2, interp)
            return acc + jnp.where(dmin[:, :, 0] <= halo2, dgid[:, :, 0], 0).sum(), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), dq_)
        return acc.reshape(1)

    variants = {
        "current gb=8": make_drain(lambda d: _cell_scan(d, hd, hid, halo2, interp)),
        "current gb=4": make_drain(lambda d: _cell_scan(d, hd, hid, halo2, interp, group_batch=4)),
        "stacked gb=8": make_drain(lambda d: cell_scan_stacked(d, 8)),
        "stacked gb=14": make_drain(lambda d: cell_scan_stacked(d, 14)),
        "lax.scan form gb=8": drain_scan_form,
    }
    ref_val = None
    for name, fn in variants.items():
        try:
            t0 = time.perf_counter()
            v = int(np.asarray(fn(dq))[0])
            log(f"{name}: compile+run {time.perf_counter()-t0:.1f}s checksum {v}")
            if ref_val is None:
                ref_val = v
            elif v != ref_val:
                log(f"  !! checksum mismatch vs current ({ref_val})")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            variants[name] = None
    for rnd in range(2):
        for name, fn in variants.items():
            if fn is None:
                continue
            best = float("inf")
            for _ in range(10):
                t0 = time.perf_counter()
                _ = np.asarray(fn(dq))
                best = min(best, time.perf_counter() - t0)
            log(f"round {rnd} {name}: {best*1e3:.1f} ms / {best*1e3/W:.3f} ms/batch (incl ~35ms fetch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
