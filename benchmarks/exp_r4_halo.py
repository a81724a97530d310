"""Round-4 halo-slack A/B (VERDICT r3 item 6): the flagship carries
avg_cand ~978 vs ~364 points/supercell at halo c = 1.5. A smaller c
shrinks every batch's scan; the price is more certificate misses, each
re-answered by the exact fused scan INSIDE the serving drain (bench.py r4
protocol). This measures both sides at the bench workload so the default
is a decision, not a guess.

Run on the real chip: python benchmarks/exp_r4_halo.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nns_tpu  # noqa: F401
from nns_tpu.data import make_dataset

K, M, N, SEED, W = 3, 10_000, 1_000_000, 1000, 768


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nns_tpu.kernels.cell_list import CellListEngine
    from nns_tpu.kernels.pallas_fused import FusedBruteForce

    queries, refs = make_dataset(K, M, N, SEED)
    rng = np.random.default_rng(SEED + 1)
    lo, hi = refs.min(axis=0), refs.max(axis=0)
    batches = [queries] + [
        (rng.random((M, K), dtype=np.float32) * (hi - lo) + lo).astype(np.float32)
        for _ in range(W - 1)
    ]
    volume = float(np.prod(np.maximum(hi - lo, 1e-6)))
    fb = FusedBruteForce(refs)

    for c in (1.5, 1.35, 1.2, 1.0):
        halo = c * (volume / N) ** (1.0 / 3.0)
        t0 = time.perf_counter()
        eng = CellListEngine(refs, halo=halo)
        t_build = time.perf_counter() - t0
        denses, fslots, orders = eng.stage_queue_ragged(batches)
        dq = tuple(jax.device_put(denses))
        jax.block_until_ready(dq)
        offs = np.concatenate(
            [[0], np.cumsum([d.shape[0] * d.shape[1] for d in denses])])
        out = eng.query_queue_staged(dq)  # warm/compile
        full = np.asarray(jnp.concatenate([r.reshape(-1) for r in out]))
        n_unc = 0
        for w in range(W):
            _, ok_w = eng.unscatter_queue(
                full[offs[w]:offs[w + 1]], fslots[w], orders[w])
            n_unc += int((~ok_w).sum())
        from nns_tpu.kernels.layouts import pow2_at_least

        bucket = pow2_at_least(max(n_unc, 8))
        q_pad = jax.device_put(np.zeros((bucket, K), np.float32))
        _ = np.asarray(fb.query(q_pad))  # warm the patch bucket
        best = np.inf
        for _ in range(8):
            t0 = time.perf_counter()
            out = eng.query_queue_staged(dq)
            _ = np.asarray(fb.query(q_pad))  # sync rides the patch
            best = min(best, (time.perf_counter() - t0) / W)
        print(f"c={c}: R_max={eng.R_max} avg_cand={eng.avg_candidates:.0f} "
              f"uncert={n_unc}/{W*M} patch_bucket={bucket} "
              f"drain+patch {best*1e3:.3f} ms/batch "
              f"(build {t_build:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
