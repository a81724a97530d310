"""Round-5 ground truth: xplane device-op decomposition of the promoted
high-k beam drain (the clustered k=16 serving path, VERDICT r4 #2).

bench_k16_clustered measures 60.1 ms/batch for the beam=4 drain at
coverage 1.0 while the scanned-pair reduction vs the full MXU scan is
~256x — so the pruned scan is NOT flop-bound. This script points
profile_device_ops at _beam_query_many on the same workload shape and
separates the candidates: the (m, F) box-bound accumulation, lax.top_k,
the (m, nb, cap, k) bucket-points gather, the direct-form distance eval,
the extras scan, and the argmin epilogue. Also logs the MXU engine's
phase-1 certificate fraction on the same clustered batch — the number
behind the full scan's 41K qps collapse (every uncertified row floods
the refine tiers).

Run on the real chip: python benchmarks/prof_r5_beam.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nns_tpu  # noqa: F401  (compile cache)
from nns_tpu.data import make_dataset
from nns_tpu.trees.kdtree import KDTree
from nns_tpu.utils.profiling import profile_device_ops

N = int(os.environ.get("NNS_BENCH_N", str(1 << 20)))
M = 10_000
K = 16
W = int(os.environ.get("NNS_BENCH_K16_W", "8"))
SEED = 1000


def main() -> None:
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    _, refs = make_dataset(K, 1, N, SEED, clustered=True)
    rng = np.random.default_rng(SEED + 1)

    def indist(m: int) -> np.ndarray:
        base = refs[rng.integers(0, N, size=m)]
        return (base + rng.normal(0, 0.01, size=base.shape)).astype(np.float32)

    allq = indist(W * M)

    t0 = time.perf_counter()
    bi = KDTree.build(refs).device_index()
    print(f"KD build + frontier staging: {time.perf_counter()-t0:.1f}s "
          f"(F={bi.lo.shape[0]} cap={bi.pts.shape[1]} "
          f"extras={bi.extras.shape[0]})", flush=True)

    st = bi.stage_queries(allq)
    idx, ok = bi.query_staged_with_flags(st, beam=4)  # compile
    print(f"warm: coverage (base pass) {ok.mean():.5f}", flush=True)

    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        bi.query_staged_with_flags(st, beam=4)
        best = min(best, time.perf_counter() - t0)
    print(f"wall: drain {best*1e3:.1f} ms ({best/W*1e3:.2f} ms/batch)",
          flush=True)

    rep = profile_device_ops(
        lambda: np.asarray(bi.query_staged_with_flags(st, beam=4)[0])
    )
    print(rep, flush=True)
    print(f"device total: {rep.total_ms:.1f} ms "
          f"({rep.total_ms/W:.2f} ms/batch)", flush=True)

    # The MXU engine's certificate fraction on the same clustered batch —
    # why the full scan collapses here.
    from nns_tpu.kernels.mxu_expansion import MXUExpansion

    eng = MXUExpansion(refs)
    _, _, cert = eng.query_min_idx_cert(allq[:M])
    print(f"MXU phase-1 cert_frac on clustered batch: "
          f"{np.asarray(cert).mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
