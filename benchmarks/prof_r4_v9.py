"""Round-4 k=16 ground truth: xplane device-op decomposition of the v9
drain (VERDICT round 3 item 1).

bench_k16 measures 46.4 ms/batch (W=8 x 10K queries, 1M refs) against a
~13 ms MXU speed-of-light estimate, and PERF_NOTES carries an UNMEASURED
"~12 ms/batch device" claim. This script points profile_device_ops (the
in-repo xplane parser) at the drain and separates:

  1. device time of the certified path (_query_packed: phase-1 Pallas MXU
     scan + phase-2 winning-tile rescan), per op;
  2. device time of the full query() (adds the exact-refine fallback for
     the ~1.65% uncertified rows — a 2048-query padded FusedBruteForce
     pass over all 1M refs);
  3. wall-clock split: host staging (q2_max bound), dispatch+device,
     fetch, refine.

Run on the real chip: python benchmarks/prof_r4_v9.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nns_tpu  # noqa: F401  (compile cache)
from nns_tpu.kernels.mxu_expansion import MXUExpansion
from nns_tpu.utils.profiling import profile_device_ops

N, M, K, W = 1 << 20, 10_000, 16, 8


def main() -> None:
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1000)
    refs = rng.random((N, K), dtype=np.float32)
    batches = [rng.random((M, K), dtype=np.float32) for _ in range(W)]
    allq = np.concatenate(batches, axis=0)

    eng = MXUExpansion(refs)
    print(f"tiles ({eng.tile_m}, {eng.tile_n}), ts={eng.ts}", flush=True)

    # Warm both paths (compile + fallback staging).
    idx = eng.query(allq)
    packed = eng._query_packed(allq)
    cert = packed[3] > 0.5
    n_bad = int((~cert).sum())
    print(f"warm: cert_frac={cert.mean():.4f} ({n_bad} uncertified of {len(cert)})",
          flush=True)

    # --- wall-clock split over several trials -----------------------------
    best_full = best_packed = np.inf
    for _ in range(6):
        t0 = time.perf_counter()
        idx = eng.query(allq)
        best_full = min(best_full, time.perf_counter() - t0)
        t0 = time.perf_counter()
        packed = eng._query_packed(allq)
        best_packed = min(best_packed, time.perf_counter() - t0)
    print(f"wall: full query() {best_full*1e3:.1f} ms "
          f"({best_full/W*1e3:.1f}/batch); certified-only packed "
          f"{best_packed*1e3:.1f} ms ({best_packed/W*1e3:.1f}/batch); "
          f"refine share {(best_full-best_packed)*1e3:.1f} ms "
          f"({(best_full-best_packed)/W*1e3:.2f}/batch)", flush=True)

    # Host-side q2_max bound cost (inside _query_packed's timed region).
    t0 = time.perf_counter()
    for _ in range(4):
        _ = float((allq.astype(np.float64) ** 2).sum(axis=1).max())
    print(f"host q2_max bound: {(time.perf_counter()-t0)/4*1e3:.1f} ms",
          flush=True)

    # --- xplane decomposition ---------------------------------------------
    rep_packed = profile_device_ops(lambda: eng._query_packed(allq))
    print("\n=== certified path (_query_packed) device ops ===", flush=True)
    print(rep_packed, flush=True)
    print(f"device total {rep_packed.total_ms:.1f} ms "
          f"({rep_packed.total_ms/W:.2f}/batch)", flush=True)

    rep_full = profile_device_ops(lambda: eng.query(allq))
    print("\n=== full query() device ops ===", flush=True)
    print(rep_full, flush=True)
    print(f"device total {rep_full.total_ms:.1f} ms "
          f"({rep_full.total_ms/W:.2f}/batch)", flush=True)

    # Roofline reference arithmetic, printed for the NUMBERS.md row. The
    # MXU charges ceil(contraction/128) systolic passes, so the EFFECTIVE
    # flop bill pads the 6*kp=96-wide contraction to 128.
    flops = 2 * allq.shape[0] * 6 * eng.kp * eng.rc.shape[1]
    flops_pad = 2 * allq.shape[0] * 128 * eng.rc.shape[1]
    hbm = eng.rc.size * 2 * (allq.shape[0] // eng.tile_m + 1)
    print(f"\nroofline: {flops/1e12:.2f} TFLOP bf16 useful, "
          f"{flops_pad/1e12:.2f} charged at 128-deep "
          f"(~{flops_pad/197e12*1e3:.1f} ms at 197 TFLOPS peak); "
          f"rc stream {hbm/1e9:.2f} GB (deduplicated splits, "
          f"~{hbm/819e9*1e3:.1f} ms at 819 GB/s)", flush=True)


if __name__ == "__main__":
    main()
