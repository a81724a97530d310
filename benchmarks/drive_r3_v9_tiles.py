"""Real-chip A/B of PRODUCTION MXUExpansion tile configs (one process).

exp_r4_k16.py swept phase-1 kernels and two-dispatch pipelines with mixed
fetch accounting; this drives the production single-jit path
(`query_min_idx_cert`: phase 1 + phase 2 + certificate, one dispatch, one
packed fetch) at each candidate (tile_m, tile_n) so the numbers are
directly comparable. Recall checked vs the f64 oracle per config.

Run on the real chip: PYTHONPATH=/root/repo python benchmarks/drive_r3_v9_tiles.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

M, N, K = 10240, 1 << 20, 16
CONFIGS = ((1024, 512), (2048, 1024), (1024, 2048), (1024, 4096),
           (2048, 2048), (2048, 4096))


def main() -> None:
    import jax

    import nns_tpu  # noqa: F401  (compile cache)
    from nns_tpu.kernels.mxu_expansion import MXUExpansion
    from nns_tpu.kernels.oracle import recall_at_1

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(1000)
    refs = rng.random((N, K), dtype=np.float32)
    queries = rng.random((M, K), dtype=np.float32)
    sub = rng.choice(M, size=512, replace=False)

    best_cfg, best_ms = None, np.inf
    for tm, tn in CONFIGS:
        try:
            eng = MXUExpansion(refs, tile_m=tm, tile_n=tn)
            t0 = time.perf_counter()
            _, idx, cert = eng.query_min_idx_cert(queries)
            compile_s = time.perf_counter() - t0
            best = np.inf
            for _ in range(8):
                t0 = time.perf_counter()
                _, idx, cert = eng.query_min_idx_cert(queries)
                best = min(best, time.perf_counter() - t0)
            rec = recall_at_1(np.asarray(eng.query(queries))[sub],
                              queries[sub], refs)
            print(f"prod ({tm}, {tn}, ts={eng.ts}): best {best*1e3:.1f} ms "
                  f"cert_frac {cert.mean():.4f} recall(512 sub) {rec} "
                  f"(compile {compile_s:.1f}s)", flush=True)
            if rec != 1.0:
                print(f"  RECALL FAILURE at ({tm}, {tn})", flush=True)
            elif best < best_ms:
                best_cfg, best_ms = (tm, tn), best
        except Exception as ex:
            print(f"prod ({tm}, {tn}): FAILED {str(ex)[:140]}", flush=True)
    print(f"--> best production config: {best_cfg} at {best_ms*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
