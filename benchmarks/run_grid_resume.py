"""Resumable reference-grid runner: appends harness rows to a JSONL,
skipping (version, k, m, n) cells already present, and exits with code 3
when the wall-clock budget runs out. Re-run until exit 0, then render:

  python benchmarks/run_grid_resume.py 540 benchmarks/grid_r3.jsonl
  python benchmarks/make_grid_md.py benchmarks/grid_r3.jsonl benchmarks/GRID_RESULTS.md

  python benchmarks/run_grid_resume.py 540 benchmarks/clustered_r3.jsonl --clustered
  python benchmarks/make_grid_md.py benchmarks/clustered_r3.jsonl \
      benchmarks/CLUSTERED_RESULTS.md --clustered
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 540.0
    jsonl = sys.argv[2] if len(sys.argv) > 2 else "benchmarks/grid_r3.jsonl"
    clustered = "--clustered" in sys.argv

    import jax
    import jax.numpy as jnp

    from nns_tpu.api import get_version
    from nns_tpu.config import REFERENCE_GRID, BenchConfig
    from nns_tpu.harness import run_one
    from nns_tpu.utils.report import ReportWriter
    from nns_tpu.utils.timing import warmup

    versions = (10, 11, 12, 13, 14) if clustered else tuple(range(15))
    cfg = BenchConfig(
        versions=versions, grid=REFERENCE_GRID, seed=1000, warmup_iters=2,
        timing_iters=3, check_recall=True, clustered=clustered, jsonl_path=None,
    )

    seen = set()
    if os.path.exists(jsonl):
        with open(jsonl) as f:
            for line in f:
                r = json.loads(line)
                seen.add((r["version"], r["k"], r["m"], r["n"]))

    warmup(lambda: jnp.ones((8, 128)) * 2.0)
    writer = ReportWriter(jsonl)
    t0 = time.time()
    try:
        for v in versions:
            name = get_version(v).name
            for k, m, n in cfg.grid:
                if (name, k, m, n) in seen:
                    continue
                if time.time() - t0 > budget:
                    print(f"[resume] budget reached; {len(seen)} cells done",
                          flush=True)
                    return 3
                rec = run_one(v, k, m, n, cfg)
                writer.add(rec)
                seen.add((name, k, m, n))
                print(
                    f"[grid] {rec.version:<24} k={k:<3} m={m:<6} n={n:<8} "
                    f"build={rec.build_ms:9.2f}ms query={rec.query_ms:9.2f}ms "
                    f"qps={rec.qps:12.1f} recall={rec.recall_at_1}",
                    flush=True,
                )
    finally:
        writer.close()
    print(f"[resume] COMPLETE: {len(seen)} cells", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
