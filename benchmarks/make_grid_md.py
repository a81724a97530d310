"""Render harness JSONL records into the grid markdown tables.

Usage:
  python -m nns_tpu.harness --jsonl grid.jsonl            # all 15 versions
  python benchmarks/make_grid_md.py grid.jsonl benchmarks/GRID_RESULTS.md

  python -m nns_tpu.harness --versions 10,11,12,13,14 --clustered \
      --jsonl clustered.jsonl
  python benchmarks/make_grid_md.py clustered.jsonl \
      benchmarks/CLUSTERED_RESULTS.md --clustered

Re-running the harness with a subset of versions appends to the JSONL;
this renderer keeps the LAST record per (version, k, m, n), so partial
re-measurements update their rows in place.
"""

from __future__ import annotations

import argparse
import json

_HDR_UNIFORM = """# Reference-grid results (all 15 versions x 10 configs, real v5e via axon)
Protocol: seed 1000, identical data per version, 1 untimed warm build +
2 warm-up + best-of-3 timed query runs per cell (first-compile excluded
from BOTH build and query columns), recall verified against the f64
oracle on capped subsamples. {recall_line}
Timings include per-call host<->device transfer and ~20-45 ms tunnel
round-trip latency (see docs/ARCHITECTURE.md); kernels are far faster
when staged and chained (bench.py, benchmarks/RESULTS.md).
"""

_HDR_CLUSTERED = """# Clustered-domain grid (tree + flagship versions, real v5e via axon)

`python -m nns_tpu.harness --versions 10,11,12,13,14 --clustered` — the
BASELINE config-5 domain (clustered Gaussian-mixture reference points,
the octree family's home turf). Same protocol as GRID_RESULTS.md (seed
1000, 1 warm build, 2 query warm-ups, best-of-3, f64-oracle recall on
capped subsamples; first-compile excluded from both columns).
{recall_line} v14 (cells) adapts per workload: its
fixed-halo certificate misses clustered batches, so NNEngine promotes it
to the octree beam index after the first batch (visible as the one-shot
qps here; the steady-state serving numbers are in RESULTS.md rows 5/5b).
One-shot rows include ~30-45 ms of tunnel round-trip per call.
"""


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("jsonl")
    p.add_argument("out")
    p.add_argument("--clustered", action="store_true")
    args = p.parse_args()

    seen: dict = {}
    with open(args.jsonl) as f:
        for line in f:
            r = json.loads(line)
            seen[(r["version"], r["k"], r["m"], r["n"])] = r
    rows = list(seen.values())
    bad = [r for r in rows
           if r.get("recall_at_1") is not None and r["recall_at_1"] < 1.0]
    lines = [
        f"| {r['version']} | {r['k']} | {r['m']} | {r['n']} | "
        f"{r['build_ms']:.1f} | {r['query_ms']:.1f} | {r['qps']:.0f} |"
        for r in rows
    ]
    # The recall claim is computed from the rows, never hard-coded: a
    # regressed run must not produce an artifact whose prose contradicts
    # its own table (ADVICE round 2).
    if bad:
        recall_line = (
            "**RECALL REGRESSION: "
            + ", ".join(
                f"{r['version']} k={r['k']} m={r['m']} n={r['n']} "
                f"recall={r['recall_at_1']}" for r in bad
            )
            + ".**"
        )
    else:
        recall_line = "**recall@1 = 1.0 on every run.**"
    hdr = (_HDR_CLUSTERED if args.clustered else _HDR_UNIFORM).format(
        recall_line=recall_line
    )
    with open(args.out, "w") as f:
        f.write(hdr + "\n| version | k | m | n | build ms | query ms | qps |\n"
                "|---|---|---|---|---|---|---|\n" + "\n".join(lines) + "\n")
    print(f"{args.out}: {len(rows)} rows, {len(bad)} below recall 1.0")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
