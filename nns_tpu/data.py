"""Sample generation (reference analog: getRand/getSample, main.cu:10-35).

The reference fills point sets with uniform [0, 1] floats from seeded libc
rand() (main.cu:10-22), reseeding before each version so every version sees
identical data (main.cu:64). We use a seeded numpy Generator: same contract
(deterministic, identical across versions for a given seed), better RNG.
"""

from __future__ import annotations

import numpy as np


def make_dataset(
    k: int, m: int, n: int, seed: int, clustered: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Return (queries[m,k], refs[n,k]) float32 in [0,1].

    ``clustered=True`` draws reference points from a mixture of Gaussian
    blobs instead of uniform — the workload where spatial trees shine
    (BASELINE.md octree config: "1M clustered 3-D refs").
    """
    rng = np.random.default_rng(seed)
    if clustered:
        n_clusters = max(1, int(np.sqrt(n) / 4))
        centers = rng.random((n_clusters, k), dtype=np.float32)
        assign = rng.integers(0, n_clusters, size=n)
        refs = centers[assign] + rng.normal(0, 0.01, size=(n, k)).astype(np.float32)
        refs = np.clip(refs, 0.0, 1.0).astype(np.float32)
    else:
        refs = rng.random((n, k), dtype=np.float32)
    queries = rng.random((m, k), dtype=np.float32)
    return queries, refs
