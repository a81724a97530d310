"""Randomized cross-version fuzz: random shapes, dims, seeds, and data
distributions; every engine must agree with the f64 oracle (tie-tolerant).
The reference had no such check anywhere (SURVEY.md §4)."""

import numpy as np
import pytest

from conftest import assert_exact
import nns_tpu


def _random_case(rng):
    k = int(rng.integers(1, 9))
    m = int(rng.integers(1, 300))
    n = int(rng.integers(2, 5000))
    kind = rng.integers(0, 4)
    if kind == 0:  # uniform
        refs = rng.random((n, k)).astype(np.float32)
    elif kind == 1:  # clustered
        centers = rng.random((max(1, n // 100), k)).astype(np.float32)
        refs = (centers[rng.integers(0, len(centers), n)]
                + rng.normal(0, 0.02, (n, k))).astype(np.float32)
    elif kind == 2:  # heavy duplicates
        base = rng.random((max(2, n // 10), k)).astype(np.float32)
        refs = base[rng.integers(0, len(base), n)]
    else:  # degenerate span (points on a lower-dim manifold)
        refs = rng.random((n, k)).astype(np.float32)
        refs[:, 0] = 0.5
    queries = (rng.random((m, k)) * 1.4 - 0.2).astype(np.float32)  # some outside
    return queries.astype(np.float32), refs


@pytest.mark.parametrize("case_seed", range(12))
def test_fuzz_versions_exact(case_seed):
    rng = np.random.default_rng(1000 + case_seed)
    q, r = _random_case(rng)
    versions = [0, 2, 4, 7, 8, 14]
    if r.shape[1] <= 16:
        versions += [10, 11]
    if r.shape[1] == 3:
        versions += [12, 13]
    for v in versions:
        idx = nns_tpu.nns(q, r, version=v)
        assert_exact(idx, q, r)


@pytest.mark.parametrize("case_seed", range(4))
def test_fuzz_topk_exact(case_seed):
    rng = np.random.default_rng(2000 + case_seed)
    q, r = _random_case(rng)
    kk = int(rng.integers(1, 12))
    d2, idx = nns_tpu.nns_topk(q, r, kk, chunk_n=1024)
    kc = min(kk, r.shape[0])
    d_oracle = np.sort(
        np.sum((q[:, None, :].astype(np.float64) - r[None].astype(np.float64)) ** 2, axis=-1),
        axis=1,
    )[:, :kc]
    d_ours = np.sum((q[:, None, :].astype(np.float64) - r[idx].astype(np.float64)) ** 2, axis=-1)
    np.testing.assert_allclose(np.sort(d_ours, axis=1), d_oracle, rtol=1e-4, atol=1e-8)
