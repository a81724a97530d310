"""Brute-force family tests: v1/v2 XLA versions and v3..v7 Pallas versions,
each verified at recall@1 = 1.0 against the f64 oracle over the scaled
reference grid (main.cu:38-51 corners, SURVEY.md §4)."""

import numpy as np
import pytest

from conftest import assert_exact
from nns_tpu.data import make_dataset
from nns_tpu.kernels.pallas_fused import (
    nns_fused,
    nns_fused_point_major,
    nns_fused_queries_resident,
    nns_fused_streaming,
    nns_two_level,
)
from nns_tpu.kernels.xla_bruteforce import nns_distance_matrix, nns_expansion_matmul

ALL_BRUTE = [
    nns_distance_matrix,
    nns_expansion_matmul,
    nns_fused,
    nns_fused_point_major,
    nns_fused_queries_resident,
    nns_fused_streaming,
    nns_two_level,
]


@pytest.mark.parametrize("fn", ALL_BRUTE, ids=lambda f: f.__name__)
def test_bruteforce_exact_on_grid(fn, grid_datasets):
    for k, m, n, q, r in grid_datasets:
        idx = np.asarray(fn(q, r))
        assert idx.shape == (m,), f"{fn.__name__} shape at {(k, m, n)}"
        assert_exact(idx, q, r)


@pytest.mark.parametrize("fn", ALL_BRUTE, ids=lambda f: f.__name__)
def test_bruteforce_unaligned_shapes(fn):
    # Shapes that are not multiples of any tile size (padding paths).
    q, r = make_dataset(k=5, m=33, n=777, seed=11)
    assert_exact(np.asarray(fn(q, r)), q, r)


@pytest.mark.parametrize("fn", [nns_fused, nns_two_level], ids=lambda f: f.__name__)
def test_lowest_index_tiebreak_across_tiles(fn):
    # Duplicate points placed in different reference tiles: the returned
    # index must be the lowest (reference scan convention, core.cu:30-47).
    rng = np.random.default_rng(0)
    r = rng.random((600, 3), dtype=np.float32)
    target = np.array([0.25, 0.5, 0.75], dtype=np.float32)
    for dup in (17, 300, 599):  # spread across tiles for small tile_n
        r[dup] = target
    q = target[None, :]
    idx = np.asarray(fn(q, r, tile_m=8, tile_n=128))
    assert idx[0] == 17


def test_single_query_single_ref():
    q = np.array([[0.1, 0.2, 0.3]], dtype=np.float32)
    r = np.array([[0.9, 0.9, 0.9]], dtype=np.float32)
    for fn in ALL_BRUTE:
        assert np.asarray(fn(q, r))[0] == 0, fn.__name__
