"""MXU two-pass exact kernel tests: exactness incl. adversarial near-ties
that force the refinement/fallback machinery."""

import numpy as np
import pytest

from conftest import assert_exact
from nns_tpu.data import make_dataset
from nns_tpu.kernels.mxu_turbo import MXUBruteForce, nns_mxu_turbo


@pytest.mark.parametrize("k,m,n", [(3, 64, 8192), (16, 32, 8192), (3, 200, 4096)])
def test_turbo_exact(k, m, n):
    q, r = make_dataset(k, m, n, seed=1000)
    assert_exact(nns_mxu_turbo(q, r, tile_n=512), q, r)


def test_turbo_small_n_routes_direct():
    q, r = make_dataset(3, 16, 1024, seed=1)
    assert_exact(nns_mxu_turbo(q, r), q, r)


def test_turbo_engine_reuse():
    q, r = make_dataset(3, 64, 8192, seed=2)
    eng = MXUBruteForce(r, tile_n=512)
    assert_exact(eng.query(q), q, r)
    assert_exact(eng.query(q[:16]), q[:16], r)


def test_turbo_near_ties_across_tiles():
    # Many near-identical points spread across tiles, all within the
    # expansion-error band of the optimum — forces multi-tile candidates
    # and the >top_l fallback. Exactness must hold.
    rng = np.random.default_rng(3)
    n = 8192
    r = rng.random((n, 3), dtype=np.float32)
    target = np.array([0.5, 0.5, 0.5], dtype=np.float32)
    winners = [100, 700, 1500, 2300, 3100, 3900, 4700, 7900]
    for j, w in enumerate(winners):
        r[w] = target + np.float32(1e-7) * j  # graded micro-offsets
    q = np.tile(target, (8, 1)).astype(np.float32)
    eng = MXUBruteForce(r, tile_n=512, top_l=2)  # tiny L to force fallback
    idx = eng.query(q)
    assert_exact(idx, q, r)


def test_turbo_exact_duplicate_tiebreak():
    rng = np.random.default_rng(4)
    r = rng.random((4096, 3), dtype=np.float32)
    target = np.array([0.25, 0.75, 0.5], dtype=np.float32)
    for w in (17, 2000, 4000):
        r[w] = target
    q = target[None, :]
    eng = MXUBruteForce(r, tile_n=512)
    # All three duplicates tie exactly; refinement must return the lowest.
    assert eng.query(q)[0] == 17
