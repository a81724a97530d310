"""Supercell engine tests: exactness on uniform + adversarial data, fallback
certificate, dispatch contract."""

import numpy as np
import pytest

from conftest import assert_exact
from nns_tpu.data import make_dataset
from nns_tpu.kernels.cell_list import CellListEngine, nns_cell_list


@pytest.mark.parametrize("m,n", [(64, 8192), (200, 32768), (1, 8192)])
def test_cell_list_exact(m, n):
    q, r = make_dataset(3, m, n, seed=1000)
    assert_exact(nns_cell_list(q, r), q, r)


def test_cell_list_engine_reuse():
    q, r = make_dataset(3, 128, 16384, seed=1)
    eng = CellListEngine(r)
    assert_exact(eng.query(q), q, r)
    assert_exact(eng.query(q[:16]), q[:16], r)


def test_cell_list_far_query_fallback():
    # Query far outside the data cloud: certificate fails (best > halo),
    # exact fallback must kick in.
    _, r = make_dataset(3, 1, 8192, seed=2)
    r = r * np.float32(0.1)  # compress cloud
    q = np.array([[0.95, 0.95, 0.95]], dtype=np.float32)
    eng = CellListEngine(r)
    idx, ok = eng.query_with_flags(q)
    assert not ok.all()  # certificate correctly rejects
    assert_exact(eng.query(q), q, r)


def test_cell_list_empty_supercell():
    # Points only in one corner; queries in empty regions still exact.
    rng = np.random.default_rng(3)
    r = (rng.random((8192, 3)) * 0.3).astype(np.float32)
    q = rng.random((32, 3)).astype(np.float32)
    assert_exact(nns_cell_list(q, r), q, r)


def test_cell_list_duplicate_lowest_index():
    rng = np.random.default_rng(4)
    r = rng.random((8192, 3), dtype=np.float32)
    target = np.array([0.5, 0.5, 0.5], dtype=np.float32)
    for w in (11, 4000, 8000):
        r[w] = target
    q = target[None, :]
    assert CellListEngine(r).query(q)[0] == 11


def test_cell_list_clustered_overflow_guard():
    # Extremely clustered data must either work exactly or raise the
    # overflow guard (and the wrapper falls back to the fused kernel).
    rng = np.random.default_rng(5)
    r = (rng.normal(0, 0.001, (8192, 3)) + 0.5).astype(np.float32)
    q = rng.random((16, 3)).astype(np.float32)
    assert_exact(nns_cell_list(q, r), q, r)


def test_cell_list_non_3d_routes_to_fused():
    q, r = make_dataset(5, 16, 8192, seed=6)
    assert_exact(nns_cell_list(q, r), q, r)


def test_cell_list_save_load(tmp_path):
    from nns_tpu.kernels.cell_list import CellListEngine

    q, r = make_dataset(3, 32, 8192, seed=7)
    eng = CellListEngine(r)
    path = str(tmp_path / "cells.npz")
    eng.save(path)
    loaded = CellListEngine.load(path)
    np.testing.assert_array_equal(eng.query(q), loaded.query(q))


def test_cell_list_oversized_halo_clamped_stays_exact():
    # halo > supercell width would make the halo-set enumeration skip
    # middle cells; the engine must clamp it and stay exact (certificate
    # rejects what it cannot prove).
    from nns_tpu.kernels.cell_list import CellListEngine

    q, r = make_dataset(3, 64, 8192, seed=9)
    eng = CellListEngine(r, d_per_dim=12, halo=0.5)
    assert eng.halo <= eng.W.min() + 1e-12
    assert_exact(eng.query(q), q, r)


def test_cell_list_skewed_batch_guard():
    # All queries in one supercell: q_max would exceed the VMEM budget;
    # stage() must refuse and query() must fall back exactly.
    from nns_tpu.kernels.cell_list import CellListEngine

    rng = np.random.default_rng(10)
    r = rng.random((32768, 3), dtype=np.float32)
    eng = CellListEngine(r)
    m = eng.q_max_limit() * 2
    q = (np.float32(0.5) + rng.random((m, 3), dtype=np.float32) * np.float32(1e-4))
    packed, order, q_max = eng.stage(q)
    assert packed is None and q_max is None
    idx = eng.query(q)
    assert_exact(idx[:64], q[:64], r)  # subsample keeps the oracle cheap


def test_cascade_uniform_level0_coverage():
    from nns_tpu.kernels.cell_list import CellCascade

    q, r = make_dataset(3, 128, 16384, seed=14)
    cas = CellCascade(r)
    assert len(cas.engines) == 1  # levels are lazy; uniform never needs more
    idx, ok = cas.query_with_flags(q)
    assert ok.mean() > 0.95  # uniform data certifies at level 0
    assert_exact(cas.query(q), q, r)


def test_cascade_lazy_level_build():
    # Queries straddling a moderate density mismatch: level 0 misses some
    # but certifies enough (>= 50%) that a coarser level gets built lazily.
    from nns_tpu.kernels.cell_list import CellCascade

    rng = np.random.default_rng(15)
    r = rng.random((16384, 3), dtype=np.float32)
    q = np.concatenate(
        [rng.random((96, 3), dtype=np.float32),
         rng.random((32, 3), dtype=np.float32) * np.float32(2.0)]  # outside bbox
    ).astype(np.float32)
    cas = CellCascade(r)
    idx = cas.query(q)
    assert_exact(idx, q, r)


def test_cascade_clustered_refs_uniform_queries_exact():
    # Heavily clustered refs: coarse levels get pruned (no selectivity) and
    # misses go to the exact scan — result must stay exact regardless.
    from nns_tpu.kernels.cell_list import CellCascade

    q, r = make_dataset(3, 128, 32768, seed=15, clustered=True)
    cas = CellCascade(r)
    assert_exact(cas.query(q), q, r)


def test_cell_list_topk_matches_oracle():
    from nns_tpu.kernels.cell_list import CellListEngine

    q, r = make_dataset(3, 64, 16384, seed=16)
    eng = CellListEngine(r)
    d2, idx = eng.query_topk(q, 8)
    d_oracle = np.sort(
        np.sum((q[:, None, :].astype(np.float64) - r[None].astype(np.float64)) ** 2, axis=-1),
        axis=1,
    )[:, :8]
    d_ours = np.sum((q[:, None, :].astype(np.float64) - r[idx].astype(np.float64)) ** 2, axis=-1)
    np.testing.assert_allclose(np.sort(d_ours, axis=1), d_oracle, rtol=1e-5, atol=1e-9)
    assert (np.diff(d2, axis=1) >= 0).all()


def test_cell_list_topk_fallback_when_k_exceeds_halo():
    from nns_tpu.kernels.cell_list import CellListEngine

    q, r = make_dataset(3, 16, 8192, seed=17)
    eng = CellListEngine(r)
    k = 64  # k-th NN far beyond the halo radius -> certificate fails
    d2, idx = eng.query_topk(q, k)
    d_oracle = np.sort(
        np.sum((q[:, None, :].astype(np.float64) - r[None].astype(np.float64)) ** 2, axis=-1),
        axis=1,
    )[:, :k]
    d_ours = np.sum((q[:, None, :].astype(np.float64) - r[idx].astype(np.float64)) ** 2, axis=-1)
    np.testing.assert_allclose(np.sort(d_ours, axis=1), d_oracle, rtol=1e-5, atol=1e-9)


def test_cascade_clustered_coverage():
    """VERDICT r1 #3: uniform queries over clustered refs defeat a single
    halo radius (~18% coverage at 1M); the adaptive cascade must certify
    >= 95% through coarser levels sized from measured miss distances."""
    from nns_tpu.kernels.cell_list import CellCascade

    q, r = make_dataset(3, 512, 120_000, seed=5, clustered=True)
    cas = CellCascade(r)
    idx, cov = cas.query_with_coverage(q)
    assert_exact(idx, q, r)
    assert cov >= 0.95, f"cascade union coverage {cov} < 0.95"
    assert len(cas.engines) >= 2  # it actually descended


def test_nnengine_promotes_to_cascade_on_clustered():
    """NNEngine(v14) must promote CellListEngine -> CellCascade when the
    single-level certificate misses a batch, and stay exact throughout."""
    from nns_tpu.api import NNEngine
    from nns_tpu.kernels.cell_list import CellCascade

    q, r = make_dataset(3, 256, 120_000, seed=6, clustered=True)
    eng = NNEngine(14).build(r)
    idx1 = eng.query(q)
    assert_exact(idx1, q, r)
    assert isinstance(eng._built, CellCascade)  # promoted after batch 1
    q2 = np.random.default_rng(77).random((256, 3)).astype(np.float32)
    idx2 = eng.query(q2)
    assert_exact(idx2, q2, r)
    _, cov = eng._built.query_with_coverage(q2)
    assert cov >= 0.95
