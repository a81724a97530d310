"""KD-tree tests (v10/v11 analogs): build invariants, exactness vs the f64
oracle, host/device agreement, persistence (SURVEY.md §4 items 3-4)."""

import numpy as np
import pytest

from conftest import assert_exact
from nns_tpu.data import make_dataset
from nns_tpu.trees.kdtree import KDTree, nns_kdtree_host
from nns_tpu.trees.kdtree_device import nns_kdtree_device


def test_build_invariants():
    q, r = make_dataset(k=3, m=1, n=1000, seed=2)
    tree = KDTree.build(r)
    np_, nd = tree.node_point, tree.node_dim
    # Every reference point appears exactly once in the heap.
    stored = np_[np_ >= 0]
    assert sorted(stored.tolist()) == list(range(1000))
    # Median property: left subtree <= node value, right subtree >= node
    # value along the split dim, for every internal node.
    def collect(rt):
        if rt >= len(np_) or np_[rt] < 0:
            return []
        return [np_[rt]] + collect(2 * rt) + collect(2 * rt + 1)

    def check(rt):
        if rt >= len(np_) or np_[rt] < 0:
            return
        d, v = nd[rt], r[np_[rt], nd[rt]]
        left, right = collect(2 * rt), collect(2 * rt + 1)
        assert all(r[i, d] <= v + 1e-7 for i in left), f"node {rt}"
        assert all(r[i, d] >= v - 1e-7 for i in right), f"node {rt}"
        check(2 * rt)
        check(2 * rt + 1)

    check(1)


@pytest.mark.parametrize("k,m,n", [(3, 1, 1024), (3, 200, 4096), (16, 64, 2048), (2, 50, 333)])
def test_kdtree_host_exact(k, m, n):
    q, r = make_dataset(k, m, n, seed=1000)
    assert_exact(nns_kdtree_host(q, r), q, r)


@pytest.mark.parametrize("k,m,n", [(3, 1, 1024), (3, 200, 4096), (16, 64, 2048)])
def test_kdtree_device_exact(k, m, n):
    q, r = make_dataset(k, m, n, seed=1000)
    assert_exact(nns_kdtree_device(q, r), q, r)


def test_kdtree_clustered_data():
    q, r = make_dataset(3, 128, 8192, seed=4, clustered=True)
    assert_exact(nns_kdtree_host(q, r), q, r)
    assert_exact(nns_kdtree_device(q, r), q, r)


def test_kdtree_duplicate_points():
    rng = np.random.default_rng(0)
    r = np.repeat(rng.random((64, 3), dtype=np.float32), 4, axis=0)
    q = rng.random((32, 3), dtype=np.float32).astype(np.float32)
    assert_exact(nns_kdtree_host(q, r), q, r)
    assert_exact(nns_kdtree_device(q, r), q, r)


def test_kdtree_k_fallback():
    # k > 16 falls back to the linear scan (core.cu:1148-1149 contract).
    q, r = make_dataset(20, 16, 512, seed=6)
    assert_exact(nns_kdtree_host(q, r), q, r)
    assert_exact(nns_kdtree_device(q, r), q, r)


def test_kdtree_save_load(tmp_path):
    q, r = make_dataset(3, 32, 1024, seed=8)
    tree = KDTree.build(r)
    path = str(tmp_path / "kd.npz")
    tree.save(path)
    loaded = KDTree.load(path)
    np.testing.assert_array_equal(tree.query_host(q), loaded.query_host(q))


def test_kdtree_tiny():
    r = np.array([[0.5, 0.5, 0.5]], dtype=np.float32)
    q = np.array([[0.1, 0.9, 0.3]], dtype=np.float32)
    assert nns_kdtree_host(q, r)[0] == 0
    assert nns_kdtree_device(q, r)[0] == 0


def test_kdtree_device_tiny_beam_fallback_exact():
    # A beam of 1 bucket leaves most queries uncertified; results must stay
    # exact via the wider-retry / brute-force fallback chain.
    from nns_tpu.trees.kdtree import KDTree
    from nns_tpu.trees.kdtree_device import kd_query_device

    q, r = make_dataset(3, 32, 2048, seed=11)
    tree = KDTree.build(r)
    idx = kd_query_device(tree, q, beam=1)
    assert_exact(idx, q, r)


def test_beam_staged_chunked_drain():
    # The serving drain: a query set wider than one chunk must run as ONE
    # device program (lax.map over staged chunks — per-chunk dispatches
    # cost ~1 ms of non-overlapping tunnel time EACH), with certified rows
    # matching the oracle and query_exact unconditionally exact.
    q, r = make_dataset(3, 2500, 20000, seed=8)
    bi = KDTree.build(r).device_index()
    st = bi.stage_queries(q)
    assert st.q_dev.shape[0] > 1  # genuinely multi-chunk
    idx, ok = bi.query_staged_with_flags(st)
    assert ok.mean() > 0.9
    d_got = ((q.astype(np.float64) - r[idx].astype(np.float64)) ** 2).sum(1)
    d_true = (
        (q[:, None, :].astype(np.float64) - r[None].astype(np.float64)) ** 2
    ).sum(-1).min(1)
    assert (d_got[ok] == d_true[ok]).all()  # certified rows are true NNs
    # The one-dispatch form agrees with the unstaged public surface.
    idx2, ok2 = bi.query_with_flags(q)
    np.testing.assert_array_equal(idx, idx2)
    np.testing.assert_array_equal(ok, ok2)
    assert_exact(bi.query_exact(q), q, r)


def test_kdtree_beam_certificate_coverage():
    # On uniform data the default beam should certify nearly every query
    # (the perf contract: fallback scans must be the rare path).
    from nns_tpu.trees.kdtree import KDTree

    q, r = make_dataset(3, 256, 65536, seed=12)
    tree = KDTree.build(r)
    idx, ok = tree.device_index().query_with_flags(q, beam=8)
    assert ok.mean() >= 0.95
    assert_exact(tree.device_index().query_exact(q), q, r)
