"""Fused distance + argmin Pallas kernels — the v3..v7 analogs (flagship).

Reference: v3's cudaCallKernel (core.cu:216) computes distances and reduces
them in shared memory in one kernel, so the m x n distance matrix is never
materialized. v4 adds the AoS->SoA transpose (core.cu:293), v5 texture
staging (core.cu:382), v6 constant-memory queries (core.cu:479), v7 the
two-level multi-block reduction (core.cu:573), and v9 the unrolled butterfly
(core.cu:904-963).

TPU design (SURVEY.md §7 B1/B2): one Pallas kernel, grid over
(query tiles x reference tiles). Each step computes a (TM, TN) distance tile
on the VPU by per-dimension broadcast — the exact direct formula, keeping
recall at 1.0 (no expansion error) — reduces it to a per-query
(min, lowest-index argmin), and folds it into a running carry held in the
revisited output block (the last grid axis is innermost on TPU, so the carry
block stays resident in VMEM across all reference tiles of one query tile).
The GPU ladder's memory-space tricks map to BlockSpec choices:

- shared-memory fusion (v3)      -> distance tile lives only in VMEM/registers
- AoS->SoA (v4)                  -> dim-major (k, n) reference BlockSpec
- texture staging (v5)           -> refs kept in HBM, manually double-buffered
                                    DMA into VMEM (nns_fused_streaming)
- constant-memory queries (v6)   -> whole query set resident in VMEM,
                                    grid over reference tiles only
- multi-block two-level (v7)     -> per-tile partial winners + second reduce
- full unroll (v9)               -> the Python-unrolled k-loop (k is static)

Tie-break: lowest reference index (reference scan convention) — within a
tile via masked-iota min, across tiles via strict-< carry update with the
reference-tile index ascending.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nns_tpu.kernels import layouts

_LANE = 128


def stage_inputs(queries, refs):
    """Eagerly move numpy inputs onto the device BEFORE the jitted call:
    a large numpy array fed through the jit argument path costs ~10x an
    explicit transfer on tunneled runtimes (VERDICT round 2 weak #3).
    The single home of this rule — every fallback/dispatch path that could
    see numpy refs stages through here (ADVICE: was four inline copies)."""
    import numpy as _np

    if isinstance(queries, _np.ndarray):
        queries = jnp.asarray(queries, dtype=jnp.float32)
    if isinstance(refs, _np.ndarray):
        refs = jax.device_put(jnp.asarray(refs, dtype=jnp.float32))
    return queries, refs
_SUBLANE = 8


def _interpret() -> bool:
    # Pallas TPU kernels run compiled on TPU; everywhere else (CPU test mesh)
    # use the interpreter.
    return jax.default_backend() != "tpu"


def _pad_to_tiles(queries, refs, tile_m: int, tile_n: int):
    """Pick tile sizes and pad (m, n) to exact tile multiples.

    Pallas fills out-of-range block reads with zeros, and a zero-coordinate
    phantom reference point could win an argmin — so reference points must be
    padded explicitly up to an exact tile multiple (replicas of refs[0],
    which lose every tie-break — see layouts.pad_refs), never left to
    implicit block padding. Queries pad with zeros (rows are independent;
    tails are sliced off).
    """
    m, n = queries.shape[0], refs.shape[0]
    tm = min(tile_m, layouts.round_up(m, _SUBLANE))
    tn = min(tile_n, layouts.round_up(n, _LANE))
    q = layouts.pad_queries(queries, tm)
    r = layouts.pad_refs(refs, tn)
    return q, r, tm, tn


def _tile_argmin(d2: jnp.ndarray, tile_n: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (min, lowest argmin) of a (TM, TN) tile; both (TM, 1)."""
    local_min = jnp.min(d2, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    masked = jnp.where(d2 == local_min, cols, tile_n)
    local_arg = jnp.min(masked, axis=1, keepdims=True)
    return local_min, local_arg


def _dist_tile(q: jnp.ndarray, r_dm: jnp.ndarray, k: int) -> jnp.ndarray:
    """(TM, TN) squared distances from q (TM, k) and dim-major r (k, TN).

    Python-unrolled over the static k (the v9 "full loop expansion" analog);
    identical arithmetic to the f32 oracle scan: sum_d (q_d - r_d)^2.
    """
    tm, tn = q.shape[0], r_dm.shape[1]
    d2 = jnp.zeros((tm, tn), dtype=jnp.float32)
    for d in range(k):
        diff = q[:, d : d + 1] - r_dm[d : d + 1, :]
        d2 = d2 + diff * diff
    return d2


# ---------------------------------------------------------------------------
# v4 analog (flagship): carried argmin, dim-major refs
# ---------------------------------------------------------------------------


def _fused_kernel(q_ref, r_ref, min_ref, idx_ref, *, k: int, tile_n: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_ref[:] = jnp.full(min_ref.shape, jnp.inf, dtype=jnp.float32)
        idx_ref[:] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)

    d2 = _dist_tile(q_ref[:], r_ref[:], k)
    local_min, local_arg = _tile_argmin(d2, tile_n)
    gidx = j * tile_n + local_arg
    better = local_min < min_ref[:]
    idx_ref[:] = jnp.where(better, gidx, idx_ref[:])
    min_ref[:] = jnp.where(better, local_min, min_ref[:])


def prepare_refs(refs, tile_n: int = 2048):
    """One-time reference staging for the prepare-once/query-many path:
    replica-pad n to a tile multiple and transpose to dim-major (k, n_pad)
    (the AoS->SoA transform, done once instead of per query batch — the
    production-serving shape). Returns (r_dm, tn)."""
    n = refs.shape[0]
    tn = min(tile_n, layouts.round_up(n, _LANE))
    r = layouts.pad_refs(jnp.asarray(refs, dtype=jnp.float32), tn)
    return layouts.to_dim_major(r), tn


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def _fused_on_prepared(queries, r_dm, tile_m: int, tile_n: int, interpret: bool):
    """Fused kernel over already-prepared dim-major refs.

    Returns (min_dist2[m] f32, argmin_idx[m] i32) — the (dist, idx) winner
    pair the multi-chip merge needs (v8 analog, core.cu:1025-1030)."""
    m, k = queries.shape
    n_pad = r_dm.shape[1]
    tm = min(tile_m, layouts.round_up(m, _SUBLANE))
    tn = tile_n
    q = layouts.pad_queries(queries, tm)
    m_pad = q.shape[0]
    grid = (pl.cdiv(m_pad, tm), pl.cdiv(n_pad, tn))

    min_out, idx_out = pl.pallas_call(
        functools.partial(_fused_kernel, k=k, tile_n=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(q, r_dm)
    return min_out[:m, 0], idx_out[:m, 0]


def _fused_call_min_idx(queries, refs, tile_m: int, tile_n: int, interpret: bool):
    r_dm, tn = prepare_refs(refs, tile_n)
    return _fused_on_prepared(queries, r_dm, tile_m, tn, interpret)


def nns_fused(queries, refs, tile_m: int = 256, tile_n: int = 4096):
    """v4 analog and flagship single-chip path: fused distance+argmin,
    dim-major refs, running carry in VMEM."""
    return _fused_call_min_idx(queries, refs, tile_m, tile_n, _interpret())[1]


def fused_fallback(queries, refs) -> "jnp.ndarray":
    """Exact full-scan fallback for certificate/traversal failures: pads the
    query count to a power-of-two bucket so repeated fallbacks with varying
    batch sizes reuse compiled kernels instead of recompiling per shape.
    Refs are explicitly device_put first — feeding a large numpy array
    through the jit argument path costs ~10x a plain transfer on tunneled
    runtimes (measured ~1 s vs ~90 ms for a 12 MB reference set)."""
    import numpy as np

    q = np.asarray(queries, dtype=np.float32)
    m = q.shape[0]
    bucket = layouts.pow2_at_least(max(m, 8))
    if bucket != m:
        q = np.pad(q, ((0, bucket - m), (0, 0)))
    if isinstance(refs, np.ndarray):
        refs = jax.device_put(jnp.asarray(refs))
    return nns_fused(q, refs)[:m]


class FusedBruteForce:
    """Prepare-once / query-many engine over the flagship fused kernel —
    the serving shape: the reference set is staged (padded, dim-major, on
    device) a single time; each query batch runs only the kernel."""

    def __init__(self, refs, tile_m: int = 256, tile_n: int = 4096):
        self.n = refs.shape[0]
        self.tile_m = tile_m
        self.r_dm, self.tile_n = prepare_refs(refs, tile_n)
        self.r_dm = jax.device_put(self.r_dm)
        jax.block_until_ready(self.r_dm)

    def query_min_idx(self, queries):
        q = jnp.asarray(queries, dtype=jnp.float32)
        return _fused_on_prepared(q, self.r_dm, self.tile_m, self.tile_n, _interpret())

    def query(self, queries):
        return self.query_min_idx(queries)[1]


# ---------------------------------------------------------------------------
# v3 analog: point-major refs (pre-SoA layout)
# ---------------------------------------------------------------------------


def _fused_pm_kernel(q_ref, r_ref, min_ref, idx_ref, *, k: int, tile_n: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_ref[:] = jnp.full(min_ref.shape, jnp.inf, dtype=jnp.float32)
        idx_ref[:] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)

    # r_ref is point-major (TN, k) — deliberately the less efficient layout,
    # as in the reference's pre-v4 versions that read r_points[idn * k + idk]
    # uncoalesced (core.cu:66). q_ref arrives dim-major (k, TM), transposed
    # once by XLA outside the kernel (an in-kernel transpose is a Mosaic
    # relayout with pathological compile time); the distance tile is built
    # transposed (TN, TM) and reduced over sublanes.
    tm = q_ref.shape[1]
    qt = q_ref[:]  # (k, TM)
    d2t = jnp.zeros((r_ref.shape[0], tm), dtype=jnp.float32)
    for d in range(k):
        diff = r_ref[:, d : d + 1] - qt[d : d + 1, :]
        d2t = d2t + diff * diff
    local_min = jnp.min(d2t, axis=0, keepdims=True)  # (1, TM)
    rows = jax.lax.broadcasted_iota(jnp.int32, d2t.shape, 0)
    local_arg = jnp.min(jnp.where(d2t == local_min, rows, tile_n), axis=0, keepdims=True)
    gidx = j * tile_n + local_arg
    better = local_min < min_ref[:]
    idx_ref[:] = jnp.where(better, gidx, idx_ref[:])
    min_ref[:] = jnp.where(better, local_min, min_ref[:])


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def _fused_pm_call(queries, refs, tile_m: int, tile_n: int, interpret: bool):
    m, k = queries.shape
    # Output blocks here are (1, tm): when several query tiles exist, tm is
    # a lane dimension and must be a multiple of 128 on real TPUs.
    if layouts.round_up(m, _SUBLANE) > tile_m and tile_m % _LANE:
        tile_m = layouts.round_up(tile_m, _LANE)
    q, r, tm, tn = _pad_to_tiles(queries, refs, tile_m, tile_n)
    m_pad, n_pad = q.shape[0], r.shape[0]
    grid = (pl.cdiv(m_pad, tm), pl.cdiv(n_pad, tn))

    _, idx_out = pl.pallas_call(
        functools.partial(_fused_pm_kernel, k=k, tile_n=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ),
        interpret=interpret,
    )(layouts.to_dim_major(q), r)
    return idx_out[0, :m]


def nns_fused_point_major(queries, refs, tile_m: int = 256, tile_n: int = 1024):
    """v3 analog: fused kernel with point-major reference tiles."""
    queries, refs = stage_inputs(queries, refs)
    return _fused_pm_call(queries, refs, tile_m, tile_n, _interpret())


# ---------------------------------------------------------------------------
# v6 analog: whole query set resident in VMEM (constant-memory analog)
# ---------------------------------------------------------------------------


def _fused_qres_kernel(q_ref, r_ref, min_ref, idx_ref, *, k: int, tile_n: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        min_ref[:] = jnp.full(min_ref.shape, jnp.inf, dtype=jnp.float32)
        idx_ref[:] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)

    d2 = _dist_tile(q_ref[:], r_ref[:], k)
    local_min, local_arg = _tile_argmin(d2, tile_n)
    gidx = j * tile_n + local_arg
    better = local_min < min_ref[:]
    idx_ref[:] = jnp.where(better, gidx, idx_ref[:])
    min_ref[:] = jnp.where(better, local_min, min_ref[:])


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _fused_qres_call(queries, refs, tile_n: int, interpret: bool):
    m, k = queries.shape
    q, r, _, tn = _pad_to_tiles(queries, refs, layouts.round_up(queries.shape[0], _SUBLANE), tile_n)
    m_pad, n_pad = q.shape[0], r.shape[0]
    r_dm = layouts.to_dim_major(r)

    _, idx_out = pl.pallas_call(
        functools.partial(_fused_qres_kernel, k=k, tile_n=tn),
        grid=(pl.cdiv(n_pad, tn),),
        in_specs=[
            # The whole (padded) query set stays resident across the grid —
            # the 64 KB __constant__ buffer analog (core.cu:481), except VMEM
            # is ~16 MB, so the budget check lives in the dispatcher.
            pl.BlockSpec((m_pad, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m_pad, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(q, r_dm)
    return idx_out[:m, 0]


def nns_fused_queries_resident(queries, refs, tile_n: int = 512, max_query_bytes: int = 4 << 20):
    """v6 analog: queries pinned whole in VMEM; falls back to the flagship
    when they exceed the budget (reference fallback: core.cu:546-550)."""
    m, k = queries.shape
    queries, refs = stage_inputs(queries, refs)
    if m * max(k, 1) * 4 > max_query_bytes:
        return nns_fused(queries, refs)
    return _fused_qres_call(queries, refs, tile_n, _interpret())


# ---------------------------------------------------------------------------
# v5 analog: refs streamed from HBM with manual double-buffered DMA
# ---------------------------------------------------------------------------


def _fused_stream_kernel(q_ref, r_hbm, min_ref, idx_ref, *, k: int, tile_n: int, n_tiles: int):
    # q_ref: (TM, k) VMEM; r_hbm: (k, n_pad) in HBM/ANY — DMA'd tile by tile.
    def body(scratch, sem):
        def get_dma(slot, t):
            return pltpu.make_async_copy(
                r_hbm.at[:, pl.ds(t * tile_n, tile_n)], scratch.at[slot], sem.at[slot]
            )

        get_dma(0, 0).start()

        def loop(t, carry):
            cur_min, cur_idx = carry
            slot, nxt = t % 2, (t + 1) % 2

            @pl.when(t + 1 < n_tiles)
            def _():
                get_dma(nxt, t + 1).start()

            get_dma(slot, t).wait()
            d2 = _dist_tile(q_ref[:], scratch[slot], k)
            local_min, local_arg = _tile_argmin(d2, tile_n)
            gidx = t * tile_n + local_arg
            better = local_min < cur_min
            return (
                jnp.where(better, local_min, cur_min),
                jnp.where(better, gidx, cur_idx),
            )

        init = (
            jnp.full(min_ref.shape, jnp.inf, dtype=jnp.float32),
            jnp.zeros(idx_ref.shape, dtype=jnp.int32),
        )
        fmin, fidx = jax.lax.fori_loop(0, n_tiles, loop, init)
        min_ref[:] = fmin
        idx_ref[:] = fidx

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, k, tile_n), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def _fused_stream_call(queries, refs, tile_m: int, tile_n: int, interpret: bool):
    m, k = queries.shape
    # Manual HBM->VMEM DMA slices the dim-major (k, n) array along k, and
    # Mosaic requires that leading-axis slice aligned to the memref tiling —
    # zero-pad k to the sublane width (distances unchanged: zero coordinates
    # added to BOTH queries and refs).
    queries = layouts.pad_dims(queries, _SUBLANE)
    refs = layouts.pad_dims(refs, _SUBLANE)
    k = queries.shape[1]
    q, r, tm, tile_n = _pad_to_tiles(queries, refs, tile_m, tile_n)
    m_pad, n_pad = q.shape[0], r.shape[0]
    n_tiles = n_pad // tile_n
    r_dm = layouts.to_dim_major(r)

    _, idx_out = pl.pallas_call(
        functools.partial(_fused_stream_kernel, k=k, tile_n=tile_n, n_tiles=n_tiles),
        grid=(pl.cdiv(m_pad, tm),),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # refs stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(q, r_dm)
    return idx_out[:m, 0]


def nns_fused_streaming(queries, refs, tile_m: int = 256, tile_n: int = 2048):
    """v5 analog: reference set stays in HBM; the kernel double-buffers
    DMA of reference tiles into VMEM (texture-staging analog)."""
    queries, refs = stage_inputs(queries, refs)
    return _fused_stream_call(queries, refs, tile_m, tile_n, _interpret())


# ---------------------------------------------------------------------------
# v7 analog: two-level reduction (per-tile partial winners + second reduce)
# ---------------------------------------------------------------------------


def _partial_kernel(q_ref, r_ref, min_ref, idx_ref, *, k: int, tile_n: int):
    # Outputs are (n_tiles, m_pad, 1): one (1, TM, 1) winner block per
    # (query tile, ref tile) — no carry, every tile emits its candidate
    # (the v7 "every block writes its winner" structure, core.cu:640-652).
    j = pl.program_id(1)
    d2 = _dist_tile(q_ref[:], r_ref[:], k)
    local_min, local_arg = _tile_argmin(d2, tile_n)
    min_ref[0] = local_min
    idx_ref[0] = j * tile_n + local_arg


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def _two_level_call(queries, refs, tile_m: int, tile_n: int, interpret: bool):
    m, k = queries.shape
    q, r, tm, tn = _pad_to_tiles(queries, refs, tile_m, tile_n)
    m_pad, n_pad = q.shape[0], r.shape[0]
    n_tiles = pl.cdiv(n_pad, tn)
    r_dm = layouts.to_dim_major(r)

    part_min, part_idx = pl.pallas_call(
        functools.partial(_partial_kernel, k=k, tile_n=tn),
        grid=(pl.cdiv(m_pad, tm), n_tiles),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, 1), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 1), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, m_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(q, r_dm)

    # Second-level reduction over the per-tile winners. XLA argmin picks the
    # lowest tile on ties; within a tile the partial already took the lowest
    # index — together the global lowest-index convention. The reference's
    # second level was a host-side rescan (core.cu:676-696, with the §2.1.2
    # row bug); ours stays on device.
    pm = part_min[:, :, 0]  # (n_tiles, m_pad)
    pi = part_idx[:, :, 0]
    win = jnp.argmin(pm, axis=0)
    idx = jnp.take_along_axis(pi, win[None, :], axis=0)[0]
    return idx[:m]


def nns_two_level(queries, refs, tile_m: int = 256, tile_n: int = 2048):
    """v7 analog: partial per-tile winners, then an on-device second reduce."""
    queries, refs = stage_inputs(queries, refs)
    return _two_level_call(queries, refs, tile_m, tile_n, _interpret())
