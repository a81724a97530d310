"""Supercell (cell-list) engine — exact low-dim NN the TPU-idiomatic way.

This is the framework's answer to SURVEY.md §7's hard part #1 ("batched tree
traversal on a vector machine — control-flow divergence is the enemy"): make
the spatial index *dense* instead of traversed. The reference's tree ladder
(v10-v13) prunes per query with divergent control flow; on a TPU the winning
shape is:

Build (host, vectorized):
  - partition the bounding box into D^3 equal supercells (D ~ (n/2000)^(1/3));
  - for every supercell, precompute its HALO point set — all reference
    points within ``halo`` distance of the supercell box (each point lands
    in <= 8 halo sets) — stored as one dense (G, R_max, k) tensor padded
    with distance sentinels, plus their global ids. Query-independent, so
    the runtime needs NO gathers at all.

Query:
  - bucket queries by supercell and scatter into a dense (G, Q_max, k)
    tensor — on the HOST (10^4 rows of numpy indexing; XLA scatters of this
    shape are a compile tarpit);
  - one Pallas kernel, grid (G, R tiles): per supercell a dense fused
    direct-distance scan of its query block against its halo block with a
    carried (min, argpos) — the single-chip fused kernel (pallas_fused)
    batched over supercells. ~n*(W+2*halo)^3/W^3/D^3 candidates per query
    instead of n;
  - unscatter + halo_ids lookup on host. Exactness certificate: a result is
    proven exact iff best_dist <= halo (every unscanned point is farther
    than ``halo``); queries failing it (probability e^-30-ish on uniform
    data; possible on adversarial data) fall back to the exact full scan.

~150x less distance work than brute force at 1M refs (uniform), turning
the 1M x 10K benchmark from ~36 ms to the low-ms regime.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nns_tpu.kernels.layouts import PAD_SENTINEL, pow2_at_least as _pow2_at_least
from nns_tpu.kernels.pallas_fused import _interpret


_TR = 8192  # halo points per kernel step (R_max is tiled when larger)
_GB = 14    # max supercells per grid step (amortizes per-step fixed costs)


def _cell_kernel(h2_ref, q_ref, h_ref, id_ref, min_ref, gid_ref, scratch,
                 *, gb: int):
    """GB supercells x one halo tile: fused direct distance + carried
    (min, GLOBAL id).

    q_ref: (GB, QM, 3) queries; h_ref: (GB, 3, TR) dim-major halo points;
    id_ref: (GB, 1, TR) global reference ids of the halo slots; outputs
    (GB, QM, 1) carried (min, id) per supercell. Rank 3 is deliberate:
    rank-2 (GB, QM) output blocks slowed the kernel itself 0.25 -> 0.33
    ms/batch on v5e (narrow lane-16 stores), and any device-side squeeze
    of the trailing singleton lowers to a relayouting XLA `reduce` at
    0.086 ms/batch — so the queue drain returns this shape as-is and the
    HOST flattens after the fetch (free in numpy). Ids are resolved IN the
    kernel by a one-hot min over the ids block: the tile-position argmin +
    host-side halo_ids row-gather it replaces cost more than the whole scan
    (XLA row gathers run ~30 ns/row on v5e).

    The GB distance tiles are written into ONE (GB*QM, TR) VMEM scratch and
    reduced in a single pass: per-group (QM, TR) reductions leave most
    sublanes idle at QM=16 and pay per-group instruction overhead — the
    stacked pass measured 3.3x faster end-to-end on v5e (round 3, 9.5 ms ->
    2.9 ms per 32x10K-query drain; checksum-identical)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_ref[:] = jnp.full(min_ref.shape, jnp.inf, dtype=jnp.float32)
        gid_ref[:] = jnp.zeros(gid_ref.shape, dtype=jnp.int32)

    qm = q_ref.shape[1]
    tr = h_ref.shape[2]
    for g in range(gb):
        q = q_ref[g]    # (QM, 3)
        h = h_ref[g]    # (3, TR)
        d2 = jnp.zeros((qm, tr), dtype=jnp.float32)
        for d in range(3):
            diff = q[:, d : d + 1] - h[d : d + 1, :]
            d2 = d2 + diff * diff
        scratch[g * qm:(g + 1) * qm, :] = d2
    s3 = scratch[:, :].reshape(gb, qm, tr)
    ids_all = id_ref[:, 0, :]                       # (GB, TR)
    # Tie-break note: among exactly-tied neighbors the smallest global id
    # in this tile wins and earlier tiles beat later ones — exact, but not
    # always the lowest reference index overall (that stronger guarantee
    # belongs to the brute-force family).
    lm3 = jnp.min(s3, axis=2, keepdims=True)        # (GB, QM, 1)
    masked = jnp.where(s3 == lm3, ids_all[:, None, :], jnp.int32(1 << 30))
    local_gid = jnp.min(masked, axis=2)             # (GB, QM)
    lm = lm3[:, :, 0]
    better = lm < min_ref[:, :, 0]
    gid_ref[:, :, 0] = jnp.where(better, local_gid, gid_ref[:, :, 0])
    min_ref[:, :, 0] = jnp.where(better, lm, min_ref[:, :, 0])

    # Final tile: fold the exactness certificate into the id's sign bit
    # (id when best <= halo^2, -id-1 otherwise) so consumers need no
    # further per-slot XLA epilogue (the where/compare on (G, QM) blocks
    # measured ~0.26 ms/batch of drain time in round 3).
    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        sg = gid_ref[:, :, 0]
        certified = min_ref[:, :, 0] <= h2_ref[0, 0]
        gid_ref[:, :, 0] = jnp.where(certified, sg, -sg - 1)


def _cell_scan(dense_q, halo_dm, halo_ids, halo2, interpret: bool,
               group_batch: int | None = None):
    """dense_q: (G_total, QM, 3); halo_dm: (G, 3, R_max); halo_ids:
    (G, R_max); halo2: scalar certificate radius^2. Returns per-slot
    (min_d (G_total, QM, 1), SIGNED global id (G_total, QM, 1) — the
    certificate rides the sign bit: id when min_d <= halo2, -id-1
    otherwise). G_total may be W*G for W stacked query batches — the halo
    block index then wraps so every batch scans the same index."""
    g_total, qm, _ = dense_q.shape
    h2 = jnp.asarray(halo2, jnp.float32).reshape(1, 1)
    halo_groups = halo_dm.shape[0]
    r_max = halo_dm.shape[2]
    # Bound the (QM, TR) distance tile to ~1M f32 elements of VMEM. tr must
    # BOTH divide R_max (the grid is r_max // tr steps) AND stay a multiple
    # of 128 (Mosaic lane alignment for interior blocks — plain halving of
    # the 256-rounded R_max can land on 64*odd, e.g. 2304 -> 576; the CPU
    # interpreter accepts that, real v5e Mosaic does not). Pick the largest
    # qualifying divisor under the cap; 128 and 256 always qualify because
    # R_max % 256 == 0, and q_max <= 2048 keeps qm*256 within the VMEM cap.
    cap = min(_TR, (1 << 20) // max(qm, 1))
    lane_divisors = [d for d in range(128, r_max + 1, 128) if r_max % d == 0]
    tr = max((d for d in lane_divisors if d <= cap), default=lane_divisors[0])
    if group_batch:
        gb = group_batch
        if g_total % gb or halo_groups % gb:
            gb = 1
    else:
        # Largest common divisor of both group counts <= _GB: the round-3
        # gb sweep (real v5e, W=64 drain profiles) measured kernels at
        # 15.0 ms for gb=14 vs 15.8 for 8, 19.6 for 28, 21.9 for 56 — and
        # a fixed gb=8 silently collapsed to gb=1 for any odd D (D^3 odd),
        # a large per-step-overhead cliff this divisor scan removes.
        g = math.gcd(g_total, halo_groups)
        gb = max(d for d in range(1, min(_GB, g) + 1) if g % d == 0)
    # The stacked (GB*QM, TR) reduction scratch must fit VMEM alongside the
    # kernel's own (GB*QM, TR)-shaped temporaries (s3 plus the one-hot id
    # mask — real-TPU scoped-vmem accounting charges ~3x the scratch):
    # halve GB while the scratch exceeds ~1M f32 (4 MB). Ground truth: a
    # skewed (512, 1024, 3) ragged batch at gb=2/tr=640 under the old 2M
    # bound was REJECTED on v5e ("scoped allocation 16.28M > 16.00M
    # scoped vmem limit"); gb=1 runs. The tr cap above guarantees
    # qm * tr <= 1M, so gb=1 always fits. Flagship shapes (QM=16,
    # TR<=1280, GB=14) are ~287K f32 — unaffected.
    while gb > 1 and gb * qm * tr > (1 << 20):
        gb //= 2
        while g_total % gb or halo_groups % gb:
            gb //= 2
            if gb == 0:
                gb = 1
                break
    hg = halo_groups // gb
    if g_total == halo_groups:
        h_index = lambda g, j: (g, 0, j)  # noqa: E731
    else:
        h_index = lambda g, j: (g % hg, 0, j)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_cell_kernel, gb=gb),
        grid=(g_total // gb, r_max // tr),
        in_specs=[
            pl.BlockSpec((1, 1), lambda g, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((gb, qm, 3), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 3, tr), h_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 1, tr), h_index, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((gb, qm, 1), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, qm, 1), lambda g, j: (g, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g_total, qm, 1), jnp.float32),
            jax.ShapeDtypeStruct((g_total, qm, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((gb * qm, tr), jnp.float32)],
        interpret=interpret,
    )(h2, dense_q, halo_dm, halo_ids[:, None, :])


def _query_body(packed_in, halo_dm, halo_ids, halo2,
                q_max: int, g_total: int, interpret: bool,
                group_batch: int | None):
    """One batch: packed (m, 5) f32 [qx, qy, qz, sid, pos] -> scatter into
    the dense per-supercell tensor, scan kernel, unscatter -> (4, m)."""
    q_sorted = packed_in[:, :3]
    sid_s = packed_in[:, 3].astype(jnp.int32)   # exact for values < 2^24
    pos = packed_in[:, 4].astype(jnp.int32)
    dense_q = jnp.zeros((g_total, q_max, 3), jnp.float32).at[sid_s, pos].set(q_sorted)
    dmin, sgid = _cell_scan(dense_q, halo_dm, halo_ids, halo2, interpret, group_batch)
    d2 = dmin[sid_s, pos, 0]
    sg = sgid[sid_s, pos, 0]
    # Certificate soundness, including queries OUTSIDE the data bounding box
    # (their cell index is clipped): every unscanned point B has per-dim
    # gap_d to the query's cell box with sum(gap_d^2) > halo^2, and for each
    # dim |B_d - q_d| >= gap_d — for in-box dims because q lies within its
    # cell's range, for clipped dims because the clipped cell touches the
    # violated boundary and B cannot lie beyond it. So dist(B, q) > halo,
    # and best <= halo proves exactness. The kernel folded this compare
    # into the id's sign bit.
    ok = sg >= 0
    idx = jnp.where(ok, sg, -sg - 1)
    # Packed f32 result: [idx_hi, idx_lo, ok, best_d2]. Ids travel as two
    # exactly-representable float columns (hi/lo 12-bit split, each < 2^23,
    # sound for n < 2^35 — in practice HBM-bound long before that); a plain
    # astype corrupts ids >= 2^24 and a bitcast makes small ids denormal
    # (TPU flushes them to zero in transit). Same scheme as the top-k path.
    # best_d2 is the kernel's f32 min over the halo candidates: it tracks
    # the true NN distance only to f32 rounding (~1 ulp can land BELOW the
    # f64 truth), and is inf when the halo set was empty — adaptive
    # consumers size structures from it, widening by that band if they
    # need a sound upper bound.
    idx_hi = (idx >> 12).astype(jnp.float32)
    idx_lo = (idx & 0xFFF).astype(jnp.float32)
    return jnp.stack([idx_hi, idx_lo, ok.astype(jnp.float32), d2])


@functools.partial(jax.jit, static_argnames=("q_max", "g_total", "interpret", "group_batch"))
def _device_query(packed_in, halo_dm, halo_ids, halo2,
                  q_max: int, g_total: int, interpret: bool,
                  group_batch: int | None = None):
    """Fused device path for ONE batch: a single host round-trip each way
    (remote-tunneled runtimes charge ~10 ms per in-stream upload and ~35 ms
    per result fetch)."""
    return _query_body(packed_in, halo_dm, halo_ids, halo2,
                       q_max, g_total, interpret, group_batch)


@functools.partial(jax.jit, static_argnames=("interpret", "group_batch"))
def _device_query_queue(dstack, halo_dm, halo_ids, halo2,
                        interpret: bool, group_batch: int | None = None):
    """W staged batches in ONE dispatch: dstack (W, G, QM, 3) dense query
    tensors built on the HOST at staging time -> (W, G, QM, 1) i32, the
    DENSE per-slot winners with the certificate in the sign bit (id when
    the <= halo certificate holds, -id-1 when it fails; ids < 2^30 by the
    build-time n limit). Dispatch overhead through a remote tunnel is ~1 ms
    regardless of program size (measured: the scan kernel alone runs
    0.45 ms but a chained single-batch dispatch never beats ~2 ms), so a
    serving queue drains W accumulated batches per program. The device does
    ONLY the scans: the per-batch winner unscatter is 10K numpy rows on the
    host after the fetch (round-3 measurement: the former on-device
    concatenate + packed gather cost ~0.6 ms/batch — more than the scan
    itself — while the dense i32 result only grows the fetch by ~56 KB).
    The body is UNROLLED: a lax.scan formulation re-stages the
    loop-invariant halo tensors per iteration and measured ~15% slower."""
    rows = _drain_rows((dstack[w] for w in range(dstack.shape[0])),
                       halo_dm, halo_ids, halo2, interpret, group_batch)
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("interpret", "group_batch"))
def _device_query_queue_seq(ds_seq, halo_dm, halo_ids, halo2,
                            interpret: bool, group_batch: int | None = None):
    """Tuple-form queue drain: W separate (G, QM, 3) device arrays in, W
    separate (G, QM, 1) i32 winner tables out, still ONE device program. Skipping
    the per-batch dstack[w] dynamic-slice (a relayout copy) and the final
    W-way stack measured 0.67 -> 0.57 ms/batch at W=160 on the real chip —
    the headline bench path. The stacked form stays for consumers that
    download the whole result (one array = one tunnel fetch)."""
    return tuple(_drain_rows(ds_seq, halo_dm, halo_ids, halo2,
                             interpret, group_batch))


def _drain_rows(ds_iter, halo_dm, halo_ids, halo2, interpret, group_batch):
    """Shared drain body: one scan per batch, winner table returned in the
    kernel's native (G, QM, 1) shape — the single place the queue output
    layout lives. No device-side squeeze/flatten: XLA lowers either into a
    relayouting `reduce` (0.086 ms/batch measured on v5e, 24% of the whole
    drain); consumers flatten on the HOST after the fetch instead
    (unscatter_queue reshapes its input, a numpy view)."""
    rows = []
    for d in ds_iter:
        _, sgid = _cell_scan(d, halo_dm, halo_ids, halo2,
                             interpret, group_batch)
        rows.append(sgid)
    return rows


@functools.partial(jax.jit, static_argnames=("k_nn", "q_max", "g_total", "interpret"))
def _device_query_topk(packed_in, halo_dm, halo_ids, halo2,
                       k_nn: int, q_max: int, g_total: int, interpret: bool):
    """Exact k-NN over the dense halo sets (XLA path: per-group distance
    blocks + lax.top_k, chunked over groups to bound memory). Returns one
    packed (m, 2*k_nn + 1) f32 array: [dists, ids, certificate] — the
    certificate holds iff the k-th distance is within halo (then no
    unscanned point can belong to the true top-k, modulo exact ties)."""
    del interpret  # XLA-only path
    q_sorted = packed_in[:, :3]
    sid_s = packed_in[:, 3].astype(jnp.int32)
    pos = packed_in[:, 4].astype(jnp.int32)
    r_max = halo_dm.shape[2]
    dense_q = jnp.zeros((g_total, q_max, 3), jnp.float32).at[sid_s, pos].set(q_sorted)

    # Bound the per-chunk distance block (gc, q_max, r_max) to ~16M f32
    # (the 1-NN scan kernel bounds its tile the same way).
    gc = max(1, min(64, (16 << 20) // max(q_max * r_max, 1)))
    g_pad = -(-g_total // gc) * gc
    dq = jnp.pad(dense_q, ((0, g_pad - g_total), (0, 0), (0, 0)))
    hd = jnp.pad(halo_dm, ((0, g_pad - g_total), (0, 0), (0, 0)),
                 constant_values=PAD_SENTINEL)

    kk = min(k_nn, r_max)

    def chunk(c):
        qs = jax.lax.dynamic_slice_in_dim(dq, c * gc, gc, axis=0)   # (gc, QM, 3)
        hs = jax.lax.dynamic_slice_in_dim(hd, c * gc, gc, axis=0)   # (gc, 3, R)
        d2 = jnp.zeros((gc, q_max, r_max), jnp.float32)
        for d in range(3):
            d2 = d2 + (qs[:, :, d : d + 1] - hs[:, d : d + 1, :]) ** 2
        nd, pi = jax.lax.top_k(-d2.reshape(gc * q_max, r_max), kk)
        return -nd, pi  # ascending distances + halo-slot positions

    kd, kp = jax.lax.map(chunk, jnp.arange(g_pad // gc))
    kd = kd.reshape(g_pad, q_max, kk)[:g_total]
    kp = kp.reshape(g_pad, q_max, kk)[:g_total]

    qd = kd[sid_s, pos]                                   # (m, kk)
    qpos = kp[sid_s, pos]
    qid = halo_ids[sid_s[:, None], qpos]                  # (m, kk) gather
    ok = qd[:, -1] <= halo2
    if kk < k_nn:  # fewer halo slots than requested neighbors
        qd = jnp.pad(qd, ((0, 0), (0, k_nn - kk)), constant_values=jnp.inf)
        qid = jnp.pad(qid, ((0, 0), (0, k_nn - kk)))
        ok = jnp.zeros_like(ok)
    # Ids travel as two exactly-representable float columns (hi/lo 12-bit
    # split, each < 2^23). A plain astype corrupts ids >= 2^24, and a
    # bitcast makes small ids DENORMAL floats, which the TPU flushes to
    # zero in transit — both fail silently.
    qid_hi = (qid >> 12).astype(jnp.float32)
    qid_lo = (qid & 0xFFF).astype(jnp.float32)
    return jnp.concatenate(
        [qd, qid_hi, qid_lo, ok[:, None].astype(jnp.float32)], axis=1
    )


class CellListEngine:
    """Prepare-once/query-many exact NN for k <= 3-ish low dims (k == 3 here,
    matching the octree family's domain; other k route to the fused kernel)."""

    # query_queue staging form: True = ragged per-batch q_max through the
    # canonical tier/chunk drain (both the single-chip engine and, since
    # round 4, ShardedCellEngine — its query_queue_staged stacks each
    # same-shape chunk into one mesh-wide program). False keeps shared-QM
    # stacked staging; no in-tree engine uses it, but the stacked
    # query_queue_staged form remains public API.
    _ragged_queue_drain = True

    def __init__(self, refs: np.ndarray, d_per_dim: int | None = None,
                 halo: float | None = None, max_candidates: int = 200_000,
                 device_place: bool = True):
        refs = np.ascontiguousarray(refs, dtype=np.float32)
        n, k = refs.shape
        if k != 3:
            raise ValueError("CellListEngine requires 3-D points")
        if n >= 1 << 30:
            # Result ids travel as hi/lo 12-bit f32 pairs (exact transit up
            # to 2^35) and as i32 in-kernel with a 2^30 tie mask, so the
            # true ceiling is 2^30 — HBM bounds n long before that. (Round 2
            # capped n at 2^24 via whole-id f32 transit; lifted per VERDICT
            # item 7.)
            raise ValueError("CellListEngine supports n < 2^30 per device")
        self.refs = refs
        self.n = n

        mn = refs.min(axis=0)
        mx = refs.max(axis=0)
        extent = np.maximum(mx - mn, 1e-6)
        if d_per_dim is None:
            # ~350 points per supercell measured fastest on v5e (D=14 at
            # n=1M: 2.6 ms for 10K queries vs 4.2 ms at D=8).
            d_per_dim = max(1, min(24, round((n / 350.0) ** (1.0 / 3.0))))
        self.D = d_per_dim
        self.W = (extent / self.D).astype(np.float64)  # per-dim supercell width
        if halo is None:
            # halo = c * (V/n)^(1/3) trades certificate coverage against
            # scan width: P(NN > halo) = exp(-(4/3)pi c^3) per uniform
            # query. c = 1.5 gives P ~ 7e-7 (one fallback per ~140 batches
            # of 10K) while carrying ~40% fewer halo candidates per cell
            # than the previous c = 2.5 (P ~ e-65 — certainty overkill that
            # cost real kernel time every batch).
            volume = float(np.prod(extent))
            halo = 1.5 * (volume / max(n, 1)) ** (1.0 / 3.0)
        # Build-cost bound: membership enumeration spans ceil(2*halo/W) + 1
        # cells per dim, so halo is capped at one cell width (<= 3 cells per
        # dim, <= 27 memberships per point). A larger requested halo is
        # clamped — the certificate then rejects more queries (exact
        # fallback), never lies. The fast native build handles the classic
        # halo <= W/2 (8-corner) case; wider halos use the vectorized numpy
        # enumeration.
        self.halo = float(min(halo, float(self.W.min())))
        self.mn = mn.astype(np.float64)

        # Halo membership: point p joins group g iff p is within halo of g's
        # box; per dim that is at most 2 consecutive supercell indices
        # (guaranteed by the halo <= W/2 clamp above). Native C++ counting-
        # sort build when available (two O(8n) passes); numpy fallback below.
        G = self.D ** 3
        from nns_tpu.native import native_cells_build

        native = None
        if self.halo <= float(self.W.min()) / 2.0:
            # The native counting-sort build enumerates the classic
            # {lo, hi} 8-corner memberships, valid only for halo <= W/2.
            native = native_cells_build(
                refs, self.D, self.halo, self.mn, self.W, max_candidates, PAD_SENTINEL
            )
        if native is not None:
            halo_dm_np, halo_ids, counts = native
            if halo_dm_np is None:
                raise ValueError(
                    f"supercell halo overflow (R_max={int(counts.max())}): data "
                    "too clustered for the cell-list engine — use the fused "
                    "kernel or octree"
                )
            self.R_max = halo_dm_np.shape[2]
        else:
            halo_pts, halo_ids, counts = self._build_numpy_halos(refs, max_candidates)
            halo_dm_np = np.ascontiguousarray(np.swapaxes(halo_pts, 1, 2))
        if device_place:
            self.halo_dm = jax.device_put(jnp.asarray(halo_dm_np))
            self.halo_ids_dev = jax.device_put(jnp.asarray(halo_ids))
            jax.block_until_ready((self.halo_dm, self.halo_ids_dev))
        else:
            # Subclasses (sharded placement) stage the arrays themselves.
            self.halo_dm = halo_dm_np
            self.halo_ids_dev = None
        self.halo_ids = halo_ids
        self.avg_candidates = float(counts.mean())

    # -- query ------------------------------------------------------------

    def _sentinel_risk(self, q: np.ndarray) -> np.ndarray | None:
        """Bool mask of queries close enough to the PAD_SENTINEL corner
        (coordinates 1e6 per dim) that a padded halo slot could win the scan
        AND pass the <= halo certificate — possible when the DATA itself
        lives near 1e6 (range-robustness, VERDICT round 2 weak #6). Such
        queries are forced uncertified on the host, so they take the exact
        fallback; everywhere else the phantom's distance exceeds halo and
        the certificate already rejects it. Returns None when no query is
        at risk (the overwhelmingly common case)."""
        d2 = ((q.astype(np.float64) - PAD_SENTINEL) ** 2).sum(axis=1)
        risk = d2 <= (2.0 * self.halo) ** 2
        return risk if bool(risk.any()) else None

    def _group_of(self, q: np.ndarray) -> np.ndarray:
        g = np.floor((q.astype(np.float64) - self.mn) / self.W).astype(np.int64)
        g = np.clip(g, 0, self.D - 1)
        return (g[:, 0] * self.D + g[:, 1]) * self.D + g[:, 2]

    def _build_numpy_halos(self, refs: np.ndarray, max_candidates: int):
        """Vectorized numpy halo build (wide-halo levels, and the fallback
        when the native lib is unavailable): enumerate the cells whose box
        lies within ``halo`` of each point per dim (a variable lo..hi index
        range — the classic 8-corner case when halo <= W/2), stable-sort by
        group, fill. Membership is per-dim (L-inf) and thus a superset of
        the L2 ball — the certificate stays sound: any point absent from a
        cell's set has a > halo gap in SOME dim, hence L2 distance > halo."""
        rel = refs.astype(np.float64) - self.mn
        lo = np.clip(np.floor((rel - self.halo) / self.W).astype(np.int64), 0, self.D - 1)
        hi = np.clip(np.floor((rel + self.halo) / self.W).astype(np.int64), 0, self.D - 1)
        span = (hi - lo).max(axis=0) + 1  # per-dim enumeration width
        pairs_pt: list[np.ndarray] = []
        pairs_gid: list[np.ndarray] = []
        for dx in range(int(span[0])):
            gx = lo[:, 0] + dx
            vx = gx <= hi[:, 0]
            for dy in range(int(span[1])):
                gy = lo[:, 1] + dy
                vy = gy <= hi[:, 1]
                for dz in range(int(span[2])):
                    gz = lo[:, 2] + dz
                    vz = gz <= hi[:, 2]
                    valid = vx & vy & vz
                    gid = (gx * self.D + gy) * self.D + gz
                    pairs_pt.append(np.flatnonzero(valid))
                    pairs_gid.append(gid[valid])
        pt = np.concatenate(pairs_pt)
        gid = np.concatenate(pairs_gid)
        # Within a group, slot order follows octant-block then id — an
        # arbitrary but fixed order (ties return any true NN; see kernel).
        order = np.argsort(gid, kind="stable")
        pt, gid = pt[order], gid[order]

        G = self.D ** 3
        counts = np.bincount(gid, minlength=G)
        r_max = int(counts.max()) if len(counts) else 1
        if r_max > max_candidates:
            raise ValueError(
                f"supercell halo overflow (R_max={r_max}): data too clustered "
                "for the cell-list engine — use the fused kernel or octree"
            )
        # Round to 256 slots, not pow2 (see native_cells_build): the scan
        # pays R_max for every group.
        self.R_max = max(256, -(-r_max // 256) * 256)
        starts = np.concatenate([[0], np.cumsum(counts)])
        halo_pts = np.full((G, self.R_max, 3), PAD_SENTINEL, dtype=np.float32)
        halo_ids = np.zeros((G, self.R_max), dtype=np.int32)
        pos = np.arange(len(pt)) - starts[gid]
        halo_pts[gid, pos] = refs[pt]
        halo_ids[gid, pos] = pt.astype(np.int32)
        return halo_pts, halo_ids, counts

    def q_max_limit(self) -> int:
        """Largest supported queries-per-supercell for one batch. The scan
        kernel shrinks its halo tile down to 512 points as the query block
        grows, so the ceiling is the 1M-element VMEM tile at the minimum
        tile: batches beyond it (heavily skewed query distributions) must
        go to the brute-force path."""
        return (1 << 20) // 512  # 2048

    def stage(self, queries: np.ndarray):
        """Host-side bucketing: sort queries by supercell, compute slot
        positions, pack into one (m, 5) f32 upload array. Returns
        (packed_np, order, q_max); q_max is None when the batch is too
        skewed for the dense kernel (caller must use the brute path)."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if q.ndim != 2 or q.shape[1] != 3:
            raise ValueError(f"queries must be (m, 3); got {q.shape}")
        m = q.shape[0]
        from nns_tpu.native import native_cells_stage

        native = native_cells_stage(q, self.D, self.mn, self.W)
        if native is not None:
            packed, order, raw_max = native
            q_max = _pow2_at_least(max(raw_max, 8))
            if q_max > self.q_max_limit():
                return None, order, None
            return packed, order, q_max
        sid = self._group_of(q)
        order = np.argsort(sid, kind="stable")
        sid_s = sid[order]
        counts = np.bincount(sid_s, minlength=self.D ** 3)
        q_max = _pow2_at_least(max(int(counts.max()), 8))
        if q_max > self.q_max_limit():
            return None, order, None
        pos = np.arange(m) - np.concatenate([[0], np.cumsum(counts)])[sid_s]
        packed = np.empty((m, 5), dtype=np.float32)
        packed[:, :3] = q[order]
        packed[:, 3] = sid_s
        packed[:, 4] = pos
        return packed, order, q_max

    def query_staged(self, packed, q_max: int, group_batch: int | None = None):
        """Device half: one dispatch over a staged (m, 5) upload array
        (numpy or device-resident). Returns the packed (4, m) device array."""
        return _device_query(
            jnp.asarray(packed), self.halo_dm, self.halo_ids_dev,
            jnp.float32(self.halo) ** 2,
            q_max, self.D ** 3, _interpret(), group_batch,
        )

    def _dense_scatter(self, packed: np.ndarray, q_max: int):
        """One staged (m, 5) pack -> (dense (G, q_max, 3) f32, flat winner
        slots (m,) i32) — the single home of the host dense-scatter (both
        staging forms share it so a future dtype/sentinel change cannot
        drift between them)."""
        sid = packed[:, 3].astype(np.int64)
        pos = packed[:, 4].astype(np.int64)
        dense = np.zeros((self.D ** 3, q_max, 3), np.float32)
        dense[sid, pos] = packed[:, :3]
        return dense, (sid * q_max + pos).astype(np.int32)

    def stage_queue_ragged(self, batches):
        """Ragged queue staging for the tuple drain: each batch keeps its
        OWN pow2 q_max instead of sharing the queue-wide max, so one
        skewed batch cannot inflate every other batch's dense tensor and
        winner table (`stage_queue`'s shared-QM stacking doubles the
        whole queue's download the moment any batch crosses a pow2
        boundary — observed: one 18-query supercell in a 896-deep queue).
        The tuple drain traces one scan per batch, so mixed shapes share
        one device program. Returns (denses [list of (G, qm_b, 3)],
        fslots [list of (m,) i32], orders), or (None, None, None) when
        any batch is too skewed for the dense kernel."""
        denses, fslots, orders = [], [], []
        for qb in batches:
            packed, order, q_max = self.stage(qb)
            if packed is None:
                return None, None, None
            dense, flat = self._dense_scatter(packed, q_max)
            denses.append(dense)
            fslots.append(flat)
            orders.append(order)
        return denses, fslots, orders

    def stage_queue(self, batches):
        """Queue-form staging: bucket several equal-sized query batches on
        host straight into dense per-supercell tensors plus flat winner
        slots (the device then does no scatter at all). Returns
        (dstack (W, G, QM, 3), fstack (W, m), orders) — dstack is None when
        any batch is too skewed for the dense kernel (caller queries per
        batch instead)."""
        packs, orders, q_maxes = [], [], []
        for qb in batches:
            packed, order, q_max = self.stage(qb)
            if packed is None:
                return None, None, None
            packs.append(packed)
            orders.append(order)
            q_maxes.append(q_max)
        q_max = max(q_maxes)
        denses, flats = [], []
        for packed in packs:
            dense, flat = self._dense_scatter(packed, q_max)
            denses.append(dense)
            flats.append(flat)
        return np.stack(denses), np.stack(flats), orders

    def query_queue_staged(self, dstack, fstack=None,
                           group_batch: int | None = None):
        """Device half of the queue path: W staged batches, one dispatch
        (see _device_query_queue). Returns the dense (W, G, QM, 1) i32
        device array (the sharded override returns (W, G*QM) — flat either
        way after unscatter_queue's host reshape) — winner id per slot,
        certificate in the sign bit; recover
        per-query results by indexing with stage_queue's fstack slots on
        the host (unscatter_queue). ``fstack`` is accepted for call-site
        symmetry but the device no longer needs it. A tuple/list of W
        per-batch (G, QM, 3) arrays routes to the slice-free tuple drain
        (same winners, rows returned as a tuple)."""
        del fstack
        if isinstance(dstack, (tuple, list)):
            return _device_query_queue_seq(
                tuple(dstack), self.halo_dm, self.halo_ids_dev,
                jnp.float32(self.halo) ** 2, _interpret(), group_batch,
            )
        return _device_query_queue(
            jnp.asarray(dstack), self.halo_dm, self.halo_ids_dev,
            jnp.float32(self.halo) ** 2, _interpret(), group_batch,
        )

    @staticmethod
    def unscatter_queue(out_w: np.ndarray, fslots: np.ndarray,
                        order: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Host half of the queue path for one batch: dense (G*QM,) signed
        winners + the batch's flat slots and staging order -> (idx, ok) in
        the caller's original query order."""
        got = np.asarray(out_w).reshape(-1)[fslots]  # (m,) signed, staged order
        m = len(order)
        inv = np.empty(m, dtype=np.int64)
        inv[order] = np.arange(m)
        got = got[inv]
        ok = got >= 0
        idx = np.where(ok, got, -got - 1).astype(np.int32)
        return idx, ok

    # Sub-drain sizes for the serving (canonicalized) ragged drain, largest
    # first; greedy decomposition of each tier's batch count. The small
    # steps (4, 2) keep remainders amortized: a 7-batch tier drains as
    # 4+2+1 (3 dispatches / sharded collectives) instead of 7 singles,
    # while the compiled-program universe stays bounded by
    # tiers x len(ladder).
    _CHUNK_LADDER = (64, 8, 4, 2, 1)

    def _drain_ragged_canonical(self, denses):
        """Serving-safe ragged drain: group batches by dense shape (the
        pow2 q_max tier — <= 9 tiers exist) and drain each tier in
        fixed-size chunks from ``_CHUNK_LADDER``, so the compiled-program
        universe is bounded by tiers x ladder sizes REGARDLESS of queue
        composition or order. Jitting the ordered W-tuple directly (the
        bench's monolithic path) makes any novel q_max mix or permutation
        a fresh trace — minutes through a remote compile service, mid-
        serving (ADVICE round 3). The chunks' dispatches cost ~1 ms each
        through a tunnel (~0.02 ms/batch at W=768); all winner rows are
        concatenated on device and fetched ONCE. Returns the per-batch
        flat (G*qm_b,) i32 winner arrays in input order."""
        by_shape: dict[tuple, list[int]] = {}
        for i, d in enumerate(denses):
            by_shape.setdefault(d.shape, []).append(i)
        pending: list[tuple[int, Any]] = []  # (batch index, device row)
        for idxs in by_shape.values():
            p = 0
            while p < len(idxs):
                c = next(s for s in self._CHUNK_LADDER if s <= len(idxs) - p)
                chunk = idxs[p:p + c]
                rows = self.query_queue_staged(tuple(denses[i] for i in chunk))
                pending.extend(zip(chunk, rows))
                p += c
        sizes = [denses[i].shape[0] * denses[i].shape[1] for i, _ in pending]
        offs = np.concatenate([[0], np.cumsum(sizes)])
        flat = np.asarray(jnp.concatenate([r.reshape(-1) for _, r in pending]))
        winners: list[np.ndarray | None] = [None] * len(denses)
        for j, (i, _) in enumerate(pending):
            winners[i] = flat[offs[j]:offs[j + 1]]
        return winners

    def query_queue(self, batches, return_coverage: bool = False):
        """EXACT answers for several equal-sized query batches in few device
        dispatches (the serving queue-drain path: ~1 ms of per-dispatch
        overhead amortizes across the whole queue). Uncertified queries in
        any batch fall back to the exact scan; a too-skewed queue falls
        back to per-batch querying. With ``return_coverage``, also returns
        the per-batch certified fraction (query_with_coverage semantics) so
        serving callers can feed workload-adaptation hysteresis.

        Staging is RAGGED on the single-chip engine (per-batch pow2 q_max —
        one skewed batch cannot inflate the whole drain's tensors; see
        stage_queue_ragged) and the drain is CANONICALIZED into per-tier
        fixed-size sub-drains (_drain_ragged_canonical) so the compiled-
        program universe is bounded by tiers x ladder sizes; the host
        still pays ONE sync fetch. ShardedCellEngine inherits this drain —
        its query_queue_staged stacks each same-shape chunk into one
        mesh-wide program with one all-gather (round 4)."""
        if self._ragged_queue_drain:
            denses, fslots, orders = self.stage_queue_ragged(batches)
            staged_ok = denses is not None
        else:
            dstack, fslots, orders = self.stage_queue(batches)
            staged_ok = dstack is not None
        if not staged_ok:
            pairs = [self.query_with_coverage(qb) for qb in batches]
            results = [idx for idx, _ in pairs]
            return (results, [cov for _, cov in pairs]) if return_coverage \
                else results
        if self._ragged_queue_drain:
            winners = self._drain_ragged_canonical(denses)
        else:
            out = np.asarray(self.query_queue_staged(dstack))
            winners = [out[w] for w in range(len(batches))]
        results = []
        covs = []
        for w, qb in enumerate(batches):
            idx, ok = self.unscatter_queue(winners[w], fslots[w], orders[w])
            risk = self._sentinel_risk(np.asarray(qb, dtype=np.float32))
            if risk is not None:
                ok &= ~risk
            covs.append(float(ok.mean()) if len(ok) else 1.0)
            if not ok.all():
                from nns_tpu.kernels.pallas_fused import fused_fallback

                bad = np.flatnonzero(~ok)
                idx[bad] = np.asarray(fused_fallback(
                    np.ascontiguousarray(qb, dtype=np.float32)[bad], self.refs
                ))
            results.append(idx)
        return (results, covs) if return_coverage else results

    def query_submit(self, queries: np.ndarray):
        """Asynchronous half: host bucketing + device dispatch. Returns a
        token for ``query_collect``; several tokens may be in flight, so a
        serving loop pipelines host prep with device compute."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        packed_np, order, q_max = self.stage(q)
        if packed_np is None:
            # Batch too skewed for the dense kernel: mark every query as
            # uncertified; collect()'s caller routes them to the exact scan.
            return (None, order, len(order), None)
        risk = self._sentinel_risk(q)
        return (self.query_staged(packed_np, q_max), order, packed_np.shape[0], risk)

    def query_collect(self, token):
        idx, ok, _ = self.query_collect_dist(token)
        return idx, ok

    def query_collect_dist(self, token):
        packed, order, m, risk = token
        if packed is None:
            return (
                np.zeros(m, dtype=np.int32),
                np.zeros(m, dtype=bool),
                np.full(m, np.inf, dtype=np.float32),
            )
        packed = np.asarray(packed)  # the single round-trip
        inv = np.empty(m, dtype=np.int64)
        inv[order] = np.arange(m)
        hi = packed[0][inv].astype(np.int64)
        lo_bits = packed[1][inv].astype(np.int64)
        idx = ((hi << 12) | lo_bits).astype(np.int32)
        ok = packed[2][inv].astype(bool)
        d2 = packed[3][inv].astype(np.float32)
        if risk is not None:
            ok &= ~risk  # sentinel-corner proximity: force the exact path
        return idx, ok, d2

    def query_with_flags(self, queries: np.ndarray):
        return self.query_collect(self.query_submit(queries))

    def query_with_flags_dist(self, queries: np.ndarray):
        """(idx, certified, best_d2): best_d2 is the kernel's f32 min over
        the halo candidates — it tracks the true NN distance only to f32
        rounding (can land ~1 ulp, ~1e-7 relative, BELOW the f64 truth),
        and is inf when the halo set was empty. Consumers needing a sound
        upper bound must widen by that band (or recompute in f64 as the
        sharded engine does, sharded_cells.py query_collect_dist)."""
        return self.query_collect_dist(self.query_submit(queries))

    def query_with_coverage(self, queries: np.ndarray) -> tuple[np.ndarray, float]:
        """Exact answers plus the fraction certified by the index (callers
        can adapt engine choice when coverage is persistently poor)."""
        idx, ok = self.query_with_flags(queries)
        idx = np.array(idx)
        if not ok.all():
            from nns_tpu.kernels.pallas_fused import fused_fallback

            bad = np.flatnonzero(~ok)
            idx[bad] = np.asarray(fused_fallback(
                np.ascontiguousarray(queries, dtype=np.float32)[bad], self.refs
            ))
        cov = float(np.asarray(ok).mean()) if len(ok) else 1.0
        return idx.astype(np.int32), cov

    def query(self, queries: np.ndarray) -> np.ndarray:
        return self.query_with_coverage(queries)[0]

    def query_topk(self, queries: np.ndarray, k_nn: int = 8):
        """Exact k-NN through the supercell index: (dist2[m, k], idx[m, k]),
        ascending. Queries whose k-th neighbor the certificate cannot prove
        (k-th dist > halo, or fewer than k candidates) fall back to the
        exact chunked top-k scan."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        m = q.shape[0]
        k_nn = min(k_nn, self.n)  # nns_topk clamps the same way
        packed_np, order, q_max = self.stage(q)
        if packed_np is None:
            from nns_tpu.kernels.topk import nns_topk

            return nns_topk(q, self.refs, k_nn)
        out = np.asarray(_device_query_topk(
            jnp.asarray(packed_np), self.halo_dm, self.halo_ids_dev,
            jnp.float32(self.halo) ** 2, k_nn, q_max, self.D ** 3, _interpret(),
        ))
        inv = np.empty(m, dtype=np.int64)
        inv[order] = np.arange(m)
        out = out[inv]
        d2 = out[:, :k_nn].astype(np.float32)
        hi = out[:, k_nn : 2 * k_nn].astype(np.int64)
        lo = out[:, 2 * k_nn : 3 * k_nn].astype(np.int64)
        idx = ((hi << 12) | lo).astype(np.int32)
        ok = out[:, -1] > 0.5
        risk = self._sentinel_risk(q)
        if risk is not None:
            ok &= ~risk
        if not ok.all():
            from nns_tpu.kernels.topk import nns_topk

            bad = np.flatnonzero(~ok)
            fd, fi = nns_topk(q[bad], self.refs, k_nn)
            d2[bad] = fd
            idx[bad] = fi
        return d2, idx


    # -- persistence (checkpoint subsystem, SURVEY.md §5) ------------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            refs=self.refs,
            halo_pts=np.swapaxes(np.asarray(self.halo_dm), 1, 2),
            halo_ids=self.halo_ids,
            meta=np.array([self.D, self.R_max], dtype=np.int64),
            geo=np.concatenate([self.mn, self.W, [self.halo]]).astype(np.float64),
        )

    @classmethod
    def load(cls, path: str) -> "CellListEngine":
        with np.load(path) as z:
            eng = cls.__new__(cls)
            eng.refs = z["refs"]
            eng.n = eng.refs.shape[0]
            eng.D, eng.R_max = (int(v) for v in z["meta"])
            geo = z["geo"]
            eng.mn, eng.W, eng.halo = geo[0:3], geo[3:6], float(geo[6])
            halo_pts = z["halo_pts"]
            eng.halo_ids = z["halo_ids"]
            eng.halo_dm = jax.device_put(jnp.asarray(np.swapaxes(halo_pts, 1, 2)))
            eng.halo_ids_dev = jax.device_put(jnp.asarray(eng.halo_ids))
            jax.block_until_ready((eng.halo_dm, eng.halo_ids_dev))
            eng.avg_candidates = float((halo_pts[..., 0] < PAD_SENTINEL).sum() / eng.D ** 3)
            return eng


def nns_cell_list(queries, refs, d_per_dim: int | None = None) -> np.ndarray:
    """One-shot wrapper; non-3-D or tiny reference sets route to the fused
    kernel (capability-dispatch contract, SURVEY.md §5)."""
    if refs.shape[1] != 3 or refs.shape[0] < 4096:
        # fused_fallback stages the refs via device_put first (the numpy->
        # jit-argument path costs ~10x on tunneled runtimes).
        from nns_tpu.kernels.pallas_fused import fused_fallback

        return np.asarray(fused_fallback(queries, refs))
    try:
        # One-shot semantics: a single CellListEngine — residual misses
        # go to one exact scan. (Prepare-once/query-many callers get
        # workload adaptation — promotion to the octree beam index on
        # clustered data — via NNEngine.)
        eng = CellListEngine(np.asarray(refs), d_per_dim=d_per_dim)
    except ValueError:
        from nns_tpu.kernels.pallas_fused import fused_fallback

        return np.asarray(fused_fallback(queries, refs))
    return eng.query(np.asarray(queries))
