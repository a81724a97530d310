"""v9 — the "best brute force" slot: MXU triple-bf16 expansion with a
carried two-minima band certificate and an exact refine fallback.

Reference analog: v9 (core.cu:856-1058) is the reference ladder's
performance summit — its most-tuned brute-force kernel (full unroll +
every prior trick). On TPU the genuinely distinct mechanism is moving the
distance FLOPs from the VPU to the MXU (the systolic array, ~50x the f32
VPU throughput in bf16). Exact f32 arithmetic cannot ride the MXU
directly: f32 `jnp.dot` inside Pallas lowers to VPU loops, and
``Precision.HIGHEST`` is a 300 s compile + slowdown (CLAUDE.md invariant,
measured round 1). Instead:

1. Split every coordinate into a bf16 (hi, mid, lo) triple outside the
   kernel: ``hi = bf16(x)``, ``mid = bf16(x - hi)``, ``lo = bf16(x - hi -
   mid)``; the triple carries ~24 mantissa bits, i.e. all of f32.
2. Compute the cross term ``q . r`` as the six product terms
   ``hh + hm + mh + hl + lh + mm`` — but as ONE MXU matmul, not six:
   the splits are CONCATENATED along the contraction axis
   (``q_cat = [qh qh qm qh ql qm]``, ``r_cat = [rh; rm; rh; rl; rh; rm]``),
   so a k=16 problem contracts over 96 of the MXU's 128-deep systolic
   dimension instead of six passes at 16/128 utilization each (measured:
   113 ms -> 41 ms at m=10240, n=1M, k=16). f32 accumulation, default
   precision — no Mosaic precision games. Dropped terms (``m.l``,
   ``l.m``, ``l.l``) and the split residuals bound the error of the
   half-expansion value e = |r|^2/2 - q.r at ``delta ~ k * 2^-25 * scale``
   — comparable to the f32 rounding of the direct form itself.
3. TWO-PHASE reduction (round 4; the round-3 kernel carried
   (min1, argmin, duplicate-aware min2) through ~7 VPU passes per tile,
   and those extra (tm, tn) temporaries also capped the tile size —
   exp_r3_k16.py measured the epilogue at ~23% and the remaining floor
   dominated by per-grid-step overhead at 20K+ tiny tiles):
   - Phase 1 (Pallas): per reference tile, ONE min-reduce of the
     expansion values; the carry is just (min1, winning-tile id,
     cross-tile runner-up m2x) — three (tm, 1) vectors — so big tiles
     fit VMEM and the grid shrinks up to 16x.
   - Phase 2 (XLA, same jit): gather ONLY each query's winning tile of
     raw f32 reference points ((m, tn, k) — 3x fewer bytes than the
     6-way bf16 splits) and rescan it in full f32 on the VPU
     (explicit mul+sum; jnp.dot would bf16-truncate on TPU), yielding
     the in-tile argmin and the duplicate-aware in-tile min2. The
     gather is chunked via lax.map to bound the temporary.
4. Certificate: ``min(in_tile_min2, m2x) > min1 + 2*delta`` proves arg1
   is the true f32 nearest neighbor: any other point j in the winning
   tile has E(j) >= in_tile_min2 - delta2, any point outside it has
   E(j) >= its tile's min - delta1 >= m2x - delta1, while E(arg1) <=
   min1 + delta2; delta >= delta1 >= delta2 covers both (phase 2 is
   strictly more accurate than phase 1). Exact duplicates land in
   in_tile_min2 (only the argmin POSITION is masked) or force
   m2x == min1 (cross-tile), failing the certificate as they must.
   Queries that fail (near-exact ties / duplicate-heavy data) are
   re-answered by the exact fused VPU scan over a REUSED staged
   reference set — the package exactness contract holds
   unconditionally.

Reference points are padded in the *distance domain*: padded columns get
``r2 = +inf`` (their split coordinates are zero), so they can never win
regardless of the data's coordinate range — no sentinel-coordinate
assumption (ADVICE round 1).

Measured (v5e, k=16, m=10240, n=1M): 41 ms vs the direct-f32 fused
kernel's ~182 ms — 4.4x, recall 1.0, certificate coverage ~98% (failures
are near-ties, re-answered exactly). At k < 8 the VPU direct form is
already near its compute floor while 1M-density expansion gaps shrink
below any sound error band (cert coverage 24% at k=3), so the dispatcher
keeps v4 there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nns_tpu.kernels import layouts
from nns_tpu.kernels.pallas_fused import FusedBruteForce, _interpret

_LANE = 128
_SUBLANE = 8

# Error bound on the triple-bf16 half-expansion value e = |r|^2/2 - q.r,
# in units of (max|q|^2 + max|r|^2) per coordinate count k: dropped cross
# terms (~2^-27) + split residuals (~2^-26) + f32 accumulation, with a
# ~16x safety factor. k is folded in by the caller.
_DELTA_REL_PER_K = 2.0 ** -21


def _split_bf16x3(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(hi, mid, lo) bf16 triple with hi + mid + lo ~ x to ~24 bits.

    The ``optimization_barrier`` on each cast is LOAD-BEARING: under jit on
    the real TPU backend, XLA folds ``x - f32(bf16(x))`` to exactly 0
    (treating the round-trip cast as value-preserving), which silently
    zeroes the mid/lo residuals and collapses the triple to a plain bf16
    truncation — measured on-chip 2026-08-20: in-jit rem max 0.0 vs eager
    1.9e-3, split-dot error 1.57e-2 (= the raw bf16 dot) vs 1.6e-6 with
    the barriers. Eager callers (v9's reference-side staging) were never
    affected; in-jit callers (v9's query-side _cat_q in _phase12, the
    chunk-scan MXU core) were. The barrier only pins the cast results —
    it costs no copies and does not block fusion around the split."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    rem = x - hi.astype(jnp.float32)
    mid = jax.lax.optimization_barrier(rem.astype(jnp.bfloat16))
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _cat_q(qh, qm, ql) -> jnp.ndarray:
    """Query-side contraction layout: [qh qh qm qh ql qm]."""
    return jnp.concatenate([qh, qh, qm, qh, ql, qm], axis=1)


def _stack_r(rh, rm, rl) -> jnp.ndarray:
    """Reference-side HBM layout: the three splits stored ONCE as
    [rh; rm; rl] (3k rows). The kernel re-materializes the 6-term
    contraction partner of _cat_q ([rh; rm; rh; rl; rh; rm]) in VMEM per
    tile — a VPU copy — instead of streaming the duplicated 6k-row form
    from HBM: rc HBM traffic per query-tile sweep halves (192 -> 96 MB at
    1M x k16), worth ~1 ms/batch of the phase-1 time (xplane r4)."""
    return jnp.concatenate([rh, rm, rl], axis=0)


def _phase1_kernel(qc_ref, rc_ref, r2h_ref, min1_ref, tid_ref, m2x_ref,
                   t2v_ref, tid2_ref, t3v_ref, *, ts: int, ns: int, ks: int):
    """Min-only scan: per reference tile, one MXU pass + one VPU min-reduce.
    Carries (min1, winning SUBTILE id, cross-subtile runner-up m2x) plus
    the TILE-granular top-3 (t2v, tid2, t3v) that feeds the band-limited
    refine of uncertified rows: the second-best tile's id (so its points
    can be rescanned alongside the winner's tile) and the third-best tile
    MIN (bounding everything outside those two). All six carries are
    (tm, 1) vectors — ~10 extra VPU lane-ops per grid step; the earlier
    r4 design exported a full (m_pad, n_tiles) per-tile-min matrix instead,
    which cost a 335 MB HBM write + a 1.7 ms/batch transpose relayout and
    crashed the remote compile service past ~120 MB.

    The tile spans ns subtiles of width ts; ids are carried at subtile
    granularity so the phase-1 tile can grow (fewer grid steps) while the
    phase-2 gather stays ts columns wide. ns == 1 degenerates to plain
    per-tile ids at zero extra cost (sarg == 0, in-tile runner-up == inf).

    rc_ref holds the deduplicated [rh; rm; rl] split stack (3*ks rows);
    the 6-term layout is built in VMEM (see _stack_r)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min1_ref[:] = jnp.full(min1_ref.shape, jnp.inf, dtype=jnp.float32)
        tid_ref[:] = jnp.zeros(tid_ref.shape, dtype=jnp.int32)
        m2x_ref[:] = jnp.full(m2x_ref.shape, jnp.inf, dtype=jnp.float32)
        t2v_ref[:] = jnp.full(t2v_ref.shape, jnp.inf, dtype=jnp.float32)
        tid2_ref[:] = jnp.zeros(tid2_ref.shape, dtype=jnp.int32)
        t3v_ref[:] = jnp.full(t3v_ref.shape, jnp.inf, dtype=jnp.float32)

    rh = rc_ref[0:ks]
    rm = rc_ref[ks:2 * ks]
    rl = rc_ref[2 * ks:3 * ks]
    rcat = jnp.concatenate([rh, rm, rh, rl, rh, rm], axis=0)
    # One wide-contraction bf16 MXU pass = all six split products.
    cross = jax.lax.dot_general(
        qc_ref[:], rcat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Half-expansion: e = |r|^2/2 - q.r (ranking-equivalent to the distance;
    # |q|^2 row-constant, the global 2x monotone).
    e = r2h_ref[:] - cross
    subs = [
        jnp.min(e[:, c * ts:(c + 1) * ts], axis=1, keepdims=True)
        for c in range(ns)
    ]
    smin = subs[0] if ns == 1 else jnp.concatenate(subs, axis=1)  # (tm, ns)
    tmin = jnp.min(smin, axis=1, keepdims=True)
    if ns == 1:
        sarg = jnp.zeros(tmin.shape, dtype=jnp.int32)
        smin2 = jnp.full(tmin.shape, jnp.inf, dtype=jnp.float32)
    else:
        scols = jax.lax.broadcasted_iota(jnp.int32, smin.shape, 1)
        # Lowest subtile achieving tmin; its runner-up masks only that
        # POSITION, so an in-tile cross-subtile duplicate lands in smin2.
        sarg = jnp.min(jnp.where(smin == tmin, scols, ns), axis=1,
                       keepdims=True)
        smin2 = jnp.min(jnp.where(scols == sarg, jnp.inf, smin), axis=1,
                        keepdims=True)
    stid = j * ns + sarg

    # Duel with the carry. Strict < in ascending tile order keeps the
    # earlier (lower-id) subtile on an exact cross-tile tie, which then
    # lands in m2x and fails the certificate — as a duplicate must.
    c1, ct, c2 = min1_ref[:], tid_ref[:], m2x_ref[:]

    # TILE-granular sorted-top-3 merge for the band refine, using the
    # PRE-duel carry (c1 is the best tile min so far, ct // ns its tile).
    # A tile tying the leader lands in (t2v, tid2) — so a two-tile exact
    # duplicate is still gathered and resolved by lowest index in tier 1;
    # a third tying tile lands in t3v, failing the outside bound as it
    # must.
    t2, i2, t3 = t2v_ref[:], tid2_ref[:], t3v_ref[:]
    b1 = tmin < c1
    b2 = jnp.logical_and(jnp.logical_not(b1), tmin < t2)
    t2v_ref[:] = jnp.where(b1, c1, jnp.where(b2, tmin, t2))
    tid2_ref[:] = jnp.where(b1, ct // ns, jnp.where(b2, j, i2))
    t3v_ref[:] = jnp.where(jnp.logical_or(b1, b2), t2, jnp.minimum(t3, tmin))

    better = tmin < c1
    min1_ref[:] = jnp.where(better, tmin, c1)
    tid_ref[:] = jnp.where(better, stid, ct)
    # Second-smallest SUBTILE MINIMUM outside the winning subtile: a new
    # winner demotes the old one AND competes with its own in-tile
    # runner-up; a loser competes with the carried runner-up.
    m2x_ref[:] = jnp.where(
        better, jnp.minimum(c1, smin2), jnp.minimum(c2, tmin)
    )


def _phase2_chunk(q, tid, m2x, refs_t, r2h_t, delta, tile_n):
    """Full-f32 rescan of each query's winning tile (one lax.map step).

    q (mc, kp) f32; tid (mc,) i32; m2x (mc,) f32;
    refs_t (n_tiles, tile_n, kp) f32 zero-padded; r2h_t (n_tiles, tile_n)
    f32 half-norms (+inf on padded columns, so padding never wins).
    Returns (idx, cert, min1) per row.
    """
    rsel = jnp.take(refs_t, tid, axis=0)           # (mc, tile_n, kp)
    r2sel = jnp.take(r2h_t, tid, axis=0)           # (mc, tile_n)
    # f32 mul+sum on the VPU — a jnp.dot here would bf16-truncate on TPU,
    # blowing the phase-2 error past the certificate band.
    cross = jnp.sum(rsel * q[:, None, :], axis=2)  # (mc, tile_n)
    ew = r2sel - cross
    wmin1 = jnp.min(ew, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, ew.shape, 1)
    warg = jnp.min(jnp.where(ew == wmin1[:, None], cols, tile_n), axis=1)
    # In-tile min2 masks only the argmin POSITION, so in-tile duplicates
    # are seen and fail the certificate.
    wmin2 = jnp.min(jnp.where(cols == warg[:, None], jnp.inf, ew), axis=1)
    idx = tid * tile_n + warg
    cert = (jnp.minimum(wmin2, m2x) > wmin1 + 2.0 * delta).astype(jnp.float32)
    return idx, cert, wmin1


def _phase12(q, rc, r2h, refs_t, r2h_t, delta, kp, tile_m, tile_n,
             ts, interpret):
    """Traced core shared by the packed query and the serving drain:
    k-pad + bf16 triple split + min-only Pallas phase 1 + winning-subtile
    f32 rescan phase 2 + certificate. Returns per-row
    (min1 (m,), idx (m,) i32, cert (m,) bool) plus the tile-granular band
    feed (tid2, t3v) as (m_pad, 1) arrays for the band-limited refine."""
    m = q.shape[0]
    if kp != q.shape[1]:
        q = jnp.pad(q, ((0, 0), (0, kp - q.shape[1])))
    qc = _cat_q(*_split_bf16x3(q))
    m_pad = layouts.round_up(m, _SUBLANE)
    tm = min(tile_m, m_pad)
    if m_pad != m:
        qc = jnp.pad(qc, ((0, m_pad - m), (0, 0)))
    n_pad = rc.shape[1]
    grid = (pl.cdiv(m_pad, tm), pl.cdiv(n_pad, tile_n))
    kc = qc.shape[1]

    o_spec = pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    min1, tid, m2x, t2v, tid2, t3v = pl.pallas_call(
        functools.partial(_phase1_kernel, ts=ts, ns=tile_n // ts, ks=kp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * kp, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(o_spec,) * 6,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(qc, rc, r2h)
    del t2v  # carried for the sorted-3 merge; only tid2/t3v feed the refine

    # Phase 2, chunked so the (mc, ts, kp) gather temp stays bounded
    # (~2M gathered points per step) even for concatenated query_many
    # queues.
    mc = min(m_pad, max(_SUBLANE, ((1 << 21) // ts) // _SUBLANE * _SUBLANE))
    m_pad2 = layouts.round_up(m_pad, mc)
    qp = jnp.pad(q[:m], ((0, m_pad2 - m), (0, 0)))
    tidp = jnp.pad(tid[:m, 0], (0, m_pad2 - m))
    m2xp = jnp.pad(m2x[:m, 0], (0, m_pad2 - m))
    nchunks = m_pad2 // mc

    def step(args):
        qck, tidk, m2xk = args
        return _phase2_chunk(qck, tidk, m2xk, refs_t, r2h_t, delta, ts)

    idx2, cert2, min12 = jax.lax.map(
        step,
        (
            qp.reshape(nchunks, mc, kp),
            tidp.reshape(nchunks, mc),
            m2xp.reshape(nchunks, mc),
        ),
    )
    return (
        min12.reshape(-1)[:m],
        idx2.reshape(-1)[:m].astype(jnp.int32),
        cert2.reshape(-1)[:m] > 0.5,
        tid2,
        t3v,
    )


@functools.partial(
    jax.jit, static_argnames=("kp", "tile_m", "tile_n", "ts", "interpret")
)
def _expansion_query(q, rc, r2h, refs_t, r2h_t, delta, kp, tile_m, tile_n,
                     ts, interpret):
    """ONE dispatch for the whole query: the _phase12 core packed as a
    (4, m) f32 [min1, idx_hi, idx_lo, cert] so the caller pays a single
    host fetch; ids transit as two f32-exact 12-/19-bit halves
    (idx = hi*4096 + lo), exact for any n < 2^31 — the engine's real
    bound is HBM, not id precision. This is the inspection path
    (query_min_idx_cert); the serving drain uses _expansion_drain."""
    min1, idx, cert, _, _ = _phase12(
        q, rc, r2h, refs_t, r2h_t, delta, kp, tile_m, tile_n, ts, interpret
    )
    idx_hi = (idx // 4096).astype(jnp.float32)
    idx_lo = (idx % 4096).astype(jnp.float32)
    return jnp.stack([min1, idx_hi, idx_lo, cert.astype(jnp.float32)])


@functools.partial(
    jax.jit,
    static_argnames=(
        "kp", "tile_m", "tile_n", "ts", "maxbad", "maxbad2", "interpret"
    ),
)
def _expansion_drain(q, rc, r2h, refs_t, r2h_t, delta, kp, tile_m, tile_n,
                     ts, maxbad, maxbad2, interpret):
    """The serving-drain program: _phase12 + IN-PROGRAM tier-1 band refine
    + IN-PROGRAM tier-2 full scan + sign-encoded single-int32 output —
    one dispatch, one (m,) i32 fetch.

    Round-4 drain economics (the round-3 form fetched a (4, m) f32 packed
    array and ran the band refine as a separate host round trip): through
    the tunnel the packed fetch costs ~25 ms/MB, so at the k=16 W=32 drain
    (m=320K) the 5.1 MB fetch alone was ~5 ms/batch and the refine's
    upload+dispatch+fetch another ~2.3 — together the difference between
    27 and ~22 ms/batch. Here:

    - uncertified rows are COMPACTED ON DEVICE (cumsum positions +
      drop-mode scatter) into a static ``maxbad``-row bucket,
    - the band-limited top-2-tile direct-f32 rescan (_band_refine_rows,
      soundness in its docstring) runs inside the same program under a
      ``lax.cond`` — a fully-certified batch pays nothing,
    - rows the band refine REFUSES (straddling ties, ~70 per 640K-row
      k=16 drain) are compacted again into a ``maxbad2`` bucket and
      full-scanned IN-PROGRAM (_full_scan_rows: direct f32 over every
      reference point, lowest-index tie-break — exact by construction,
      no certificate needed). Round 5: this tier-2 fold removes the last
      per-drain host round trip (~1.1 ms/batch of the 21.2 at W=32 —
      upload + dispatch + a second 35 ms-floor fetch), leaving the host
      fallback only for bucket-overflow floods,
    - results scatter back (drop-mode, pad slots aimed out of range) and
      the output is ONE int32 per row: ``idx`` where the answer is final,
      ``-idx - 1`` where the host must still re-answer by the exact full
      scan (bad rows beyond either static bucket — sound: negative rows
      are always re-answered).
    """
    m = q.shape[0]
    _, idx, cert, tid2, t3v = _phase12(
        q, rc, r2h, refs_t, r2h_t, delta, kp, tile_m, tile_n, ts, interpret
    )
    signed0 = jnp.where(cert, idx, -idx - 1)
    bad = jnp.logical_not(cert)
    nbad = jnp.sum(bad.astype(jnp.int32))
    qp = q if kp == q.shape[1] else jnp.pad(
        q, ((0, 0), (0, kp - q.shape[1]))
    )

    def _compact(flags, cap):
        """Device-side compaction: slots of the <= cap rows where flags is
        True (cumsum positions + drop-mode scatter). Returns (rows (cap,)
        i32 with m on empty slots, valid (cap,) bool)."""
        rowid = jnp.arange(m, dtype=jnp.int32)
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        slot = jnp.where(flags, pos, cap)
        rows = jnp.full((cap,), m, dtype=jnp.int32)
        rows = rows.at[slot].set(rowid, mode="drop")
        return rows, rows < m

    def refine(signed):
        rows, valid = _compact(bad, maxbad)
        rsafe = jnp.where(valid, rows, 0)
        qb = jnp.take(qp, rsafe, axis=0)                 # (maxbad, kp)
        q2b = jnp.sum(qb * qb, axis=1)
        tile1 = jnp.take(idx, rsafe) // tile_n
        tile2 = jnp.take(tid2[:, 0], rsafe)
        t3b = jnp.take(t3v[:, 0], rsafe)
        n_total = refs_t.shape[0] * refs_t.shape[1]
        ridx, rok = _band_refine_rows(
            qb, q2b, jnp.stack([tile1, tile2], axis=1), t3b,
            refs_t, r2h_t, delta, tile_n, n_total,
        )
        back = jnp.where(valid, rows, m)                 # m -> dropped
        return signed.at[back].set(
            jnp.where(rok, ridx, -ridx - 1), mode="drop"
        )

    signed1 = jax.lax.cond(nbad > 0, refine, lambda s: s, signed0)

    bad2 = signed1 < 0
    nbad2 = jnp.sum(bad2.astype(jnp.int32))

    def full(signed):
        rows, valid = _compact(bad2, maxbad2)
        rsafe = jnp.where(valid, rows, 0)
        qb = jnp.take(qp, rsafe, axis=0)                 # (maxbad2, kp)
        fidx = _full_scan_rows(qb, refs_t, r2h_t)
        back = jnp.where(valid, rows, m)
        return signed.at[back].set(fidx, mode="drop")

    return jax.lax.cond(nbad2 > 0, full, lambda s: s, signed1)


def _full_scan_rows(qb, refs_t, r2h_t):
    """Tier-2 in-program exact scan: direct f32 (q - r)^2 over EVERY
    reference point for a small compacted row bucket, lowest-index
    tie-break — the v0-v9 family contract, exact by construction (it IS
    the definition of the answer on the f32 inputs; no certificate).
    Distance-domain padding via r2h_t's +inf half-norms (zero-coordinate
    padded rows would otherwise win at d2 = |q|^2).

    Cost model: B rows x n points x kp dims of VPU mul-add per TRIGGERED
    drain — at B=256, n=1M, k=16 that is ~12 GFLOP, ~3-10 ms device,
    vs the host tier-2 round trip it replaces (upload + dispatch + a
    second 35 ms-floor fetch per drain). lax.scan over lane-aligned
    reference chunks keeps the (B, cn) temporaries ~8 MB.

    qb (B, kp) f32 zero-padded; refs_t (n_sub, ts, kp) / r2h_t (n_sub, ts)
    — the engine's phase-2 staging, re-viewed flat (free reshape).
    Returns idx (B,) i32.
    """
    n_sub, ts_w, kp = refs_t.shape
    n_pad = n_sub * ts_w
    b = qb.shape[0]
    # Chunk width: lane-aligned, bounding the (B, cn) step temporary.
    cn = min(n_pad, max(_LANE, (1 << 21) // max(b, 1) // _LANE * _LANE))
    # n_pad is a multiple of tile_n >= cn's alignment; pad defensively.
    n_c = -(-n_pad // cn)
    refs_flat = refs_t.reshape(n_pad, kp)
    r2h_flat = r2h_t.reshape(n_pad)
    if n_c * cn != n_pad:
        refs_flat = jnp.pad(refs_flat, ((0, n_c * cn - n_pad), (0, 0)))
        r2h_flat = jnp.pad(
            r2h_flat, (0, n_c * cn - n_pad), constant_values=jnp.inf
        )
    rch = refs_flat.reshape(n_c, cn, kp)
    r2ch = r2h_flat.reshape(n_c, cn)
    base = jnp.arange(n_c, dtype=jnp.int32) * cn

    def body(carry, chunk):
        bd2, bidx = carry
        rk, r2k, b0 = chunk
        # Direct f32, accumulated per-dim to avoid a (B, cn, kp) temp.
        d2 = jnp.zeros((b, cn), dtype=jnp.float32)
        for d in range(kp):
            diff = qb[:, d:d + 1] - rk[None, :, d]
            d2 = d2 + diff * diff
        d2 = jnp.where(jnp.isinf(r2k)[None, :], jnp.inf, d2)
        cmin = jnp.min(d2, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        carg = jnp.min(
            jnp.where(d2 == cmin[:, None], cols, cn), axis=1
        ) + b0
        # Strict < keeps the earlier chunk's (lower) index on exact ties;
        # in-chunk carg is already the lowest tied column.
        better = cmin < bd2
        return (
            jnp.where(better, cmin, bd2),
            jnp.where(better, carg, bidx),
        ), None

    (_, bidx), _ = jax.lax.scan(
        body,
        (
            jnp.full((b,), jnp.inf, dtype=jnp.float32),
            jnp.zeros((b,), dtype=jnp.int32),
        ),
        (rch, r2ch, base),
    )
    return bidx


def _band_refine_rows(q_bad, q2_bad, t12, t3, refs_t, r2h_t, delta,
                      tile_n, n_total):
    """Band-limited refine of uncertified rows: a direct-f32 rescan of each
    row's TOP-2 tiles (winner's tile + phase-1's second-best tile),
    certified by the third-best tile min. Traced inside _expansion_drain
    (round 4: the earlier standalone jit cost a host round trip — qpack
    upload + a second ~35 ms tunnel fetch — per drain).

    Replaces (for ~all uncertified rows) the full 1M-point FusedBruteForce
    rescan — the xplane r4 decomposition priced that at ~102 ms device per
    8K-row bucket vs ~29 ms here (the 2-tile gather is ~0.5 MB/row).

    Soundness: any point OUTSIDE the two gathered tiles lies in a tile
    whose phase-1 min is >= t3 (the third-smallest), so its true expansion
    value is >= t3 - delta. The gathered winner's true value is
    <= e_w + delta (e_w = d2/2 - |q|^2/2 in f32 direct arithmetic; delta
    bounds the 96-term phase-1 accumulation, strictly wider than this
    16-term direct form). ``t3 > e_w + 2*delta`` therefore proves no
    outside point can beat OR TIE the winner; within the gathered set the
    scan is the contract's own direct-f32 arithmetic with an explicit
    lowest-index tie-break, so certified rows match FusedBruteForce
    exactly (v0-v9 family tie-break contract). Exact ties straddling the
    band (three tied tiles) fail the certificate — as they must — and
    fall through to the full scan. With n_tiles <= 2 everything is
    gathered and t3 stays +inf, so the bound passes vacuously — correct.

    q_bad (B, kp) f32 zero-padded; q2_bad (B,) f32 |q|^2; t12 (B, 2) i32
    [winner tile, second-best tile]; t3 (B,) f32 third-best tile min;
    refs_t (n_sub, ts, kp) / r2h_t (n_sub, ts) — the engine's phase-2
    staging, re-viewed at tile granularity (free reshape). Returns
    (idx (B,) i32, ok (B,) bool).
    """
    n_tiles = refs_t.shape[0] * refs_t.shape[1] // tile_n
    refs_tiles = refs_t.reshape(n_tiles, tile_n, -1)
    r2h_tiles = r2h_t.reshape(n_tiles, tile_n)
    b = q_bad.shape[0]
    # Chunk the (mc, 2, tile_n, kp) gather to bound the temporary — the
    # factor 2 counts BOTH gathered tiles, keeping the per-step gather at
    # the same ~2M-point bound phase 2 uses for its single-subtile gather.
    mc = min(b, max(_SUBLANE, ((1 << 21) // (2 * tile_n)) // _SUBLANE * _SUBLANE))
    nchunks = b // mc if b % mc == 0 else b // mc + 1
    bp = nchunks * mc
    if bp != b:
        q_bad = jnp.pad(q_bad, ((0, bp - b), (0, 0)))
        q2_bad = jnp.pad(q2_bad, (0, bp - b))
        t12 = jnp.pad(t12, ((0, bp - b), (0, 0)))
        t3 = jnp.pad(t3, (0, bp - b))

    def step(args):
        qk, q2k, tk, t3k = args
        rsel = jnp.take(refs_tiles, tk, axis=0)       # (mc, 2, tile_n, kp)
        r2sel = jnp.take(r2h_tiles, tk, axis=0)       # (mc, 2, tile_n)
        d2 = jnp.sum((rsel - qk[:, None, None, :]) ** 2, axis=3)
        d2 = jnp.where(jnp.isinf(r2sel), jnp.inf, d2)  # padding never wins
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        ids = tk[:, :, None] * tile_n + cols          # global ids
        d2f = d2.reshape(d2.shape[0], -1)
        idf = ids.reshape(d2.shape[0], -1)
        wmin = jnp.min(d2f, axis=1)
        # lowest global index among the direct-f32 minima
        warg = jnp.min(jnp.where(d2f == wmin[:, None], idf, n_total), axis=1)
        e_w = 0.5 * wmin - 0.5 * q2k
        ok = t3k > e_w + 2.0 * delta
        return warg.astype(jnp.int32), ok

    idx, ok = jax.lax.map(
        step,
        (
            q_bad.reshape(nchunks, mc, -1),
            q2_bad.reshape(nchunks, mc),
            t12.reshape(nchunks, mc, 2),
            t3.reshape(nchunks, mc),
        ),
    )
    return idx.reshape(-1)[:b], ok.reshape(-1)[:b]


class MXUExpansion:
    """Prepare-once / query-many engine for the triple-bf16 MXU path.

    Default tiles are (1024, 4096): reference streaming costs ceil(m/tile_m)
    HBM passes over the (deduplicated, r4) 96 MB rc split stack at 1M refs,
    so tall query tiles win; with the two-phase kernel carrying only six
    (tm, 1) vectors across the grid, wide ref tiles cut grid steps 8x with
    no epilogue VMEM growth (ids stay at ts=256 subtile granularity, so
    the phase-2 gather does not widen). Real-chip A/B of the production
    single-jit path at k=16, m=10K, n=1M (benchmarks/drive_r3_v9_tiles.py,
    one process, fetch floor ~35 ms included): (1024, 512) 72.5 ms,
    (2048, 1024) 70.2, (1024, 2048) 67.8, (1024, 4096) 64.2 — all at
    recall 1.0, cert_frac 0.9835. The r4 xplane decomposition puts the
    phase-1 kernel at 15.8-16.0 ms per 10K-query batch, ~88% of the
    charged-flop MXU roofline (the 96-wide bf16 contraction is billed
    ceil(96/128) systolic passes: 2*m*128*n / 197 TFLOPS = 13.9 ms) with
    the rc stream fully hidden under compute — the phase-1 floor is the
    MXU, not HBM."""

    def __init__(self, refs, tile_m: int | None = None,
                 tile_n: int | None = None, tile_s: int | None = None):
        tile_m = 1024 if tile_m is None else tile_m
        tile_n = 4096 if tile_n is None else tile_n
        refs = np.asarray(refs, dtype=np.float32)
        self.refs = refs
        self.n, self.k = refs.shape
        # Ids transit as two f32-exact halves (hi = id // 4096 < 2^19,
        # lo < 2^12), so the bound is physical: device staging costs
        # ~(192 + 64) B/point at k=16 (bf16 splits + f32 phase-2 tiles) —
        # n = 2^25 is ~8.6 GB of a v5e's 16 GB HBM.
        if self.n >= 1 << 25:
            raise ValueError("MXUExpansion supports n < 2^25 (HBM staging)")
        self.tile_m = tile_m
        # The contraction axis concatenates three bf16 splits twice each;
        # per-split k pads to the sublane width (zero coordinates on both
        # sides leave distances and q.r unchanged), so kc = 6*kp is a
        # multiple of 16 — the bf16 memref tiling.
        self.kp = layouts.round_up(self.k, _SUBLANE)
        n_pad = layouts.round_up(self.n, max(tile_n, _LANE))
        self.tile_n = min(tile_n, n_pad)
        # Phase-2 gather granularity: ids are carried per ts-wide subtile,
        # so big phase-1 tiles don't inflate the phase-2 gather. For a
        # tile_n that ts doesn't divide (e.g. 768), fall back to per-tile
        # ids (ts = tile_n) — correct, just a wider gather. Default 256
        # from the r4 real-chip A/B (W=32 drain, same process): ts=256
        # 26.4 ms/batch vs ts=512 28.1 (halved phase-2 gather traffic);
        # ts=128 is REJECTED by the v5e compiler (ns=32 epilogue: scoped
        # vmem 22.3M > 16M).
        ts = 256 if tile_s is None else tile_s
        self.ts = ts if self.tile_n % ts == 0 else self.tile_n
        r = np.zeros((n_pad, self.kp), dtype=np.float32)
        r[: self.n, : self.k] = refs
        rh, rm, rl = _split_bf16x3(jnp.asarray(r))
        rc = _stack_r(jnp.transpose(rh), jnp.transpose(rm), jnp.transpose(rl))
        self.rc = jax.device_put(rc)  # (3*kp, n_pad) bf16, deduplicated
        # Distance-domain padding: +inf half-norms for padded columns — they
        # can never win for any query, with no coordinate-range assumption.
        r2h = np.full((1, n_pad), np.inf, dtype=np.float32)
        r2h[0, : self.n] = (
            0.5 * (refs.astype(np.float64) ** 2).sum(axis=1)
        ).astype(np.float32)
        self.r2h = jax.device_put(jnp.asarray(r2h))
        # Phase-2 staging: raw f32 reference tiles + half-norms, tiled at
        # the subtile width so a winning subtile id addresses one gather row.
        n_sub = n_pad // self.ts
        self.refs_t = jax.device_put(
            jnp.asarray(r.reshape(n_sub, self.ts, self.kp))
        )
        self.r2h_t = jax.device_put(
            jnp.asarray(np.ascontiguousarray(r2h.reshape(n_sub, self.ts)))
        )
        self._r2_max = 2.0 * float(np.max(r2h[0, : self.n])) if self.n else 0.0
        # Per-dispatch query-row cap (see _packed_staged): a 320K-row
        # program compiles and runs on the real v5e; deeper monoliths are
        # chunked as compile-service robustness.
        self._m_cap = 1 << 19
        self._fallback: FusedBruteForce | None = None

    def stage_queries(self, queries) -> "StagedQueries":
        """Pre-stage a query set on device for the serving drain: the 5 MB+
        host->device upload and the host-side scale bound both move OUT of
        the timed region (xplane decomposition r4: the upload alone was
        ~18 ms/batch of the 46 ms W=8 drain — the single largest term).
        Mirrors CellListEngine.stage_queue's prepare-once protocol."""
        q_np = np.asarray(queries, dtype=np.float32)
        m, k = q_np.shape
        if k != self.k:
            raise ValueError(f"dimension mismatch: queries k={k}, refs k={self.k}")
        # Host-side scale bound (avoids a device round-trip pre-kernel).
        q2_max = float((q_np.astype(np.float64) ** 2).sum(axis=1).max()) \
            if m else 0.0
        delta = _DELTA_REL_PER_K * max(self.k, 1) * (q2_max + self._r2_max)
        return StagedQueries(q_np, jax.device_put(q_np), float(delta))

    def _packed_staged(self, st: "StagedQueries") -> np.ndarray:
        """-> packed (4, m) numpy [min1, idx_hi, idx_lo, cert] — the
        inspection path behind query_min_idx_cert (the serving drain is
        _drain_staged).

        Very deep drains are chunked into separate dispatches (~1 ms each
        through the tunnel) whose outputs are device-concatenated, so the
        host still pays ONE packed fetch — a compile-service robustness
        bound (a 320K-row program compiles; far bigger monoliths are
        untested against the remote helper's limits)."""
        m = st.q_np.shape[0]
        if m == 0:
            return np.zeros((4, 0), dtype=np.float32)
        cap = self._m_cap
        if m <= cap:
            return np.asarray(_expansion_query(
                st.q_dev, self.rc, self.r2h, self.refs_t, self.r2h_t,
                jnp.float32(st.delta), self.kp, self.tile_m, self.tile_n,
                self.ts, _interpret(),
            ))  # single host fetch
        packeds = [
            _expansion_query(
                st.q_dev[s : s + cap], self.rc, self.r2h, self.refs_t,
                self.r2h_t, jnp.float32(st.delta), self.kp, self.tile_m,
                self.tile_n, self.ts, _interpret(),
            )
            for s in range(0, m, cap)
        ]
        return np.asarray(jnp.concatenate(packeds, axis=1))

    def _maxbad(self, m: int) -> int:
        """Static tier-1 bucket for the in-program band refine: sized
        ~1.55x the measured uncertified fraction (~1.65% at k=16,
        1M-uniform density), capped so the always-compiled gather stays
        ~2 GB of HBM traffic worst case. Bad rows beyond the bucket come
        back sign-encoded and are re-answered by the host full scan —
        sound on any data, just slower on adversarial tie floods."""
        return min(1 << 14, layouts.pow2_at_least(max(128, m // 40)))

    def _maxbad2(self, m: int) -> int:
        """Static tier-2 bucket for the in-program full scan of band-
        refine-refused rows (straddling ties): measured ~70 per 640K-row
        k=16 drain at 1M-uniform density (NUMBERS.md), sized ~4x that and
        capped so the always-compiled scan stays ~50 GFLOP worst case.
        Overflow rows stay sign-encoded for the host full scan — sound on
        adversarial tie floods, just slower."""
        return min(1 << 11, layouts.pow2_at_least(max(64, m // 2048)))

    def _drain_staged(self, st: "StagedQueries") -> np.ndarray:
        """-> signed (m,) int32: ``idx`` certified-final, ``-idx - 1``
        needs the host full scan. ONE dispatch + ONE 4 B/row fetch —
        the (4, m) f32 packed fetch this replaces cost ~25 ms/MB through
        the tunnel (~5 ms/batch at the k=16 W=32 drain) and the refine's
        host round trip another ~2.3 (xplane + wall decomposition, r4).
        Deep drains chunk like _packed_staged; each chunk runs its own
        in-program refine (self-contained rows), outputs are
        device-concatenated, one fetch."""
        m = st.q_np.shape[0]
        if m == 0:
            return np.zeros((0,), dtype=np.int32)
        cap = self._m_cap
        if m <= cap:
            return np.asarray(_expansion_drain(
                st.q_dev, self.rc, self.r2h, self.refs_t, self.r2h_t,
                jnp.float32(st.delta), self.kp, self.tile_m, self.tile_n,
                self.ts, self._maxbad(m), self._maxbad2(m), _interpret(),
            ))
        outs = [
            _expansion_drain(
                st.q_dev[s : s + cap], self.rc, self.r2h, self.refs_t,
                self.r2h_t, jnp.float32(st.delta), self.kp, self.tile_m,
                self.tile_n, self.ts,
                self._maxbad(min(cap, m - s)),
                self._maxbad2(min(cap, m - s)), _interpret(),
            )
            for s in range(0, m, cap)
        ]
        return np.asarray(jnp.concatenate(outs))

    def _query_packed(self, queries) -> np.ndarray:
        return self._packed_staged(self.stage_queries(queries))

    @staticmethod
    def _unpack_idx(packed: np.ndarray) -> np.ndarray:
        # idx = hi*4096 + lo, both halves f32-exact (see _expansion_query).
        return (packed[1].astype(np.int64) * 4096
                + packed[2].astype(np.int64)).astype(np.int32)

    def query_min_idx_cert(self, queries):
        packed = self._query_packed(queries)
        return packed[0], self._unpack_idx(packed), packed[3] > 0.5

    def query(self, queries):
        """Exact 1-NN indices; uncertified queries re-answered by the
        direct-f32 fused scan (rare: expansion ties / duplicates) over a
        staged-once reference set.

        Graceful degradation (SURVEY.md §5 contract): if the expansion
        dispatch itself fails — e.g. a Mosaic block-shape rejection of a
        tile configuration on real hardware that the CPU interpreter
        accepted — the whole batch is answered by the exact fused scan
        instead of erroring out of the version."""
        return self.query_staged(self.stage_queries(queries))

    def query_staged(self, st: "StagedQueries"):
        """query() on a pre-staged query set (see stage_queries) — the
        serving drain path: per-request device work only, upload untimed.
        The drain program folds BOTH refine tiers in (_expansion_drain:
        tier-1 band rescan + tier-2 full scan of straddling ties); the
        host only re-answers sign-encoded rows (static-bucket overflow —
        adversarial tie floods) by the exact full scan."""
        try:
            signed = self._drain_staged(st)
        except ValueError:
            raise  # caller errors (shape mismatch) are not degradation
        except Exception as ex:  # pragma: no cover - backend-specific
            import sys

            print(f"[mxu_expansion] expansion dispatch failed "
                  f"({type(ex).__name__}); falling back to the exact fused "
                  f"scan", file=sys.stderr, flush=True)
            if self._fallback is None:
                self._fallback = FusedBruteForce(self.refs)
            return np.asarray(self._fallback.query(st.q_np)).astype(np.int32)
        idx = np.where(signed >= 0, signed, -signed - 1).astype(np.int32)
        bad = np.flatnonzero(signed < 0)
        if len(bad) == 0:
            return idx
        # Tier 2: full exact scan for rows the band could not certify
        # (exact or straddling ties — rare).
        if self._fallback is None:
            self._fallback = FusedBruteForce(self.refs)
        q_np = st.q_np[bad]
        bucket = layouts.pow2_at_least(max(len(bad), 8))
        if bucket != len(bad):  # shape-bucketed to bound recompiles
            q_np = np.pad(q_np, ((0, bucket - len(bad)), (0, 0)))
        idx[bad] = np.asarray(self._fallback.query(q_np))[: len(bad)]
        return idx


class StagedQueries:
    """A query set staged for MXUExpansion.query_staged: the host copy (for
    the exact-refine fallback), the device copy, and the pre-computed
    certificate band."""

    __slots__ = ("q_np", "q_dev", "delta")

    def __init__(self, q_np: np.ndarray, q_dev, delta: float):
        self.q_np = q_np
        self.q_dev = q_dev
        self.delta = delta


def nns_mxu_expansion(queries, refs, tile_m: int | None = None,
                      tile_n: int | None = None):
    """v9: triple-bf16 MXU expansion + band certificate + exact refine.

    Capability dispatch (SURVEY.md §5): k < 8 routes to the direct-f32
    fused kernel — at low k the VPU direct form is near its compute floor
    while 1M-density expansion-value gaps shrink below any sound error
    band (measured: cert coverage 24% at k=3 vs 97%+ at k >= 8), so the
    MXU path would mostly pay for its own fallback."""
    if refs.shape[1] < 8:
        # fused_fallback stages the refs via device_put first (the numpy->
        # jit-argument path costs ~10x on tunneled runtimes).
        from nns_tpu.kernels.pallas_fused import fused_fallback

        return np.asarray(fused_fallback(queries, refs))
    eng = MXUExpansion(refs, tile_m=tile_m, tile_n=tile_n)
    return eng.query(queries)
