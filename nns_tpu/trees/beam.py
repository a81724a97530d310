"""Beam frontier search — the TPU-native device tree query (v11/v13 engine).

Round 1 ran the reference's *intended* GPU traversals (core.cu:1305-1345 and
1717-1794, both no-ops there) as literal batched stack machines: one
`lax.while_loop` step popped one tree node per query. Correct, but
latency-bound by construction — every step is a serialized chain of gathers
and (m, cap) one-hot stack scatters, and the loop runs for max-over-queries
visit counts (measured round 1: 781 ms / 2,601 ms per 1,024 queries at 1M
refs for KD/octree — 100-500x slower than the same algorithm on host numpy,
see benchmarks/PERF_NOTES.md). A vector machine wants tree search DENSE, not
pointer-chased. This module is that redesign; both tree families share it.

Build (host, from an already-built KDTree/Octree):
  - FRONTIER: a maximal antichain of subtrees each owning <= cap points
    (oversized depth-limited octree leaves are chunked into several buckets).
    The tree's own partition geometry defines the buckets — this *is* the
    KD/octree, queried breadth-first instead of node-at-a-time.
  - per-bucket tight bounding boxes over the member points (tighter than the
    splitting planes / cubes, still exact lower bounds);
  - one dense (F, cap, k) point tensor per tree, padded by replicating the
    bucket's first member — padding with REAL points keeps every path exact
    for any data range (a far-sentinel coordinate cannot);
  - the KD-tree stores one point at every internal node (the reference's
    implicit-heap design, core.cu:1080); the 2^T - 1 points living above the
    frontier form an EXTRAS block scanned densely by every query.

Query — one jitted dispatch, no scatters, no data-dependent control flow:
  1. lb[m, F] = distance from each query to each bucket's box (dense VPU);
  2. top-(beam+1) nearest buckets per query (lax.top_k);
  3. gather the beam buckets' (cap, k) blocks, exact direct-form (q - r)^2
     distances, carried argmin (+ the extras block);
  4. exactness certificate: best * (1 + 1e-5) <= lb of the (beam+1)-th
     bucket — every unscanned point lies in a bucket at least that far, so
     the scanned winner is a true nearest neighbor (the margin covers f32
     rounding of lb vs the direct form; ties return any true NN, like all
     traversal engines here). Uncertified queries fall back to the exact
     fused scan.

On uniform data the beam certifies ~all queries (the home bucket plus a
handful of box neighbors contain the NN ball), so per-query work drops from
n points to ~beam * cap + extras, with every op a dense batched tensor op.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from nns_tpu.kernels.layouts import round_up

_CHUNK_M = 1024   # queries per jitted dispatch (bounds gather/candidate VMEM)
_MAX_F = 65536    # bucket-count guard: cap doubles until the frontier fits
# Certificate margin: lb and the direct form are both f32 sums of <= 16
# squared terms (<= ~4 ulp relative each); 1e-5 relative dominates both.
_CERT_MARGIN = 1.0 + 1e-5


@functools.partial(jax.jit, static_argnames=("beam",))
def _beam_query(q, lo, hi, pts, ids, extras, extras_ids, beam: int):
    """q (m, k); lo/hi (F, k); pts (F, cap, k); ids (F, cap); extras (E, k).
    Returns (best_idx (m,) i32, certified (m,) bool)."""
    m, k = q.shape
    f_total = lo.shape[0]
    cap = pts.shape[1]

    # 1. Dense box lower bounds: per-dim accumulation keeps the working set
    # at (m, F) instead of materializing an (m, F, k) gap tensor.
    lb = jnp.zeros((m, f_total), dtype=jnp.float32)
    for d in range(k):
        qd = q[:, d : d + 1]
        gap = jnp.maximum(jnp.maximum(lo[None, :, d] - qd, qd - hi[None, :, d]), 0.0)
        lb = lb + gap * gap

    # 2. Nearest beam buckets + the (beam+1)-th bound = certificate threshold.
    nb = min(beam, f_total)
    kk = min(beam + 1, f_total)
    neg, bids = jax.lax.top_k(-lb, kk)
    sel = bids[:, :nb]                                   # (m, nb)
    thr = -neg[:, nb] if f_total > nb else jnp.full((m,), jnp.inf, jnp.float32)

    # 3. Exact direct-form scan of the selected buckets (+ shared extras).
    cand = pts[sel]                                      # (m, nb, cap, k) gather
    cids = ids[sel]                                      # (m, nb, cap)
    diff = q[:, None, None, :] - cand
    d2 = jnp.sum(diff * diff, axis=3).reshape(m, nb * cap)
    flat_ids = cids.reshape(m, nb * cap)
    if extras.shape[0]:
        de = jnp.zeros((m, extras.shape[0]), dtype=jnp.float32)
        for d in range(k):
            dd = q[:, d : d + 1] - extras[None, :, d]
            de = de + dd * dd
        d2 = jnp.concatenate([d2, de], axis=1)
        flat_ids = jnp.concatenate(
            [flat_ids, jnp.broadcast_to(extras_ids[None, :], (m, extras.shape[0]))],
            axis=1,
        )
    pos = jnp.argmin(d2, axis=1)
    rows = jnp.arange(m)
    best = d2[rows, pos]
    idx = flat_ids[rows, pos]

    # 4. Certificate (see module docstring). best == thr == 0 certifies
    # soundly: a zero-distance winner ties any unscanned duplicate.
    ok = best * _CERT_MARGIN <= thr
    return idx.astype(jnp.int32), ok


@dataclasses.dataclass
class BeamIndex:
    """Device-resident frontier of one tree: query-many exact NN search."""

    refs: np.ndarray          # (n, k) original points (fallback scans use it)
    lo: jnp.ndarray           # (F, k) bucket box lower corners
    hi: jnp.ndarray           # (F, k)
    pts: jnp.ndarray          # (F, cap, k)
    ids: jnp.ndarray          # (F, cap) i32
    extras: jnp.ndarray       # (E, k) — points stored above the frontier
    extras_ids: jnp.ndarray   # (E,) i32

    @classmethod
    def from_groups(
        cls,
        refs: np.ndarray,
        grouped_ids: np.ndarray,   # point ids concatenated bucket-by-bucket
        counts: np.ndarray,        # (F,) members per bucket
        extras_ids: np.ndarray,    # ids stored above the frontier (may be empty)
    ) -> "BeamIndex":
        refs = np.ascontiguousarray(refs, dtype=np.float32)
        f_total, k = len(counts), refs.shape[1]
        cap = max(8, round_up(int(counts.max()) if f_total else 1, 8))
        starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

        # Pad every bucket by replicating its first member (point 0 for empty
        # buckets) — replicas are real points, so scans stay exact; they can
        # only tie the true NN, never beat it.
        first = np.zeros(f_total, dtype=np.int64)
        nonempty = counts > 0
        first[nonempty] = grouped_ids[starts[:-1][nonempty]]
        ids = np.broadcast_to(first[:, None], (f_total, cap)).astype(np.int32).copy()
        bucket_of = np.repeat(np.arange(f_total), counts)
        pos = np.arange(len(grouped_ids)) - np.repeat(starts[:-1], counts)
        ids[bucket_of, pos] = grouped_ids
        pts = refs[ids]                                    # (F, cap, k)

        # Tight boxes from the member points. grouped_ids is dense, so
        # consecutive NONEMPTY starts bound exactly one bucket's rows.
        lo = np.full((f_total, k), np.inf, dtype=np.float32)
        hi = np.full((f_total, k), -np.inf, dtype=np.float32)
        if nonempty.any():
            gp = refs[grouped_ids]
            ne_starts = starts[:-1][nonempty]
            lo[nonempty] = np.minimum.reduceat(gp, ne_starts, axis=0)
            hi[nonempty] = np.maximum.reduceat(gp, ne_starts, axis=0)

        extras_ids = np.asarray(extras_ids, dtype=np.int32)
        extras = refs[extras_ids] if len(extras_ids) else np.zeros((0, k), np.float32)
        dev = jax.device_put(
            (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(pts),
             jnp.asarray(ids), jnp.asarray(extras), jnp.asarray(extras_ids))
        )
        jax.block_until_ready(dev)
        return cls(refs, *dev)

    # -- query --------------------------------------------------------------

    def query_with_flags(self, queries: np.ndarray, beam: int = 8):
        """(idx, certified) over query chunks; certified=False rows need an
        exact fallback (query_exact does it)."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        m = q.shape[0]
        idx = np.empty(m, dtype=np.int32)
        ok = np.empty(m, dtype=bool)
        step = min(_CHUNK_M, m) or 1
        for s in range(0, m, step):
            chunk = q[s : s + step]
            pad = step - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            ci, co = _beam_query(
                jnp.asarray(chunk), self.lo, self.hi, self.pts, self.ids,
                self.extras, self.extras_ids, beam,
            )
            valid = step - pad
            idx[s : s + valid] = np.asarray(ci)[:valid]
            ok[s : s + valid] = np.asarray(co)[:valid]
        return idx, ok

    def query_exact(self, queries: np.ndarray, beam: int = 8) -> np.ndarray:
        """Exact answers: beam pass, then a wider retry for a dense
        uncertified tail, then the exact fused scan for survivors."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        idx, ok = self.query_with_flags(q, beam)
        bad = np.flatnonzero(~ok)
        if len(bad) > max(32, 0.02 * len(q)) and self.lo.shape[0] > 4 * beam:
            # A structurally hard batch (clustered data, box-boundary
            # queries): one wider beam usually certifies most of the tail
            # for far less than the tail's full scans.
            ri, ro = self.query_with_flags(q[bad], beam * 4)
            idx[bad] = ri
            ok[bad] = ro
            bad = np.flatnonzero(~ok)
        if len(bad):
            from nns_tpu.kernels.pallas_fused import fused_fallback

            idx[bad] = np.asarray(fused_fallback(q[bad], self.refs))
        return idx


# ---------------------------------------------------------------------------
# Frontier extraction per tree family
# ---------------------------------------------------------------------------


def kd_beam_index(tree, cap_target: int = 512) -> BeamIndex:
    """Frontier of the implicit-heap KD-tree: all subtrees rooted at heap
    depth T (F = 2^T buckets, T chosen so buckets hold ~cap_target points);
    the 2^T - 1 median points stored at shallower nodes become extras."""
    node_point = np.asarray(tree.node_point)
    slots = np.flatnonzero(node_point >= 0).astype(np.int64)
    pids = node_point[slots].astype(np.int64)
    n = len(pids)
    t = 0
    while (1 << t) * cap_target < n and (1 << t) < _MAX_F:
        t += 1
    # Heap depth of each slot, exactly: slot s = mantissa * 2^(depth+1).
    depth = (np.frexp(slots.astype(np.float64))[1] - 1).astype(np.int64)
    is_extra = depth < t
    extras_ids = pids[is_extra]
    shift = depth[~is_extra] - t
    bucket = (slots[~is_extra] >> shift) - (1 << t)
    order = np.argsort(bucket, kind="stable")
    grouped = pids[~is_extra][order].astype(np.int32)
    counts = np.bincount(bucket, minlength=1 << t)
    return BeamIndex.from_groups(tree.refs, grouped, counts, extras_ids)


def octree_beam_index(tree, cap_target: int = 512) -> BeamIndex:
    """Frontier of the linearized octree: expand nodes while count > cap;
    depth-limited leaves larger than cap are chunked into several buckets
    (each chunk gets its own tight box). Octrees store points only at
    leaves, so there are no extras."""
    children, start, count = tree.children, tree.start, tree.count
    order = np.asarray(tree.order, dtype=np.int64)
    is_leaf = children.max(axis=1) < 0

    cap = cap_target
    while True:
        seg_start: list[int] = []
        seg_count: list[int] = []
        stack = [0]
        while stack:
            nid = stack.pop()
            c = int(count[nid])
            if c == 0:
                continue
            if c <= cap or is_leaf[nid]:
                s = int(start[nid])
                for off in range(0, c, cap):   # chunk oversized leaves
                    seg_start.append(s + off)
                    seg_count.append(min(cap, c - off))
            else:
                stack.extend(int(ch) for ch in children[nid] if ch >= 0)
        if len(seg_start) <= _MAX_F or cap >= len(order):
            break
        cap *= 2

    s_arr = np.asarray(seg_start, dtype=np.int64)
    c_arr = np.asarray(seg_count, dtype=np.int64)
    total = int(c_arr.sum())
    offs = np.arange(total) - np.repeat(np.cumsum(c_arr) - c_arr, c_arr)
    grouped = order[np.repeat(s_arr, c_arr) + offs].astype(np.int32)
    return BeamIndex.from_groups(
        tree.refs, grouped, c_arr, np.zeros(0, dtype=np.int32)
    )
