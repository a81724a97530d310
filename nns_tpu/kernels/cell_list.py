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

Query (jit, static shapes):
  - bucket queries by supercell, argsort, scatter into a dense
    (G, Q_max, k) tensor;
  - one dense masked direct-distance scan per supercell — a batched
    (Q_max x R_max) fused VPU computation over ~n*(W+2*halo)^3/W^3/D^3
    candidates instead of n;
  - unscatter. Exactness certificate: a result is proven exact iff
    best_dist <= halo (every unscanned point is farther than ``halo``);
    queries failing it (probability e^-30-ish on uniform data; possible on
    adversarial data) fall back to the exact full scan.

Expected ~150x less distance work than brute force at 1M refs (uniform),
turning the 1M x 10K benchmark from ~36 ms to the low-ms regime.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from nns_tpu.kernels.layouts import PAD_SENTINEL


def _pow2_at_least(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class CellListEngine:
    """Prepare-once/query-many exact NN for k <= 3-ish low dims (k == 3 here,
    matching the octree family's domain; other k route to the fused kernel)."""

    def __init__(self, refs: np.ndarray, d_per_dim: int | None = None,
                 halo: float | None = None, max_candidates: int = 200_000):
        refs = np.ascontiguousarray(refs, dtype=np.float32)
        n, k = refs.shape
        if k != 3:
            raise ValueError("CellListEngine requires 3-D points")
        self.refs = refs
        self.n = n

        mn = refs.min(axis=0)
        mx = refs.max(axis=0)
        extent = np.maximum(mx - mn, 1e-6)
        if d_per_dim is None:
            d_per_dim = max(1, min(32, round((n / 2000.0) ** (1.0 / 3.0))))
        self.D = d_per_dim
        self.W = (extent / self.D).astype(np.float64)  # per-dim supercell width
        if halo is None:
            # ~4x the expected NN distance for uniform density in this box:
            # P(NN > halo) ~ exp(-n * (4/3) pi halo^3 / V) — negligible.
            volume = float(np.prod(extent))
            halo = 4.0 * (volume / max(n, 1)) ** (1.0 / 3.0) / 1.6
        self.halo = float(halo)
        self.mn = mn.astype(np.float64)

        # Halo membership: point p joins group g iff p is within halo of g's
        # box; per dim that is at most 2 consecutive supercell indices.
        rel = refs.astype(np.float64) - self.mn
        lo = np.clip(np.floor((rel - self.halo) / self.W).astype(np.int64), 0, self.D - 1)
        hi = np.clip(np.floor((rel + self.halo) / self.W).astype(np.int64), 0, self.D - 1)
        pairs_pt: list[np.ndarray] = []
        pairs_gid: list[np.ndarray] = []
        for dx in range(2):
            gx = np.where(dx == 0, lo[:, 0], hi[:, 0])
            vx = (dx == 0) | (hi[:, 0] != lo[:, 0])
            for dy in range(2):
                gy = np.where(dy == 0, lo[:, 1], hi[:, 1])
                vy = (dy == 0) | (hi[:, 1] != lo[:, 1])
                for dz in range(2):
                    gz = np.where(dz == 0, lo[:, 2], hi[:, 2])
                    vz = (dz == 0) | (hi[:, 2] != lo[:, 2])
                    valid = vx & vy & vz
                    gid = (gx * self.D + gy) * self.D + gz
                    pairs_pt.append(np.flatnonzero(valid))
                    pairs_gid.append(gid[valid])
        pt = np.concatenate(pairs_pt)
        gid = np.concatenate(pairs_gid)
        order = np.argsort(gid, kind="stable")  # within group: point ids ascend
        pt, gid = pt[order], gid[order]

        G = self.D ** 3
        counts = np.bincount(gid, minlength=G)
        r_max = int(counts.max()) if len(counts) else 1
        if r_max > max_candidates:
            raise ValueError(
                f"supercell halo overflow (R_max={r_max}): data too clustered "
                "for the cell-list engine — use the fused kernel or octree"
            )
        self.R_max = _pow2_at_least(max(r_max, 8))
        starts = np.concatenate([[0], np.cumsum(counts)])
        halo_pts = np.full((G, self.R_max, 3), PAD_SENTINEL, dtype=np.float32)
        halo_ids = np.zeros((G, self.R_max), dtype=np.int32)
        pos = np.arange(len(pt)) - starts[gid]
        halo_pts[gid, pos] = refs[pt]
        halo_ids[gid, pos] = pt.astype(np.int32)
        self.halo_pts = jax.device_put(jnp.asarray(halo_pts))
        self.halo_ids = jax.device_put(jnp.asarray(halo_ids))
        jax.block_until_ready((self.halo_pts, self.halo_ids))
        self.avg_candidates = float(counts.mean())

    # -- query ------------------------------------------------------------

    def _group_of(self, q: np.ndarray) -> np.ndarray:
        g = np.floor((q.astype(np.float64) - self.mn) / self.W).astype(np.int64)
        g = np.clip(g, 0, self.D - 1)
        return (g[:, 0] * self.D + g[:, 1]) * self.D + g[:, 2]

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("q_max", "g_total"))
    def _scan(q_sorted, sid_sorted, pos_sorted, halo_pts, halo_ids,
              q_max: int, g_total: int):
        m = q_sorted.shape[0]
        dense_q = jnp.full((g_total, q_max, 3), 0.0, dtype=jnp.float32)
        dense_q = dense_q.at[sid_sorted, pos_sorted].set(q_sorted)

        # Dense per-supercell direct-distance scan; XLA fuses the broadcast,
        # square, sum and min so the (G, Q_max, R_max) tensor never fully
        # materializes in HBM.
        diff = dense_q[:, :, None, :] - halo_pts[:, None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)            # (G, Q_max, R_max)
        best = jnp.min(d2, axis=-1)                   # (G, Q_max)
        arg = jnp.argmin(d2, axis=-1)                 # first hit = lowest id
        idx = jnp.take_along_axis(halo_ids, arg, axis=1)

        out_d = best[sid_sorted, pos_sorted]
        out_i = idx[sid_sorted, pos_sorted]
        return out_d, out_i

    def query_with_flags(self, queries: np.ndarray):
        q = np.ascontiguousarray(queries, dtype=np.float32)
        m = q.shape[0]
        sid = self._group_of(q)
        order = np.argsort(sid, kind="stable")
        sid_s = sid[order]
        counts = np.bincount(sid_s, minlength=self.D ** 3)
        q_max = _pow2_at_least(max(int(counts.max()), 1))
        pos = np.arange(m) - np.concatenate([[0], np.cumsum(counts)])[sid_s]
        d2, idx = CellListEngine._scan(
            jnp.asarray(q[order]), jnp.asarray(sid_s.astype(np.int32)),
            jnp.asarray(pos.astype(np.int32)), self.halo_pts, self.halo_ids,
            q_max, self.D ** 3,
        )
        d2 = np.asarray(d2)
        idx = np.asarray(idx)
        inv = np.empty(m, dtype=np.int64)
        inv[order] = np.arange(m)
        d2, idx = d2[inv], idx[inv]
        ok = d2 <= np.float32(self.halo) ** 2  # exactness certificate
        return idx, ok

    def query(self, queries: np.ndarray) -> np.ndarray:
        idx, ok = self.query_with_flags(queries)
        idx = np.array(idx)
        if not ok.all():
            from nns_tpu.kernels.pallas_fused import nns_fused

            bad = np.flatnonzero(~ok)
            idx[bad] = np.asarray(nns_fused(
                np.ascontiguousarray(queries, dtype=np.float32)[bad], self.refs
            ))
        return idx.astype(np.int32)


def nns_cell_list(queries, refs, d_per_dim: int | None = None) -> np.ndarray:
    """One-shot wrapper; non-3-D or tiny reference sets route to the fused
    kernel (capability-dispatch contract, SURVEY.md §5)."""
    if refs.shape[1] != 3 or refs.shape[0] < 4096:
        from nns_tpu.kernels.pallas_fused import nns_fused

        return np.asarray(nns_fused(queries, refs))
    try:
        eng = CellListEngine(np.asarray(refs), d_per_dim=d_per_dim)
    except ValueError:
        from nns_tpu.kernels.pallas_fused import nns_fused

        return np.asarray(nns_fused(queries, refs))
    return eng.query(np.asarray(queries))
