"""MXU two-pass exact brute force — the performance flagship (v9 analog).

The reference's fastest brute force (v9, core.cu:856-1058) is its fused
VPU-style kernel with a fully unrolled reduction. On TPU the same direct
per-dimension arithmetic is VPU-bound (~10 vector-op visits per query x ref
pair). This kernel moves the dominant work to the MXU instead:

Pass 1 (Pallas, MXU): squared distances via the augmented-vector expansion
  a = [-2q, |q|^2, 1, 0..]  .  b = [r, 1, |r|^2, 0..]   (contraction on MXU)
  = |q - r|^2, computed tile-by-tile with HIGHEST precision, reduced to
  per-(query, ref-tile) minima B[m, T] with a single VPU min visit per
  element. The full distance matrix never exists; B is m x (n / TILE_N).

Pass 2 (XLA, exact): the expansion has absolute error <= delta (bounded
  below), so every tile whose minimum lies within delta of the global
  minimum may hold the true NN. Take the top-L candidate tiles per query,
  gather their reference points, and recompute distances with the DIRECT
  (q - r)^2 formula — the same arithmetic class as the oracle — then argmin
  with lowest-index tie-break. Soundness: if more than L tiles fall within
  delta (probability ~1e-4 per query on uniform data), the query is flagged
  and re-answered by the direct fused kernel. The returned neighbor is
  therefore always a true f32 nearest neighbor: recall@1 = 1.0.

Cost model (1M refs x 10K queries, k=3, v5e): MXU pass ~2.5 ms + one VPU
min visit ~2.6 ms + top-k/gather/refine ~2-3 ms => ~4x faster than the
all-VPU direct kernel (vs ~36 ms measured), while staying exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nns_tpu.kernels import layouts
from nns_tpu.kernels.pallas_fused import _interpret, nns_fused

_LANE = 128
_SUBLANE = 8
_EPS32 = 1.2e-7


def _aug_dim(k: int) -> int:
    return layouts.round_up(k + 2, _SUBLANE)


def _delta(k: int, scale: float) -> float:
    """Sound upper bound (with margin) on |expansion - true| distance error:
    a few ulps of the largest partial term, ~ (k+2) * eps32 * k * scale^2,
    widened 16x for accumulation order and the bf16-pass decomposition."""
    return 16.0 * (k + 2) * _EPS32 * max(k, 1) * scale * scale


def _min_pass_kernel(q_ref, r_ref, out_ref):
    # q_ref: (TM, A), r_ref: (A, TN) -> per-row tile minimum (1, TM, 1).
    d = jnp.dot(
        q_ref[:], r_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = jnp.min(d, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def _tile_mins(q_aug, r_aug, tile_m: int, tile_n: int, interpret: bool):
    """B[m_pad, T]: min expansion distance per (query, ref tile)."""
    m_pad, a = q_aug.shape
    n_pad = r_aug.shape[1]
    tm = min(tile_m, m_pad)
    n_tiles = n_pad // tile_n
    out = pl.pallas_call(
        _min_pass_kernel,
        grid=(pl.cdiv(m_pad, tm), n_tiles),
        in_specs=[
            pl.BlockSpec((tm, a), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, 1), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, m_pad, 1), jnp.float32),
        interpret=interpret,
    )(q_aug, r_aug)
    return out[:, :, 0].T  # (m_pad, T)


@functools.partial(jax.jit, static_argnames=("top_l", "tile_n", "interpret", "tile_m"))
def _turbo_query(queries, r_aug, ref_blocks, delta, tile_m: int, tile_n: int,
                 top_l: int, interpret: bool):
    """Returns (idx[m] i32, ok[m] bool). ok=False => needs exact fallback."""
    m, k = queries.shape
    n_tiles = ref_blocks.shape[0]

    # Augmented queries: [-2q, |q|^2, 1, 0...] matching r_aug's [r, 1, |r|^2].
    a = r_aug.shape[0]
    q2 = jnp.sum(queries * queries, axis=1, keepdims=True)
    ones = jnp.ones((m, 1), dtype=jnp.float32)
    q_aug = jnp.concatenate([-2.0 * queries, q2, ones], axis=1)
    q_aug = jnp.pad(q_aug, ((0, layouts.round_up(m, _SUBLANE) - m), (0, a - (k + 2))))

    B = _tile_mins(q_aug, r_aug, tile_m, tile_n, interpret)[:m]  # (m, T)

    M = jnp.min(B, axis=1, keepdims=True)
    neg_top, cand = jax.lax.top_k(-B, top_l)  # cand: (m, L) tile ids, best first
    within = B <= M + delta
    ok = jnp.sum(within, axis=1) <= top_l

    # Exact refinement: direct distances over the candidate tiles' points.
    blocks = ref_blocks[cand]                  # (m, L, TN, k)
    diff = blocks - queries[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)         # (m, L, TN) — direct formula
    gidx = cand[:, :, None] * tile_n + jnp.arange(tile_n)[None, None, :]
    d2 = d2.reshape(m, -1)
    gidx = gidx.reshape(m, -1)
    dmin = jnp.min(d2, axis=1, keepdims=True)
    big = jnp.iinfo(jnp.int32).max
    idx = jnp.min(jnp.where(d2 == dmin, gidx, big), axis=1)  # lowest index on ties
    return idx.astype(jnp.int32), ok


class MXUBruteForce:
    """Prepare-once/query-many engine for the MXU two-pass exact kernel."""

    def __init__(self, refs, tile_m: int = 512, tile_n: int = 512, top_l: int = 4):
        refs = np.ascontiguousarray(refs, dtype=np.float32)
        self.n, self.k = refs.shape
        self.tile_m, self.tile_n, self.top_l = tile_m, tile_n, top_l
        self._scale_refs = float(np.abs(refs).max()) if refs.size else 1.0
        self.refs = refs

        n_pad = layouts.round_up(self.n, tile_n)
        a = _aug_dim(self.k)
        r = np.full((n_pad, self.k), layouts.PAD_SENTINEL, dtype=np.float32)
        r[: self.n] = refs
        r_aug = np.zeros((n_pad, a), dtype=np.float32)
        r_aug[:, : self.k] = r
        r_aug[:, self.k] = 1.0
        r_aug[:, self.k + 1] = np.sum(r.astype(np.float64) ** 2, axis=1).astype(np.float32)
        self.r_aug = jax.device_put(jnp.asarray(r_aug.T))          # (A, n_pad)
        self.ref_blocks = jax.device_put(
            jnp.asarray(r.reshape(n_pad // tile_n, tile_n, self.k))
        )
        jax.block_until_ready((self.r_aug, self.ref_blocks))

    def query_with_flags(self, queries):
        q = jnp.asarray(queries, dtype=jnp.float32)
        scale = max(self._scale_refs, float(np.abs(np.asarray(queries)).max() or 1.0), 1.0)
        delta = jnp.float32(_delta(self.k, scale))
        return _turbo_query(
            q, self.r_aug, self.ref_blocks, delta,
            self.tile_m, self.tile_n, self.top_l, _interpret(),
        )

    def query(self, queries) -> np.ndarray:
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        idx, ok = self.query_with_flags(queries)
        idx = np.array(idx)  # writable copy (fallback may overwrite entries)
        ok = np.asarray(ok)
        if not ok.all():
            # Ambiguity fallback (> top_l tiles within the error band):
            # re-answer those queries with the exact direct kernel.
            bad = np.flatnonzero(~ok)
            idx[bad] = np.asarray(nns_fused(queries[bad], self.refs))
        return idx


def nns_mxu_turbo(queries, refs, tile_m: int = 512, tile_n: int = 512, top_l: int = 4):
    """One-shot wrapper. Small reference sets (fewer tiles than top_l + 1)
    route straight to the direct fused kernel."""
    n = refs.shape[0]
    if n <= (top_l + 1) * tile_n:
        return nns_fused(queries, refs)
    return MXUBruteForce(refs, tile_m, tile_n, top_l).query(queries)
