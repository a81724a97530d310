"""XLA-level brute force: the v1/v2 analogs.

Reference:
- v1 (core.cu:56-152): kernel 1 materializes the full m x n distance matrix,
  kernel 2 argmin-reduces each row with a shared-memory butterfly.
- v2 (core.cu:154-200): same distance kernel, argmin via thrust::min_element.

TPU design: the "two kernels" become two XLA ops. ``nns_distance_matrix``
computes distances by per-dimension broadcast (VPU; identical arithmetic to
the f32 scan, so exact), materializing the (m, n) matrix in HBM — the
pedagogical baseline the fused Pallas kernel (v3+) eliminates.
``nns_expansion_matmul`` uses the MXU:  d2 = |q|^2 - 2 q r^T + |r|^2, a
(m,k)@(k,n) matmul with HIGHEST precision — faster for large k, but the
expansion loses ~1e-7 absolute precision on values; callers needing strict
exactness route through the direct-formula paths (see SURVEY.md §7 hard
part 4). Both argmin along rows with XLA's reduction (lowest-index ties).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("chunk_m",))
def _distance_matrix_idx(queries: jnp.ndarray, refs: jnp.ndarray, chunk_m: int = 0) -> jnp.ndarray:
    # Per-dimension broadcast accumulation: XLA fuses the subtract/square/add
    # chain, so only the (m, n) matrix is materialized, never (m, n, k).
    m, k = queries.shape
    n = refs.shape[0]
    d2 = jnp.zeros((m, n), dtype=jnp.float32)
    for d in range(k):
        diff = queries[:, d, None] - refs[None, :, d]
        d2 = d2 + diff * diff
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def nns_distance_matrix(queries: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    """v1: materialized HBM distance matrix + row argmin. Exact (direct f32)."""
    return _distance_matrix_idx(queries, refs)


@jax.jit
def _expansion_idx(queries: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    q = queries.astype(jnp.float32)
    r = refs.astype(jnp.float32)
    # -2 q r^T on the MXU; HIGHEST precision => f32 operands are split into
    # bf16 passes with full f32-equivalent accuracy.
    cross = jax.lax.dot_general(
        q, r,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    r2 = jnp.sum(r * r, axis=1)
    # |q|^2 is constant per row — it cannot change the row argmin, so skip it
    # (same observation the reference's fused kernels exploit implicitly).
    d2 = r2[None, :] - 2.0 * cross
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def nns_expansion_matmul(queries: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    """v2: MXU expansion matmul + XLA row argmin."""
    return _expansion_idx(queries, refs)
