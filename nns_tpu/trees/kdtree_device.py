"""Batched KD-tree traversal on device — the v11 analog, for real.

The reference's GPU KD-tree (core.cu:1289-1451) builds on the CPU, copies
the flat tree to the device, and launches a per-query recursive traversal —
whose kernel body is commented out (core.cu:1345), so it returns zeros. This
module implements the intended design TPU-natively (SURVEY.md §7 B5): the
flat tree arrays live on device, and all m queries traverse together in one
jitted `lax.while_loop`. Each step is fully vectorized over queries: pop a
(node, bound) stack entry, fold the node's point into the running best,
push near/far children with the hyperplane-distance bound. Control-flow
divergence (queries visiting different nodes) becomes gather divergence,
which the TPU handles as vectorized dynamic-slice loads; every query simply
masks out once its stack empties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("cap", "max_steps"))
def _kd_query(q, refs, node_point, node_dim, cap: int, max_steps: int):
    m, k = q.shape
    heap_len = node_point.shape[0]
    rows = jnp.arange(m)

    stack_n = jnp.zeros((m, cap), dtype=jnp.int32).at[:, 0].set(1)
    stack_b = jnp.zeros((m, cap), dtype=jnp.float32)
    sp = jnp.ones(m, dtype=jnp.int32)
    best_d = jnp.full(m, jnp.inf, dtype=jnp.float32)
    best_i = jnp.zeros(m, dtype=jnp.int32)
    step = jnp.int32(0)

    # max_steps bounds wall time: an adversarial/high-dim workload can visit
    # O(n) nodes per query, and a latency-bound device loop that long trips
    # runtime watchdogs. Queries still active at the cap are reported
    # incomplete and re-answered exactly by the caller's brute-force pass.
    def cond(state):
        _, _, sp, _, _, step = state
        return jnp.any(sp > 0) & (step < max_steps)

    def body(state):
        stack_n, stack_b, sp, best_d, best_i, step = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack_n[rows, top], 0)
        bound = stack_b[rows, top]
        sp = sp - active

        process = active & (bound < best_d)
        pidx = node_point[node]
        valid = process & (pidx >= 0)
        safe_p = jnp.where(valid, pidx, 0)
        diff = q - refs[safe_p]
        d2 = jnp.sum(diff * diff, axis=1)
        better = valid & (d2 < best_d)
        best_d = jnp.where(better, d2, best_d)
        best_i = jnp.where(better, safe_p, best_i)

        ndim = node_dim[node]
        sv = refs[safe_p, ndim]
        delta = jnp.take_along_axis(q, ndim[:, None], axis=1)[:, 0] - sv
        go_right = (delta >= 0).astype(jnp.int32)
        near = 2 * node + go_right
        far = 2 * node + (1 - go_right)
        near_ok = valid & (near < heap_len)
        far_ok = valid & (far < heap_len)
        near = jnp.where(near_ok, near, 0)
        far = jnp.where(far_ok, far, 0)
        near_ok &= node_point[near] >= 0
        far_ok &= node_point[far] >= 0

        far_bound = delta * delta
        push_far = far_ok & (far_bound < best_d)
        stack_n = stack_n.at[rows, sp].set(jnp.where(push_far, far, stack_n[rows, sp]))
        stack_b = stack_b.at[rows, sp].set(jnp.where(push_far, far_bound, stack_b[rows, sp]))
        sp = sp + push_far

        stack_n = stack_n.at[rows, sp].set(jnp.where(near_ok, near, stack_n[rows, sp]))
        stack_b = stack_b.at[rows, sp].set(jnp.where(near_ok, bound, stack_b[rows, sp]))
        sp = sp + near_ok

        return stack_n, stack_b, sp, best_d, best_i, step + 1

    state = (stack_n, stack_b, sp, best_d, best_i, step)
    _, _, sp, _, best_i, _ = jax.lax.while_loop(cond, body, state)
    return best_i, sp > 0  # (answers, incomplete mask)


def kd_query_device(tree, queries, max_steps: int | None = None) -> np.ndarray:
    q = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
    if max_steps is None:
        max_steps = 256 * tree.stack_cap()  # >> typical low-dim visit counts
    idx, incomplete = _kd_query(
        q,
        jnp.asarray(tree.refs),
        jnp.asarray(tree.node_point),
        jnp.asarray(tree.node_dim),
        cap=tree.stack_cap(),
        max_steps=max_steps,
    )
    idx = np.array(idx)
    incomplete = np.asarray(incomplete)
    if incomplete.any():
        from nns_tpu.kernels.pallas_fused import fused_fallback

        bad = np.flatnonzero(incomplete)
        idx[bad] = np.asarray(fused_fallback(np.asarray(queries, dtype=np.float32)[bad], tree.refs))
    return idx


def nns_kdtree_device(queries, refs, max_k: int = 16) -> np.ndarray:
    """v11: KD-tree host build + batched device traversal; k > max_k falls
    back to the linear scan (reference contract, core.cu:1435-1436), and
    6 < k <= max_k to the fused device kernel — high-dimensional KD pruning
    degenerates toward a full scan, which the dense kernel does far faster
    than a divergent traversal (TPU-specific capability dispatch,
    SURVEY.md §5)."""
    if refs.shape[1] > max_k:
        from nns_tpu.kernels.oracle import linear_scan

        return linear_scan(queries, refs)
    if refs.shape[1] > 6:
        from nns_tpu.kernels.pallas_fused import nns_fused

        return np.asarray(nns_fused(queries, refs))
    from nns_tpu.trees.kdtree import KDTree

    return kd_query_device(KDTree.build(refs), queries)
