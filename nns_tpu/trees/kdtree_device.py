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


@functools.partial(jax.jit, static_argnames=("cap",))
def _kd_query(q, refs, node_point, node_dim, cap: int):
    m, k = q.shape
    heap_len = node_point.shape[0]
    rows = jnp.arange(m)

    stack_n = jnp.zeros((m, cap), dtype=jnp.int32).at[:, 0].set(1)
    stack_b = jnp.zeros((m, cap), dtype=jnp.float32)
    sp = jnp.ones(m, dtype=jnp.int32)
    best_d = jnp.full(m, jnp.inf, dtype=jnp.float32)
    best_i = jnp.zeros(m, dtype=jnp.int32)

    def cond(state):
        _, _, sp, _, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack_n, stack_b, sp, best_d, best_i = state
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

        return stack_n, stack_b, sp, best_d, best_i

    state = (stack_n, stack_b, sp, best_d, best_i)
    _, _, _, _, best_i = jax.lax.while_loop(cond, body, state)
    return best_i


def kd_query_device(tree, queries) -> np.ndarray:
    q = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
    idx = _kd_query(
        q,
        jnp.asarray(tree.refs),
        jnp.asarray(tree.node_point),
        jnp.asarray(tree.node_dim),
        cap=tree.stack_cap(),
    )
    return np.asarray(idx)


def nns_kdtree_device(queries, refs, max_k: int = 16) -> np.ndarray:
    """v11: KD-tree host build + batched device traversal; k > max_k falls
    back to the linear scan (reference contract, core.cu:1435-1436)."""
    if refs.shape[1] > max_k:
        from nns_tpu.kernels.oracle import linear_scan

        return linear_scan(queries, refs)
    from nns_tpu.trees.kdtree import KDTree

    return kd_query_device(KDTree.build(refs), queries)
