"""Neighborhood aggregation — the hot op of the framework.

The reference's three sparse matmuls (GNN.py:234 `A^T @ state`, :259
`ArcNode^T @ arc_labels`, :263 `A^T @ nodes`) are all the same computation:

    agg[n] = sum over edges e with dst_e == n of  w_e * values[e]

where `values[e]` is either a per-edge quantity (arc labels) or a gathered
per-source-node quantity (states / node labels) and `w_e` encodes the
aggregation mode (graph_class.py:108-118). Three interchangeable TPU
strategies implement it:

  'segment' — gather + jax.ops.segment_sum (XLA scatter-add). Scales to any
              graph; the default.
  'onehot'  — materialise the weighted incidence as a dense [N, E] matrix and
              ride the MXU: agg = OneHot @ values. O(N*E) FLOPs, but for
              merged-batch sizes (N,E ~ 1-4k) the MXU eats it and there is no
              scatter serialisation. Selected automatically for small pads.
  'pallas'  — blocked Pallas kernel: per node-block one-hot built in VMEM from
              a dst-id block, segment-reduce as an MXU matmul
              (ops/pallas_segment.py).

All strategies are linear, differentiable (custom VJP for pallas), and exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Strategy = str  # 'auto' | 'segment' | 'onehot' | 'pallas'

# pads below which the dense one-hot matmul beats scatter on TPU
_ONEHOT_MAX_N = 8192
_ONEHOT_MAX_E = 16384


def _pick(strategy: Strategy, num_nodes: int, num_edges: int) -> str:
    if strategy != "auto":
        return strategy
    if num_nodes <= _ONEHOT_MAX_N and num_edges <= _ONEHOT_MAX_E:
        return "onehot"
    return "segment"


def scatter_src(node_values: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Per-edge gather of source-node values: values[e] = node_values[src_e]."""
    return jnp.take(node_values, src, axis=0)


def _segment_weighted_sum(values: jnp.ndarray, weights: jnp.ndarray,
                          dst: jnp.ndarray, num_nodes: int,
                          indices_sorted: bool = False) -> jnp.ndarray:
    return jax.ops.segment_sum(values * weights[:, None], dst,
                               num_segments=num_nodes,
                               indices_are_sorted=indices_sorted)


def _onehot_weighted_sum(values: jnp.ndarray, weights: jnp.ndarray,
                         dst: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    # weighted incidence [N, E]: inc[n, e] = w_e * (dst_e == n); agg = inc @ values.
    # The comparison is VPU work, the reduction is a single MXU matmul.
    inc = (dst[None, :] == jnp.arange(num_nodes, dtype=dst.dtype)[:, None])
    inc = inc.astype(values.dtype) * weights[None, :]
    return jnp.dot(inc, values, preferred_element_type=jnp.float32).astype(values.dtype)


def aggregate_to_nodes(values: jnp.ndarray, weights: jnp.ndarray, dst: jnp.ndarray,
                       num_nodes: int, *, strategy: Strategy = "auto",
                       indices_sorted: bool = False) -> jnp.ndarray:
    """agg[n] = Σ_{e: dst_e = n} w_e * values[e].

    :param values: [E, D] per-edge values (already gathered if node-sourced).
    :param weights: [E] aggregation weights (0 on padded edges).
    :param dst: [E] int32 destination node ids (padded edges carry weight 0
        and point at the last node when sorted).
    :param num_nodes: static node count (padded).
    :param strategy: 'auto' | 'segment' | 'onehot' | 'pallas'.
    :param indices_sorted: dst is non-decreasing (GraphBatch.edges_sorted).
    """
    s = _pick(strategy, num_nodes, values.shape[0])
    if s == "segment":
        return _segment_weighted_sum(values, weights, dst, num_nodes, indices_sorted)
    if s == "onehot":
        return _onehot_weighted_sum(values, weights, dst, num_nodes)
    if s == "pallas":
        # The Pallas kernel aggregates node-sourced values through a
        # host-built AggPlan (models/core.py::make_agg_closures). For already
        # per-edge values — the only thing this function receives on that
        # path — the plan's gather is the identity and the kernel degenerates
        # to a weighted segment sum, so the XLA segment path IS the 'pallas'
        # strategy here (and it is outside the hot loop: arc-label
        # aggregation is computed once per batch, GNN.py:259).
        return _segment_weighted_sum(values, weights, dst, num_nodes,
                                     indices_sorted)
    raise ValueError(f"unknown aggregation strategy {s!r}")


def pool_graphs(node_values: jnp.ndarray, graph_ids: jnp.ndarray,
                pool_w: jnp.ndarray, num_graphs: int) -> jnp.ndarray:
    """Graph readout pooling: out[g] = Σ_{n in g} pool_w_n * node_values[n].

    Replaces the reference's NodeGraph^T @ out matmul (GNN.py:332) — NodeGraph
    is block-diagonal with value 1/n_g, i.e. a weighted segment sum by graph id.
    """
    return jax.ops.segment_sum(node_values * pool_w[:, None], graph_ids,
                               num_segments=num_graphs)
