"""Edge-partitioned propagation: graph scaling across chips.

The big-graph analogue of sequence parallelism (SURVEY.md §5): the merged
graph's EDGES are sharded over mesh axis 'graph'; node state is replicated.
Each device computes the weighted segment-sum of its edge shard's messages and
the partial aggregations are `psum`-ed over ICI every propagation iteration
(models/core.py threads `spec.shard_axis` into the aggregation closure).
Gradients are obtained by differentiating *through* the shard_map — JAX
transposes the psum collectives, so the edge-path gradient contributions are
combined exactly.

This halo-free pattern is exact and communication-light when state_dim is
small (one [N, D] psum per iteration); a node-sharded all_gather/
reduce_scatter variant for HBM-exceeding graphs is the planned next step.

Supported focuses: 'n', 'g' and 'a'. For edge focus the arc-level
supervision masks shard with the edges, the per-arc readout runs on the
local shard (BN moments psum-ed over the axis) and the target-aligned rows
come from one all_gather of the per-arc outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.models.core import GNNSpec, evaluate_single, regularization
from gnn_tpu.training.optimizers import make_optimizer

_EDGE_FIELDS = ("src", "dst", "arc_labels", "edge_w", "edge_mask")
# focus 'a': set/output masks are ARC-level (GNN.py:289-302) — shard them
_EDGE_FIELDS_A = _EDGE_FIELDS + ("set_mask", "output_mask")
# optional structures absent from from_graph batches used in sharded paths
_OPTIONAL_NONE = ("agg_plan", "adj_blocks", "res_src", "res_dst", "res_w",
                  "node_types")


def _array_fields():
    """GraphBatch dataclass fields that are pytree leaves (arrays)."""
    return [f for f in dataclasses.fields(GraphBatch)
            if f.metadata.get("pytree_node", True)]


def _static_kw(gb_or_focus, edges_sorted=None) -> dict:
    if isinstance(gb_or_focus, GraphBatch):
        return {"focus": gb_or_focus.focus, "edges_sorted": gb_or_focus.edges_sorted}
    return {"focus": gb_or_focus, "edges_sorted": bool(edges_sorted)}


def _gb_pspecs(axis: str, focus: str, edges_sorted: bool,
               has_node_types: bool = False) -> GraphBatch:
    """GraphBatch-shaped tree of PartitionSpecs: edge fields sharded, rest
    replicated. Static metadata (focus, edges_sorted) must match the batch.
    Optional structures (pallas plans, block-dense adjacency) are None —
    sharded paths consume plain from_graph batches. node_types (composite
    models) is a replicated node-level field when present."""
    efields = _EDGE_FIELDS_A if focus == "a" else _EDGE_FIELDS
    kw = {}
    for f in _array_fields():
        if f.name == "node_types":
            kw[f.name] = P() if has_node_types else None
        elif f.name in _OPTIONAL_NONE:
            kw[f.name] = None
        else:
            kw[f.name] = P(axis) if f.name in efields else P()
    return GraphBatch(**_static_kw(focus, edges_sorted), **kw)


def shard_edges(gb: GraphBatch, mesh: Mesh, axis: str = "graph") -> GraphBatch:
    """Place a GraphBatch with edge arrays sharded over mesh[axis] and
    node/target arrays replicated."""
    n = mesh.shape[axis]
    if gb.n_edge_pad % n:
        raise ValueError(f"edge pad {gb.n_edge_pad} not divisible by axis size {n}")
    if gb.adj_blocks is not None or gb.agg_plan is not None:
        raise ValueError("edge sharding takes plain from_graph batches "
                         "(no block-dense adjacency / pallas plan)")
    efields = _EDGE_FIELDS_A if gb.focus == "a" else _EDGE_FIELDS
    out = {}
    for f in _array_fields():
        leaf = getattr(gb, f.name)
        if leaf is None:
            out[f.name] = None
            continue
        spec = P(axis) if f.name in efields else P()
        out[f.name] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return GraphBatch(**_static_kw(gb), **out)


def make_edge_sharded_train_step(spec: GNNSpec, loss_name: str,
                                 loss_args: Optional[dict], optimizer_cfg: dict,
                                 mesh: Mesh, axis: str = "graph", mean: bool = True,
                                 edges_sorted: bool = True):
    """Jitted training step over an edge-sharded single graph batch.

    step(params, bn, opt_state, gb_sharded, rng) -> (params, bn, opt_state, iters)
    """
    loss_args = dict(loss_args or {})
    sspec = dataclasses.replace(spec, shard_axis=axis)
    opt = make_optimizer(optimizer_cfg)

    def shard_loss(params, bn, gb, rng):
        iters, loss, res = evaluate_single(sspec, params, bn, gb, rng, loss_name,
                                           loss_args, training=True)
        return loss, (iters, res["bn"])

    mapped = jax.shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P(), P(), _gb_pspecs(axis, spec.focus, edges_sorted), P()),
        out_specs=(P(), (P(), P())),
        check_vma=False)

    @jax.jit
    def step(params, bn, opt_state, gb, rng):
        def loss_fn(p):
            loss, aux = mapped(p, bn, gb, rng)
            return loss + regularization(sspec, p), aux

        grads, (iters, new_bn) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            denom = jnp.maximum(iters, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, iters

    return step


def make_edge_sharded_forward(spec: GNNSpec, mesh: Mesh, axis: str = "graph",
                              edges_sorted: bool = True):
    """Jitted sharded inference: forward(params, bn, gb_sharded, rng) ->
    (iters, out_rows)."""
    from gnn_tpu.models.core import gnn_forward
    sspec = dataclasses.replace(spec, shard_axis=axis)

    def fwd(params, bn, gb, rng):
        res = gnn_forward(sspec, params, bn, gb, rng, training=False)
        return res["iters"], res["out"]

    mapped = jax.shard_map(fwd, mesh=mesh,
                           in_specs=(P(), P(), _gb_pspecs(axis, spec.focus, edges_sorted), P()),
                           out_specs=(P(), P()),
                           check_vma=False)
    return jax.jit(mapped)
