"""Hybrid data × graph parallelism over a 2-D mesh ('data', 'graph').

Each data replica trains on its own merged-graph batch; within a replica the
graph's edges are sharded over the 'graph' axis with per-iteration psum of
partial aggregations (edge_shard.py). The scalar loss is returned per replica
and averaged; `jax.grad` differentiates *through* the shard_map so both the
graph-axis psum transposes and the data-axis averaging compose into exact
gradients.

Note on `mean=True`: the reference divides state-net grads by each batch's
iteration count before its (sequential) update (GNN_BaseClass.py:239-241).
Here the division uses the replica-mean iteration count — the synchronous
large-batch analogue; the pure-DP step (data_parallel.py) keeps per-replica
division.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_tpu.graphs.batch import GraphBatch, stack_batches
from gnn_tpu.models.core import GNNSpec, evaluate_single, regularization
from gnn_tpu.parallel.edge_shard import (_EDGE_FIELDS, _EDGE_FIELDS_A,
                                          _array_fields)
from gnn_tpu.training.optimizers import make_optimizer


def _gb_pspecs_2d(data_axis: str, graph_axis: str, focus: str,
                  edges_sorted: bool) -> GraphBatch:
    from gnn_tpu.parallel.edge_shard import _OPTIONAL_NONE
    efields = _EDGE_FIELDS_A if focus == "a" else _EDGE_FIELDS
    kw = {}
    for f in _array_fields():
        if f.name in _OPTIONAL_NONE:
            kw[f.name] = None
        else:
            kw[f.name] = (P(data_axis, graph_axis) if f.name in efields
                          else P(data_axis))
    return GraphBatch(focus=focus, edges_sorted=edges_sorted, **kw)


def shard_batches_2d(batches, mesh: Mesh, data_axis: str = "data",
                     graph_axis: str = "graph") -> GraphBatch:
    """Stack one batch per data replica and edge-shard each over graph axis."""
    if len(batches) != mesh.shape[data_axis]:
        raise ValueError(f"need {mesh.shape[data_axis]} batches, got {len(batches)}")
    stacked = stack_batches(batches)
    efields = _EDGE_FIELDS_A if stacked.focus == "a" else _EDGE_FIELDS
    out = {}
    for f in _array_fields():
        leaf = getattr(stacked, f.name)
        if leaf is None:
            out[f.name] = None
            continue
        spec = (P(data_axis, graph_axis) if f.name in efields else P(data_axis))
        out[f.name] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return GraphBatch(focus=stacked.focus, edges_sorted=stacked.edges_sorted, **out)


def make_hybrid_train_step(spec: GNNSpec, loss_name: str, loss_args: Optional[dict],
                           optimizer_cfg: dict, mesh: Mesh, data_axis: str = "data",
                           graph_axis: str = "graph", mean: bool = True,
                           edges_sorted: bool = True):
    """Jitted hybrid train step: step(params, bn, opt_state, gb2d, rngs) with
    rngs = jax.random.split(key, mesh.shape[data_axis])."""
    loss_args = dict(loss_args or {})
    sspec = dataclasses.replace(spec, shard_axis=graph_axis)
    opt = make_optimizer(optimizer_cfg)
    n_data = mesh.shape[data_axis]

    def per_shard(params, bn, gb, rng):
        gb = jax.tree_util.tree_map(lambda x: x[0], gb)  # strip data axis
        iters, loss, res = evaluate_single(sspec, params, bn, gb, rng[0],
                                           loss_name, loss_args, training=True)
        return loss[None], iters[None], jax.tree_util.tree_map(lambda x: x[None], res["bn"])

    mapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), _gb_pspecs_2d(data_axis, graph_axis, spec.focus, edges_sorted), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis), P(data_axis)),
        check_vma=False)

    @jax.jit
    def step(params, bn, opt_state, gb2d, rngs):
        def loss_fn(p):
            losses, iters, new_bns = mapped(p, bn, gb2d, rngs)
            total = jnp.mean(losses) + regularization(sspec, p)
            return total, (jnp.mean(iters), new_bns)

        grads, (iters, new_bns) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            denom = jnp.maximum(iters, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
        new_bn = jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), new_bns)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, iters

    return step
