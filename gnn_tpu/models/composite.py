"""Composite (heterogeneous) GNN: per-node-type state transition networks.

The reference repository signalled but never shipped this capability —
GraphGenerator.py:8 imports `GNN.composite_graph_class`, a module absent from
the tree, and `CompositeGraphDataGenerator` (GraphGenerator.py:134-158) is
dead code. This module implements the evident design (the CompositeGNN of the
same research lineage): nodes carry an integer type, and each type has its own
state MLP f_w^t; aggregation, convergence and readout are unchanged from the
homogeneous model (models/core.py).

TPU-native formulation: instead of gathering per-type node subsets (dynamic
shapes, scatters), EVERY type's MLP runs densely over all (padded) rows and
rows are selected by type mask:

    state_next = Σ_t  1[type == t] · f_w^t(inp)

branch-free and fully static under jit — far cheaper than any scatter-based
regrouping at real heterogeneous type counts (2-8). The convergence
predicate, masked-scan dynamic iteration count and gradient semantics are
identical to models/core.propagate.

Production training (round 5) rides the TYPED KERNEL CHAIN
(ops/pallas_typed.py): all per-type dense weights stacked into ONE MXU
issue with in-VMEM type-mask selection — measured 2.2-2.6x over this
module's XLA body on the chip (benchmarks/composite_bench.py: T=1
8.98 -> 4.15 ms/step, T=8 18.19 -> 6.94). The XLA body below remains the
dispatch fallback (eval mode, non-blocked batches, ineligible specs,
GNN_TPU_FUSED_BN=0) and the exactness reference the kernels are fuzzed
against (tools/fuzz_parity.py 'composite_bn' kind).

Supports both state_dim == 0 (labels are the state) and state_dim > 0
(random-normal state, labels appended to the step input — GNN.py:261-266;
round 4) with a COMMON node-label width across types.
Datasets whose types carry different feature widths work today by zero-padding
each type's labels to the max width host-side (column j of type t is zero when
t does not define feature j — the type's own state net simply learns zero
weights for absent columns); first-class ragged per-type widths are a possible
extension.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.models.core import (GNNSpec, _moving_mask, _tree_where,
                                 make_agg_closures,
                                 weighted_loss)
from gnn_tpu.ops.mlp import MLPSpec, mlp_apply, mlp_init, mlp_regularization
from gnn_tpu.training.losses import get_loss
from gnn_tpu.training.optimizers import make_optimizer


@dataclasses.dataclass(frozen=True)
class CompositeGNNSpec:
    """Static description of a heterogeneous GNN (hashable).

    :param focus: 'n' | 'a' | 'g' (as GNNSpec).
    :param state_specs: one MLPSpec per node type (all share input/output
        widths — the propagated state has one common dimension).
    :param output_spec: readout MLP g_w (shared across types, as in the
        homogeneous model).
    """
    focus: str
    state_specs: Tuple[MLPSpec, ...]
    output_spec: MLPSpec
    max_iteration: int = 5
    threshold: float = 0.01
    aggregation: str = "auto"
    shard_axis: Optional[str] = None
    # gradient mode, as GNNSpec: 'unroll' differentiates the masked scan;
    # 'ift' installs the implicit-function-theorem adjoint (models/ift.py)
    grad_mode: str = "unroll"
    ift_backward_iters: int = 20
    # reference state_vect_dim (GNN.py:261-266): 0 = labels are the state;
    # > 0 = random-normal state of that dim, labels concatenated as input
    # (round 4 — family uniformity with the homogeneous model)
    state_dim: int = 0

    def __post_init__(self):
        if self.focus not in ("n", "a", "g"):
            raise ValueError("focus must be 'n', 'a' or 'g'")
        if not self.state_specs:
            raise ValueError("state_specs must contain at least one MLPSpec")
        dims = {(s.input_dim, s.units[-1]) for s in self.state_specs}
        if len(dims) != 1:
            raise ValueError(
                f"all per-type state nets must share (input_dim, output_dim); "
                f"got {sorted(dims)}")
        if self.grad_mode not in ("unroll", "ift"):
            raise ValueError("grad_mode must be 'unroll' or 'ift'")
        if self.grad_mode == "ift" and any(s.dropout_rate for s in self.state_specs):
            raise ValueError("grad_mode='ift' requires dropout-free state nets "
                             "(per-iteration masks make the step non-stationary)")
        if self.state_dim < 0 or not isinstance(self.state_dim, int):
            raise TypeError("param <state_dim> must be int>=0")

    @property
    def n_types(self) -> int:
        return len(self.state_specs)

    # the homogeneous helpers (make_agg_closures, LGNN stacking) only read
    # these fields — present on both spec types
    @property
    def state_spec(self) -> MLPSpec:
        return self.state_specs[0]


def composite_init(spec: CompositeGNNSpec, rng: jax.Array, dtype=jnp.float32):
    """Initialise params/bn: {'state': (per-type ...), 'output': ...}."""
    keys = jax.random.split(rng, spec.n_types + 1)
    ps, bs = zip(*(mlp_init(s, k, dtype)
                   for s, k in zip(spec.state_specs, keys[:-1])))
    po, bo = mlp_init(spec.output_spec, keys[-1], dtype)
    return ({"state": tuple(ps), "output": po},
            {"state": tuple(bs), "output": bo})


def composite_propagate(spec: CompositeGNNSpec, params_state, bn_state,
                        gb: GraphBatch, rng: jax.Array, training: bool):
    """Fixed-point loop with per-type state nets (masked scan, identical
    convergence semantics to models/core.propagate)."""
    if gb.node_types is None:
        raise ValueError("composite models need a batch built from a Graph "
                         "with node_types")
    nm = gb.node_mask
    agg_state, agg = make_agg_closures(spec, gb)
    agg_arcs = (gb.agg_arcs_cache if gb.agg_arcs_cache is not None
                else agg(gb.arc_labels))
    # [Np, T] one-hot type masks; padded rows select type 0 harmlessly (their
    # state is never read — node_mask excludes them from the predicate)
    tmask = jax.nn.one_hot(gb.node_types, spec.n_types, dtype=gb.nodes.dtype)

    # rng split mirrors core.propagate (rng_init drawn even at state_dim==0)
    # so the node-sharded path (_ns_forward) reproduces the stream exactly
    rng, rng_init, rng_loop = jax.random.split(rng, 3)
    sd = spec.state_dim
    if sd > 0:
        # GNN.py:261-266 semantics, as core.propagate: random-normal state,
        # labels + constant aggregations appended to the step input
        state0 = 0.1 * jax.random.normal(rng_init, (gb.n_node_pad, sd),
                                         dtype=gb.nodes.dtype)
        state0 = state0 * nm[:, None].astype(gb.nodes.dtype)
        agg_nodes = (gb.agg_nodes_cache if gb.agg_nodes_cache is not None
                     else agg_state(gb.nodes))
        const_feats = jnp.concatenate([agg_nodes, agg_arcs], axis=1)

        def step_input(state):
            return jnp.concatenate(
                [state, gb.nodes, agg_state(state), const_feats], axis=1)
    else:
        state0 = gb.nodes

        def step_input(state):
            return jnp.concatenate([state, agg_state(state), agg_arcs],
                                   axis=1)
    state_old0 = jnp.ones_like(state0)
    step_rngs = jax.random.split(rng_loop, spec.max_iteration)
    thr = jnp.asarray(spec.threshold, dtype=jnp.float32)

    # typed kernel path (ops/pallas_typed.py): per-type weights stacked into
    # ONE MXU issue with in-VMEM type-mask selection — measured vs the dense
    # type-masked XLA body below in benchmarks/composite_bench.py. Same
    # kill-switches as the homogeneous chain (GNN_TPU_FUSED / _FUSED_BN).
    import os as _os
    if (gb.adj_blocks is not None
            and spec.aggregation == "auto"
            and spec.shard_axis is None and spec.grad_mode != "ift"
            and _os.environ.get("GNN_TPU_FUSED", "1") != "0"
            and _os.environ.get("GNN_TPU_FUSED_BN", "1") != "0"):
        shape_ok = (spec.state_specs[0].units[-1]
                    == (sd if sd else gb.nodes.shape[1]))
        if training and shape_ok:
            from gnn_tpu.ops.pallas_typed import (bn_typed_train_propagate,
                                                  supports_typed_bn_train)
            if supports_typed_bn_train(spec.state_specs):
                return bn_typed_train_propagate(
                    spec, params_state, bn_state, gb, state0, agg_arcs,
                    step_rngs, nm, const_feats if sd > 0 else None)
        elif shape_ok:
            # typed EVAL chain (round 5): the stacked-weight kernel with the
            # per-type inference affine fixed from running statistics. No
            # VJP — inference only; differentiating an eval forward on this
            # path fails loudly (train with training=True, which rides the
            # custom-VJP training chain)
            from gnn_tpu.ops.pallas_typed import (supports_typed_eval,
                                                  typed_eval_propagate)
            if supports_typed_eval(spec.state_specs):
                return typed_eval_propagate(
                    spec, params_state, bn_state, gb, state0, agg_arcs,
                    nm, const_feats if sd > 0 else None)

    def body(carry, step_rng):
        k, state, state_old, active, bn = carry
        moving = _moving_mask(state, state_old, thr) & nm
        active = active & jnp.any(moving)

        inp = step_input(state)
        outs, new_bns = [], []
        for t in range(spec.n_types):
            o, b = mlp_apply(spec.state_specs[t], params_state[t], bn[t], inp,
                             training=training,
                             rng=jax.random.fold_in(step_rng, t),
                             stat_mask=nm & (gb.node_types == t))
            outs.append(o * tmask[:, t:t + 1])
            new_bns.append(b)
        new_state = sum(outs)
        state_next = jnp.where(active, new_state.astype(state.dtype), state)
        state_old_next = jnp.where(active, state, state_old)
        bn_next = _tree_where(active, tuple(new_bns), bn)
        return (k + active.astype(jnp.float32), state_next, state_old_next,
                active, bn_next), None

    carry0 = (jnp.float32(0.0), state0, state_old0, jnp.bool_(True), bn_state)
    (iters, state, _, _, bn_out), _ = jax.lax.scan(body, carry0, step_rngs)

    if spec.grad_mode == "ift":
        # O(1)-memory adjoint: gradient-stop the scanned state, install the
        # implicit backward (exact at convergence) — mirrors core.propagate
        from gnn_tpu.models.ift import fixed_point_ift
        consts = {"gb": gb, "bn": bn_out, "agg_arcs": agg_arcs,
                  "tmask": tmask,
                  "extra": (const_feats if sd > 0 else None)}
        f = partial(_composite_ift_state_step, spec, training)
        state = fixed_point_ift(f, spec.ift_backward_iters, params_state,
                                jax.lax.stop_gradient(state), consts)
    return iters, state, bn_out


def _composite_ift_state_step(spec: CompositeGNNSpec, training: bool,
                              params_state, s, consts):
    """One stationary application of the per-type state nets (IFT adjoint)."""
    gb = consts["gb"]
    agg_state, _ = make_agg_closures(spec, gb)
    if spec.state_dim > 0:
        inp = jnp.concatenate([s, gb.nodes, agg_state(s), consts["extra"]],
                              axis=1)
    else:
        inp = jnp.concatenate([s, agg_state(s), consts["agg_arcs"]], axis=1)
    out = 0.0
    for t in range(spec.n_types):
        o, _ = mlp_apply(spec.state_specs[t], params_state[t], consts["bn"][t],
                         inp, training=training, rng=None,
                         stat_mask=gb.node_mask & (gb.node_types == t))
        out = out + o * consts["tmask"][:, t:t + 1]
    return out


def composite_forward(spec: CompositeGNNSpec, params, bn, gb: GraphBatch,
                      rng: jax.Array, training: bool = False):
    """Full heterogeneous forward: composite propagation, then the SAME
    readout as the homogeneous model. Returns the gnn_forward result dict."""
    from gnn_tpu.models import core as _core

    rng, rng_prop, rng_out = jax.random.split(rng, 3)
    iters, state, bn_s = composite_propagate(spec, params["state"], bn["state"],
                                             gb, rng_prop, training)
    # node components for readout (GNN.py:245-248): state_dim>0 appends the
    # node labels to the converged state
    comp = (state if spec.state_dim == 0
            else jnp.concatenate([state, gb.nodes], axis=1))
    emask = _core._entity_mask(gb)
    out_spec = spec.output_spec
    if gb.focus == "a":
        # under edge sharding the arc rows are shard-local: BN moments psum
        # over the axis and the target-aligned gather runs on the
        # all-gathered per-arc outputs (models/core.py focus-'a' contract)
        arc_inp = jnp.concatenate(
            [jnp.take(comp, gb.src, axis=0), jnp.take(comp, gb.dst, axis=0),
             gb.arc_labels], axis=1)
        out_entity, bn_o = mlp_apply(out_spec, params["output"], bn["output"],
                                     arc_inp, training=training, rng=rng_out,
                                     stat_mask=emask,
                                     axis_name=spec.shard_axis)
        ent = out_entity
        if spec.shard_axis is not None:
            ent = jax.lax.all_gather(ent, spec.shard_axis, tiled=True)
        out_rows = jnp.take(ent, gb.out_index, axis=0)
    else:
        out_entity, bn_o = mlp_apply(out_spec, params["output"], bn["output"],
                                     comp, training=training, rng=rng_out,
                                     stat_mask=emask)
        if gb.focus == "g":
            weighted = out_entity * (gb.pool_w * gb.node_mask.astype(out_entity.dtype))[:, None]
            if gb.pool_starts is not None:
                csum = jnp.concatenate(
                    [jnp.zeros((1, weighted.shape[1]), weighted.dtype),
                     jnp.cumsum(weighted, axis=0)], axis=0)
                out_rows = (jnp.take(csum, gb.pool_ends, axis=0)
                            - jnp.take(csum, gb.pool_starts, axis=0))
            else:
                from gnn_tpu.ops.aggregate import pool_graphs
                out_rows = pool_graphs(
                    out_entity * gb.node_mask[:, None].astype(out_entity.dtype),
                    gb.graph_ids, gb.pool_w, gb.n_target_pad)
        else:
            out_rows = jnp.take(out_entity, gb.out_index, axis=0)
    return {"iters": iters, "state": state, "out_entity": out_entity,
            "out": out_rows, "bn": {"state": bn_s, "output": bn_o}}


def composite_regularization(spec: CompositeGNNSpec, params):
    reg = mlp_regularization(spec.output_spec, params["output"])
    for s, p in zip(spec.state_specs, params["state"]):
        reg = reg + mlp_regularization(s, p)
    return reg


def make_composite_train_step(spec: CompositeGNNSpec, loss_name: str,
                              loss_args: Optional[dict], optimizer_cfg: dict,
                              mean: bool = True):
    """Jitted heterogeneous training step, same contract as
    core.make_train_step: step(params, bn, opt_state, gb, rng)."""
    loss_args = dict(loss_args or {})
    opt = make_optimizer(optimizer_cfg)
    lf = get_loss(loss_name)

    @jax.jit
    def step(params, bn, opt_state, gb: GraphBatch, rng):
        def loss_fn(p):
            res = composite_forward(spec, p, bn, gb, rng, training=True)
            loss = weighted_loss(lf, loss_args, gb, res["out"])
            return loss + composite_regularization(spec, p), (res["iters"],
                                                              res["bn"])

        grads, (iters, new_bn) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            denom = jnp.maximum(iters, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, new_bn, opt_state, iters

    return step


def make_composite_eval_step(spec: CompositeGNNSpec, loss_name: str,
                             loss_args: Optional[dict]):
    loss_args = dict(loss_args or {})
    lf = get_loss(loss_name)

    @jax.jit
    def ev(params, bn, gb: GraphBatch, rng):
        res = composite_forward(spec, params, bn, gb, rng, training=False)
        return res["iters"], weighted_loss(lf, loss_args, gb, res["out"]), res["out"]

    return ev


def make_composite_dp_train_step(spec: CompositeGNNSpec, loss_name: str,
                                 loss_args: Optional[dict], optimizer_cfg: dict,
                                 mesh, axis: str = "data", mean: bool = True):
    """Data-parallel composite training step (mirrors
    parallel/data_parallel.make_dp_train_step): one stacked GraphBatch shard
    per device, per-replica grads pmean-ed over ICI, replicated update.

    step(params, bn, opt_state, stacked_gb, rngs) — build stacked_gb with
    parallel/data_parallel.shard_batches (batches must carry node_types)."""
    from jax.sharding import PartitionSpec as P

    loss_args = dict(loss_args or {})
    opt = make_optimizer(optimizer_cfg)
    lf = get_loss(loss_name)

    def per_replica(params, bn, gb, rng):
        gb = jax.tree_util.tree_map(lambda x: x[0], gb)
        rng = rng[0]

        def loss_fn(p):
            res = composite_forward(spec, p, bn, gb, rng, training=True)
            loss = weighted_loss(lf, loss_args, gb, res["out"])
            return loss + composite_regularization(spec, p), (res["iters"],
                                                              res["bn"])

        grads, (iters, new_bn) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            denom = jnp.maximum(iters, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
        grads = jax.lax.pmean(grads, axis)
        new_bn = jax.lax.pmean(new_bn, axis)
        iters = jax.lax.pmean(iters, axis)
        return grads, new_bn, iters

    mapped = jax.shard_map(
        per_replica, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(params, bn, opt_state, stacked_gb, rngs):
        grads, new_bn, iters = mapped(params, bn, stacked_gb, rngs)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, iters

    return step


def make_composite_edge_sharded_train_step(spec: CompositeGNNSpec,
                                           loss_name: str,
                                           loss_args: Optional[dict],
                                           optimizer_cfg: dict, mesh,
                                           axis: str = "graph",
                                           mean: bool = True,
                                           edges_sorted: bool = True):
    """Edge-sharded composite training step (mirrors
    parallel/edge_shard.make_edge_sharded_train_step): the merged graph's
    edges are sharded over mesh[axis]; per-iteration partial aggregations are
    psum-ed (make_agg_closures honours spec.shard_axis); node-level arrays —
    including node_types — are replicated. Build the input with
    parallel/edge_shard.shard_edges."""
    from jax.sharding import PartitionSpec as P

    from gnn_tpu.parallel.edge_shard import _gb_pspecs

    loss_args = dict(loss_args or {})
    sspec = dataclasses.replace(spec, shard_axis=axis)
    opt = make_optimizer(optimizer_cfg)
    lf = get_loss(loss_name)

    def shard_loss(params, bn, gb, rng):
        res = composite_forward(sspec, params, bn, gb, rng, training=True)
        loss = weighted_loss(lf, loss_args, gb, res["out"])
        return loss, (res["iters"], res["bn"])

    mapped = jax.shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P(), P(), _gb_pspecs(axis, spec.focus, edges_sorted,
                                       has_node_types=True), P()),
        out_specs=(P(), (P(), P())),
        check_vma=False)

    @jax.jit
    def step(params, bn, opt_state, gb, rng):
        def loss_fn(p):
            loss, aux = mapped(p, bn, gb, rng)
            return loss + composite_regularization(sspec, p), aux

        grads, (iters, new_bn) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            denom = jnp.maximum(iters, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, new_bn, opt_state, iters

    return step


def make_composite_full_eval(spec: CompositeGNNSpec, loss_name: str,
                             loss_args: Optional[dict]):
    """Same 5-tuple contract as core.make_eval_step — (iters, loss, out_rows,
    state, out_entity) — so the engine model classes can swap it in."""
    loss_args = dict(loss_args or {})
    lf = get_loss(loss_name)

    @partial(jax.jit, static_argnames=("training",))
    def ev(params, bn, gb: GraphBatch, rng, training=False):
        res = composite_forward(spec, params, bn, gb, rng, training=training)
        loss = weighted_loss(lf, loss_args, gb, res["out"])
        return res["iters"], loss, res["out"], res["state"], res["out_entity"]

    return ev
