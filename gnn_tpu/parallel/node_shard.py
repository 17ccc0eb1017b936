"""Node-sharded propagation: node STATE sharded across chips.

The scaling mode for graphs whose state does not fit one chip's HBM (the
edge-sharded mode in edge_shard.py replicates state). Per propagation
iteration:

    full_state = all_gather(local_state)               # over ICI
    msgs       = full_state[src]  for the LOCAL edge shard
    local_agg  = segment_sum(w · msgs, dst_local)       # owner-computes

Edges are assigned to the shard that OWNS their destination node (dst-sorted
edges make shards contiguous ranges), so no psum of partial aggregations is
needed — each shard's aggregation is already complete for its nodes. The state
MLP, batch-norm statistics (psum-ed moments via mlp_apply(axis_name=...)),
convergence predicate (psum-any) and readout all run on local rows only;
per-shard outputs are all-gathered once for the loss. Graph focus pools the
all-gathered node outputs by cumsum ranges (average readout, GNN.py:318-333).

Exactness: numerically identical to the single-device step (tested on the
virtual CPU mesh). Gradients differentiate through the shard_map, giving the
correct collective transposes (all_gather ↔ psum-scatter).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.ops.mlp import mlp_apply
from gnn_tpu.training.losses import get_loss
from gnn_tpu.training.optimizers import make_optimizer


@struct.dataclass
class NodeShardBatch:
    """Sharded graph batch: leading axis = shard for edge arrays; node arrays
    sharded over rows. Built by shard_nodes()."""
    # node level — sharded over rows [Np] (P(axis))
    nodes: jnp.ndarray
    node_mask: jnp.ndarray
    set_mask: jnp.ndarray
    output_mask: jnp.ndarray
    agg_arcs_cache: jnp.ndarray       # [Np, AL] (precomputed, sharded rows)
    # edge level — owner-assigned shards [d, Es] (P(axis) on axis 0)
    e_src: jnp.ndarray                # GLOBAL src ids
    e_dst_local: jnp.ndarray          # dst id LOCAL to the owner shard
    e_w: jnp.ndarray
    # supervision — replicated
    targets: jnp.ndarray
    sample_weights: jnp.ndarray
    out_index: jnp.ndarray
    sel_mask: jnp.ndarray
    # graph focus only — pooling structures (GNN.py:318-333). pool_w is
    # node-level (sharded rows, pre-multiplied by node_mask); the cumsum range
    # indices are replicated and consumed after the output all_gather.
    pool_w: Optional[jnp.ndarray] = None
    pool_starts: Optional[jnp.ndarray] = None
    pool_ends: Optional[jnp.ndarray] = None
    # composite models — per-node type ids, sharded rows [Np]
    node_types: Optional[jnp.ndarray] = None
    # edge focus only — per-arc readout structures on the owner shard
    # (GNN.py:286-302): labels for the [state_src, state_dst, arc_label]
    # input, and set∧output∧real folded into one supervision mask.
    e_arc_labels: Optional[jnp.ndarray] = None   # [d, Es, AL]
    e_emask: Optional[jnp.ndarray] = None        # [d, Es] bool
    # statics
    n_shards: int = struct.field(pytree_node=False, default=1)
    focus: str = struct.field(pytree_node=False, default="n")


def shard_nodes(gb: GraphBatch, mesh: Mesh, axis: str = "graph") -> NodeShardBatch:
    """Build a node-sharded batch from a dst-sorted from_graph batch.

    Supports all three focuses: 'n' (local readout, gathered once for the
    loss), 'g' (cumsum-difference pooling over all-gathered node outputs) and
    'a' (arcs readout on the dst-owner shard — src states come from the same
    all_gather the propagation uses, dst states are local rows)."""
    if gb.focus not in ("n", "g", "a"):
        raise NotImplementedError("node sharding supports n/g/a focus")
    if gb.focus == "g" and gb.pool_starts is None:
        raise ValueError("graph-focus node sharding needs contiguous pooling "
                         "ranges (from_graph builds pool_starts/pool_ends)")
    if not gb.edges_sorted:
        raise ValueError("node sharding requires dst-sorted edges")
    d = mesh.shape[axis]
    Np = gb.n_node_pad
    if Np % d:
        raise ValueError(f"node pad {Np} not divisible by {d} shards")
    L = Np // d

    dst = np.asarray(gb.dst)
    src = np.asarray(gb.src)
    w = np.asarray(gb.edge_w)
    # owner-contiguous edge ranges (dst sorted)
    bounds = np.searchsorted(dst, np.arange(0, Np + 1, L))
    counts = np.diff(bounds)
    Es = max(int(-(-counts.max() // 128) * 128), 128)
    e_src = np.zeros((d, Es), np.int32)
    e_dstl = np.zeros((d, Es), np.int32)
    e_w = np.zeros((d, Es), w.dtype)
    focus_a = gb.focus == "a"
    if focus_a:
        labs = np.asarray(gb.arc_labels)
        emask_flat = np.asarray(gb.set_mask & gb.output_mask & gb.edge_mask)
        e_lab = np.zeros((d, Es, labs.shape[1]), labs.dtype)
        e_emask = np.zeros((d, Es), bool)
        # remap arc positions (sorted order) -> shard-major (i*Es + slot) so
        # out_index addresses the all-gathered per-arc output matrix
        pos = np.asarray(gb.out_index)
        shard_of = np.minimum(np.searchsorted(bounds, pos, side="right") - 1,
                              d - 1)
        out_index_a = (shard_of * Es + (pos - bounds[shard_of])).astype(np.int32)
    for i in range(d):
        lo, hi = bounds[i], bounds[i + 1]
        n = hi - lo
        e_src[i, :n] = src[lo:hi]
        e_dstl[i, :n] = dst[lo:hi] - i * L
        e_w[i, :n] = w[lo:hi]
        if focus_a:
            e_lab[i, :n] = labs[lo:hi]
            e_emask[i, :n] = emask_flat[lo:hi]

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    cache = (gb.agg_arcs_cache if gb.agg_arcs_cache is not None
             else jnp.zeros((Np, gb.dim_arc_label), gb.nodes.dtype))
    pool = {}
    if gb.focus == "g":
        pool = dict(
            pool_w=put(gb.pool_w * gb.node_mask.astype(gb.pool_w.dtype), P(axis)),
            pool_starts=put(gb.pool_starts, P()), pool_ends=put(gb.pool_ends, P()))
    if gb.node_types is not None:
        pool["node_types"] = put(gb.node_types, P(axis))
    if focus_a:
        # arc-level supervision lives in e_emask; the node-level mask slots
        # carry node_mask so downstream code can shard them uniformly
        pool.update(e_arc_labels=put(jnp.asarray(e_lab), P(axis)),
                    e_emask=put(jnp.asarray(e_emask), P(axis)))
        set_mask, output_mask = gb.node_mask, gb.node_mask
        out_index = jnp.asarray(out_index_a)
    else:
        set_mask, output_mask = gb.set_mask, gb.output_mask
        out_index = gb.out_index
    return NodeShardBatch(
        nodes=put(gb.nodes, P(axis)), node_mask=put(gb.node_mask, P(axis)),
        set_mask=put(set_mask, P(axis)), output_mask=put(output_mask, P(axis)),
        agg_arcs_cache=put(cache, P(axis)),
        e_src=put(jnp.asarray(e_src), P(axis)),
        e_dst_local=put(jnp.asarray(e_dstl), P(axis)),
        e_w=put(jnp.asarray(e_w), P(axis)),
        targets=put(gb.targets, P()), sample_weights=put(gb.sample_weights, P()),
        out_index=put(out_index, P()), sel_mask=put(gb.sel_mask, P()),
        n_shards=d, focus=gb.focus, **pool)


def _ns_pspecs(axis: str, d: int, focus: str,
               has_node_types: bool = False) -> NodeShardBatch:
    pool = (dict(pool_w=P(axis), pool_starts=P(), pool_ends=P())
            if focus == "g" else {})
    if focus == "a":
        pool.update(e_arc_labels=P(axis), e_emask=P(axis))
    if has_node_types:
        pool["node_types"] = P(axis)
    return NodeShardBatch(
        nodes=P(axis), node_mask=P(axis), set_mask=P(axis), output_mask=P(axis),
        agg_arcs_cache=P(axis), e_src=P(axis), e_dst_local=P(axis), e_w=P(axis),
        targets=P(), sample_weights=P(), out_index=P(), sel_mask=P(),
        n_shards=d, focus=focus, **pool)


def _ns_forward(spec, params, bn, nb: NodeShardBatch, rng, training, axis,
                with_entity: bool = False):
    """Sharded propagation + readout; returns (iters, loss-ready out rows,
    new_bn) — or, with_entity=True, (iters, out_rows, new_bn, state_local,
    entity_local) where state_local / entity_local are this shard's
    converged states and pre-pooling entity outputs (the LGNN stack's
    update_graph_batch inputs). Runs INSIDE shard_map — array args are
    shard-local. Accepts a GNNSpec or a CompositeGNNSpec (per-type state
    nets on local rows)."""
    from gnn_tpu.models.composite import CompositeGNNSpec
    from gnn_tpu.models.core import _moving_mask, check_dims
    _is_composite = isinstance(spec, CompositeGNNSpec)
    if _is_composite and nb.node_types is None:
        raise ValueError("composite node sharding needs a batch with node_types")
    check_dims(spec, nb.nodes.shape[1], nb.agg_arcs_cache.shape[1],
               nb.targets.shape[1])
    L = nb.nodes.shape[0]            # local rows
    e_src = nb.e_src[0]              # strip the shard axis ([1, Es] locally)
    e_dstl = nb.e_dst_local[0]
    e_w = nb.e_w[0]
    nm = nb.node_mask

    def agg_state(local_state):
        full = jax.lax.all_gather(local_state, axis, tiled=True)     # [Np, D]
        msgs = jnp.take(full, e_src, axis=0) * e_w[:, None]
        return jax.ops.segment_sum(msgs, e_dstl, num_segments=L)

    agg_arcs = nb.agg_arcs_cache
    # mirror models/core.py's rng split structure (gnn_forward -> propagate)
    # so the state_dim>0 initial-state draw is bit-identical to the
    # single-device path: each shard draws the FULL (Np, sd) normal with the
    # replicated key and slices its rows
    _, rng_prop, rng_out = jax.random.split(rng, 3)
    _, rng_init, rng_loop = jax.random.split(rng_prop, 3)
    step_rngs = jax.random.split(rng_loop, spec.max_iteration)
    sd = spec.state_dim
    if sd > 0:
        full0 = 0.1 * jax.random.normal(
            rng_init, (L * nb.n_shards, sd), dtype=nb.nodes.dtype)
        i0 = jax.lax.axis_index(axis) * L
        state = (jax.lax.dynamic_slice_in_dim(full0, i0, L, 0)
                 * nm[:, None].astype(nb.nodes.dtype))
        # loop-invariant constant aggregations (GNN.py:259-263)
        const_feats = jnp.concatenate([agg_state(nb.nodes), agg_arcs], axis=1)

        def step_input(sv):
            return jnp.concatenate([sv, nb.nodes, agg_state(sv), const_feats],
                                   axis=1)
    else:
        state = nb.nodes

        def step_input(sv):
            return jnp.concatenate([sv, agg_state(sv), agg_arcs], axis=1)
    state_old = jnp.ones_like(state)
    thr = jnp.float32(spec.threshold)

    def body(carry, step_rng):
        k, s, s_old, active, bnl = carry
        moving = _moving_mask(s, s_old, thr) & nm
        any_moving = jax.lax.psum(jnp.any(moving).astype(jnp.int32), axis) > 0
        active = active & any_moving
        inp = step_input(s)
        # decorrelate dropout masks across shards
        shard_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis))
        if _is_composite:
            # per-type state nets on local rows, type-masked (composite.py);
            # BN moments psum-ed per type over the mesh axis
            tm = jax.nn.one_hot(nb.node_types, len(spec.state_specs),
                                dtype=s.dtype)
            outs, bns = [], []
            for t in range(len(spec.state_specs)):
                o, b = mlp_apply(spec.state_specs[t], params["state"][t],
                                 bnl[t], inp, training=training,
                                 rng=jax.random.fold_in(shard_rng, t),
                                 stat_mask=nm & (nb.node_types == t),
                                 axis_name=axis)
                outs.append(o * tm[:, t:t + 1])
                bns.append(b)
            new_s, new_bn = sum(outs), tuple(bns)
        else:
            new_s, new_bn = mlp_apply(spec.state_spec, params["state"], bnl,
                                      inp, training=training, rng=shard_rng,
                                      stat_mask=nm, axis_name=axis)
        s_next = jnp.where(active, new_s.astype(s.dtype), s)
        s_old_next = jnp.where(active, s, s_old)
        bn_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), new_bn, bnl)
        return (k + active.astype(jnp.float32), s_next, s_old_next, active,
                bn_next), None

    carry0 = (jnp.float32(0.0), state, state_old, jnp.bool_(True), bn["state"])
    (iters, state, _, _, bn_s), _ = jax.lax.scan(body, carry0, step_rngs)

    # node components for readout (GNN.py:245-248): state_dim>0 appends the
    # node labels to the converged state
    comp = state if sd == 0 else jnp.concatenate([state, nb.nodes], axis=1)
    if nb.focus == "a":
        # edge readout on the dst-owner shard (GNN.py:286-302): src states
        # from one all_gather, dst states are this shard's local rows
        full = jax.lax.all_gather(comp, axis, tiled=True)             # [Np, D]
        arc_inp = jnp.concatenate(
            [jnp.take(full, e_src, axis=0),
             jnp.take(comp, e_dstl, axis=0),
             nb.e_arc_labels[0]], axis=1)
        out_local, bn_o = mlp_apply(spec.output_spec, params["output"],
                                    bn["output"], arc_inp, training=training,
                                    rng=rng_out, stat_mask=nb.e_emask[0],
                                    axis_name=axis)
        out_full = jax.lax.all_gather(out_local, axis, tiled=True)    # [d·Es, DT]
        out_rows = jnp.take(out_full, nb.out_index, axis=0)
        if with_entity:
            return (iters, out_rows, {"state": bn_s, "output": bn_o},
                    state, out_local)
        return iters, out_rows, {"state": bn_s, "output": bn_o}

    emask = nb.set_mask & nb.output_mask & nm
    out_local, bn_o = mlp_apply(spec.output_spec, params["output"], bn["output"],
                                comp, training=training, rng=rng_out,
                                stat_mask=emask, axis_name=axis)
    if nb.focus == "g":
        # average readout per graph (GNN.py:318-333): weight locally, gather
        # the full node-output matrix once, pool as a cumsum difference over
        # the replicated contiguous node ranges (models/core.py:289-304).
        weighted = out_local * nb.pool_w[:, None].astype(out_local.dtype)
        full = jax.lax.all_gather(weighted, axis, tiled=True)        # [Np, DT]
        csum = jnp.concatenate(
            [jnp.zeros((1, full.shape[1]), full.dtype),
             jnp.cumsum(full, axis=0)], axis=0)
        out_rows = (jnp.take(csum, nb.pool_ends, axis=0)
                    - jnp.take(csum, nb.pool_starts, axis=0))
    else:
        out_full = jax.lax.all_gather(out_local, axis, tiled=True)   # [Np, DT]
        out_rows = jnp.take(out_full, nb.out_index, axis=0)
    if with_entity:
        return (iters, out_rows, {"state": bn_s, "output": bn_o},
                state, out_local)
    return iters, out_rows, {"state": bn_s, "output": bn_o}


def make_node_sharded_train_step(spec, loss_name: str, loss_args: Optional[dict],
                                 optimizer_cfg: dict, mesh: Mesh,
                                 axis: str = "graph", mean: bool = True):
    """Jitted node-sharded training step:
    step(params, bn, opt_state, nb, rng) -> (params, bn, opt_state, iters)."""
    loss_args = dict(loss_args or {})
    opt = make_optimizer(optimizer_cfg)
    d = mesh.shape[axis]
    _comp = _spec_is_composite(spec)

    def shard_loss(params, bn, nb, rng):
        iters, out_rows, new_bn = _ns_forward(spec, params, bn, nb, rng, True, axis)
        lf = get_loss(loss_name)
        per = lf(nb.targets, out_rows, **loss_args)
        loss = jnp.sum(per * nb.sample_weights * nb.sel_mask.astype(per.dtype))
        return loss, (iters, new_bn)

    mapped = jax.shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P(), P(), _ns_pspecs(axis, d, spec.focus,
                                       has_node_types=_comp), P()),
        out_specs=(P(), (P(), P())),
        check_vma=False)

    @jax.jit
    def step(params, bn, opt_state, nb, rng):
        def loss_fn(p):
            loss, aux = mapped(p, bn, nb, rng)
            if _comp:
                from gnn_tpu.models.composite import composite_regularization
                return loss + composite_regularization(spec, p), aux
            from gnn_tpu.models.core import regularization
            return loss + regularization(spec, p), aux

        grads, (iters, new_bn) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            denom = jnp.maximum(iters, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, new_bn, opt_state, iters

    return step


def make_node_sharded_forward(spec, mesh: Mesh, axis: str = "graph"):
    d = mesh.shape[axis]
    _comp = _spec_is_composite(spec)

    def fwd(params, bn, nb, rng):
        iters, out_rows, _ = _ns_forward(spec, params, bn, nb, rng, False, axis)
        return iters, out_rows

    mapped = jax.shard_map(fwd, mesh=mesh,
                           in_specs=(P(), P(), _ns_pspecs(axis, d, spec.focus,
                                                          has_node_types=_comp), P()),
                           out_specs=(P(), P()),
                           check_vma=False)
    return jax.jit(mapped)


def _spec_is_composite(spec) -> bool:
    from gnn_tpu.models.composite import CompositeGNNSpec
    return isinstance(spec, CompositeGNNSpec)


def _ns_update(nb: NodeShardBatch, state_local, entity_local, *,
               get_state: bool, get_output: bool, focus: str):
    """LGNN layer augmentation on a node-sharded batch — the shard-local
    mirror of models/lgnn.update_graph_batch (reference LGNN.py:227-260).
    Node-level arrays (nodes / supervision masks) are shard rows; for focus
    'a' the output scatter lands on the owner shard's arc labels. The
    arc-label aggregation cache is recomputed locally (edges are owned by
    their dst shard, so each shard's segment sum is complete)."""
    nodeplus, arcplus = [], []
    if get_state:
        nodeplus.append(state_local)
    if get_output:
        if focus == "a":
            mask = nb.e_emask[0].astype(entity_local.dtype)[:, None]
            arcplus.append(entity_local * mask)
        else:
            mask = (nb.set_mask & nb.output_mask
                    & nb.node_mask).astype(entity_local.dtype)[:, None]
            nodeplus.append(entity_local * mask)
    nodes = (jnp.concatenate([nb.nodes] + nodeplus, axis=1)
             if nodeplus else nb.nodes)
    kw = {}
    if arcplus:
        e_lab = jnp.concatenate([nb.e_arc_labels[0]] + arcplus, axis=1)
        kw["e_arc_labels"] = e_lab[None]
        # arc labels changed -> recompute the local arc aggregation
        L = nb.nodes.shape[0]
        cache = jax.ops.segment_sum(e_lab * nb.e_w[0][:, None],
                                    nb.e_dst_local[0], num_segments=L)
        kw["agg_arcs_cache"] = cache.astype(nb.agg_arcs_cache.dtype)
    return nb.replace(nodes=nodes, **kw)


def make_lgnn_node_sharded_train_step(specs, loss_name: str,
                                      loss_args, optimizer_cfg: dict,
                                      mesh: Mesh, axis: str = "graph",
                                      mean: bool = True,
                                      get_state: bool = False,
                                      get_output: bool = True,
                                      training_mode: str = "parallel"):
    """Node-sharded LGNN training step: the WHOLE layer stack runs inside
    one shard_map over a node-sharded batch (all_gather + owner-computes
    aggregation per layer, _ns_update augmentation between layers). Covers
    the 'parallel'/'residual' loss formulations."""
    import dataclasses as _dc

    from gnn_tpu.models.lgnn import _lgnn_loss, _reg_any
    largs = dict(loss_args or {})
    opt = make_optimizer(optimizer_cfg)
    d = mesh.shape[axis]
    focus = specs[0].focus

    def shard_loss(params, bns, nb, rng):
        rngs = jax.random.split(rng, len(specs))
        iters, outs, new_bns = [], [], []
        cur = nb
        for idx, sp in enumerate(specs):
            it, out_rows, nbn, st, ent = _ns_forward(
                sp, params[idx], bns[idx], cur, rngs[idx], True, axis,
                with_entity=True)
            iters.append(it)
            outs.append(out_rows)
            new_bns.append(nbn)
            if idx + 1 < len(specs):
                cur = _ns_update(nb, st, ent, get_state=get_state,
                                 get_output=get_output, focus=sp.focus)
        # _lgnn_loss consumes (targets, sample_weights, sel_mask) — all
        # replicated on a NodeShardBatch, same field names as GraphBatch
        loss = _lgnn_loss(specs, loss_name, largs, nb, outs, training_mode)
        return loss, (jnp.stack(iters), tuple(new_bns))

    mapped = jax.shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P(), P(), _ns_pspecs(axis, d, focus), P()),
        out_specs=(P(), (P(), P())), check_vma=False)

    @jax.jit
    def step(params, bns, opt_state, nb, rng):
        def loss_fn(p):
            loss, aux = mapped(p, bns, nb, rng)
            return (loss + sum(_reg_any(s, pi)
                               for s, pi in zip(specs, p)), aux)

        grads, (iters, new_bns) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            grads = tuple(
                {**g, "state": jax.tree_util.tree_map(
                    lambda x, it=it: x / jnp.maximum(it, 1.0), g["state"])}
                for g, it in zip(grads, iters))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, new_bns, opt_state, iters

    return step


def make_lgnn_node_sharded_forward(specs, mesh: Mesh, axis: str = "graph",
                                   get_state: bool = False,
                                   get_output: bool = True):
    """Node-sharded LGNN inference: the whole layer stack inside one
    shard_map (reference LGNN.Loop, LGNN.py:263-290 — each layer's
    propagation all_gathers + owner-computes, with the mid-stack
    update_graph augmentation running on shard-local rows, _ns_update).
    Returns a jitted fwd(params, bns, nb, rng) -> (iters [L], outs [L, Tp, DT])
    so both LGNN.__call__ (last layer) and LGNN.predict(idx) semantics
    (LGNN.py:172-198) can be served from one executable. This is the
    BigGraphPredictor path for LGNN stacks on over-HBM graphs."""
    d = mesh.shape[axis]
    focus = specs[0].focus

    def shard_fwd(params, bns, nb, rng):
        rngs = jax.random.split(rng, len(specs))
        iters, outs = [], []
        cur = nb
        for idx, sp in enumerate(specs):
            it, out_rows, _, st, ent = _ns_forward(
                sp, params[idx], bns[idx], cur, rngs[idx], False, axis,
                with_entity=True)
            iters.append(it)
            outs.append(out_rows)
            if idx + 1 < len(specs):
                cur = _ns_update(nb, st, ent, get_state=get_state,
                                 get_output=get_output, focus=sp.focus)
        return jnp.stack(iters), jnp.stack(outs)

    mapped = jax.shard_map(
        shard_fwd, mesh=mesh,
        in_specs=(P(), P(), _ns_pspecs(axis, d, focus), P()),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(mapped)
