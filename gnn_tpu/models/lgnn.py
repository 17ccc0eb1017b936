"""Layered GNN (LGNN) — a stack of homogeneous GNNs where each layer sees the
original graph augmented with the previous layer's state and/or output.

Reference: GNN/LGNN.py:13-344. Semantics reproduced:
* Loop (:263-290): layer l processes the ORIGINAL graph augmented (not
  cumulatively) with layer l-1's state/output (update_graph :227-260 —
  tf.scatter_nd of masked outputs becomes a mask-multiply since outputs are
  computed for every entity here). Mid-stack graph-focused layers contribute
  node-level outputs to the next layer and pooled outputs to the loss list
  (:276-278).
* Training modes (:293-344): 'serial' trains each layer standalone in
  sequence on progressively augmented graphs; 'parallel' uses
  mean-over-layers of per-layer losses (:222); 'residual' the loss of the
  mean over layer outputs (:219-221).
* Per-layer mean gradient division by each layer's realised iteration count
  (GNN_BaseClass.py:239-241 applied per layer).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.models.core import _entity_mask, gnn_forward, regularization
from gnn_tpu.models.engine import BaseModel
from gnn_tpu.models.gnn import GNNedgeBased, GNNgraphBased, GNNnodeBased
from gnn_tpu.training.losses import get_loss
from gnn_tpu.training.optimizers import make_optimizer


def update_graph_batch(gb: GraphBatch, state, out_entity, *, get_state: bool,
                       get_output: bool, focus: str) -> GraphBatch:
    """Augment node/arc labels with the previous layer's state/output
    (reference LGNN.update_graph, LGNN.py:227-260). Works on the ORIGINAL gb."""
    nodeplus, arcplus = [], []
    if get_state:
        nodeplus.append(state)
    if get_output:
        mask = _entity_mask(gb).astype(out_entity.dtype)[:, None]
        scattered = out_entity * mask  # scatter_nd equivalent: zero where unmasked
        if focus == "a":
            arcplus.append(scattered)
        else:
            nodeplus.append(scattered)
    nodes = jnp.concatenate([gb.nodes] + nodeplus, axis=1) if nodeplus else gb.nodes
    arcs = jnp.concatenate([gb.arc_labels] + arcplus, axis=1) if arcplus else gb.arc_labels
    # label dims changed -> the constant-aggregation caches no longer apply
    return gb.replace(nodes=nodes, arc_labels=arcs,
                      agg_arcs_cache=None, agg_nodes_cache=None)


def _forward_any(spec, params, bn, gb, rng, training):
    """Dispatch a layer forward: homogeneous GNNSpec or CompositeGNNSpec
    (heterogeneous per-type nets) — layers of either kind can be stacked."""
    from gnn_tpu.models.composite import CompositeGNNSpec, composite_forward
    if isinstance(spec, CompositeGNNSpec):
        return composite_forward(spec, params, bn, gb, rng, training)
    return gnn_forward(spec, params, bn, gb, rng, training)


# one module-level jitted dispatch: serial-mode augmentation calls it once per
# batch per layer, and the jit cache must persist across those calls (a fresh
# jax.jit wrapper per call would retrace every time)
_jit_forward_any = jax.jit(_forward_any, static_argnames=("spec", "training"))


def _reg_any(spec, p):
    from gnn_tpu.models.composite import (CompositeGNNSpec,
                                          composite_regularization)
    if isinstance(spec, CompositeGNNSpec):
        return composite_regularization(spec, p)
    return regularization(spec, p)


def lgnn_forward(specs, params, bns, gb: GraphBatch, rng, training: bool,
                 get_state: bool, get_output: bool):
    """Run the layer stack. Returns (iters_list, outs_list, states_last,
    new_bns_tuple). outs are target-aligned [Tp, DT] rows per layer."""
    rngs = jax.random.split(rng, len(specs))
    iters, outs, new_bns = [], [], []
    gtmp = gb
    state = None
    for idx, spec in enumerate(specs):
        res = _forward_any(spec, params[idx], bns[idx], gtmp, rngs[idx], training)
        iters.append(res["iters"])
        outs.append(res["out"])
        new_bns.append(res["bn"])
        state = res["state"]
        if idx + 1 < len(specs):
            gtmp = update_graph_batch(gb, res["state"], res["out_entity"],
                                      get_state=get_state, get_output=get_output,
                                      focus=spec.focus)
    return iters, outs, state, tuple(new_bns)


def _lgnn_loss(specs, loss_name, loss_args, gb, outs, training_mode: str):
    lf = get_loss(loss_name)
    sel = gb.sel_mask.astype(outs[0].dtype)
    w = gb.sample_weights
    if training_mode == "residual":
        per = lf(gb.targets, jnp.mean(jnp.stack(outs), axis=0), **loss_args) * w
    else:  # 'parallel' formulation is also the evaluation-time loss (LGNN.py:222)
        per = jnp.mean(jnp.stack([lf(gb.targets, o, **loss_args) for o in outs]),
                       axis=0) * w
    return jnp.sum(per * sel)


@partial(jax.jit, static_argnames=("specs", "loss_name", "loss_args_t", "optimizer",
                                   "mean", "get_state", "get_output", "training_mode"))
def _lgnn_train_impl(specs, params, bns, opt_state, gb, rng, *, loss_name,
                     loss_args_t, optimizer, mean, get_state, get_output,
                     training_mode):
    loss_args = dict(loss_args_t)

    def loss_fn(p):
        iters, outs, _, new_bns = lgnn_forward(specs, p, bns, gb, rng, True,
                                               get_state, get_output)
        loss = _lgnn_loss(specs, loss_name, loss_args, gb, outs, training_mode)
        loss = loss + sum(_reg_any(s, pi) for s, pi in zip(specs, p))
        return loss, (iters, new_bns)

    grads, (iters, new_bns) = jax.grad(loss_fn, has_aux=True)(params)
    if mean:
        # per-layer division of state-net grads by that layer's iterations
        grads = tuple(
            {**g, "state": jax.tree_util.tree_map(
                lambda x: x / jnp.maximum(it, 1.0), g["state"])}
            for g, it in zip(grads, iters))
    from gnn_tpu.training.optimizers import thaw_config
    opt = make_optimizer(thaw_config(optimizer))
    updates, opt_state = opt.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
    return params, new_bns, opt_state, jnp.stack(iters)


@partial(jax.jit, static_argnames=("specs", "loss_name", "loss_args_t", "training",
                                   "get_state", "get_output", "training_mode"))
def _lgnn_eval_impl(specs, params, bns, gb, rng, *, loss_name, loss_args_t,
                    training, get_state, get_output, training_mode):
    iters, outs, state, _ = lgnn_forward(specs, params, bns, gb, rng, training,
                                         get_state, get_output)
    mode = training_mode if training else "parallel"
    loss = _lgnn_loss(specs, loss_name, dict(loss_args_t), gb, outs, mode)
    return jnp.stack(iters), loss, tuple(outs), state


def make_lgnn_edge_sharded_train_step(specs, loss_name: str,
                                      loss_args: Optional[dict],
                                      optimizer_cfg: dict, mesh,
                                      axis: str = "graph", mean: bool = True,
                                      get_state: bool = False,
                                      get_output: bool = True,
                                      training_mode: str = "parallel",
                                      edges_sorted: bool = True):
    """Edge-sharded LGNN training step: the WHOLE layer stack runs inside one
    shard_map over an edge-partitioned batch (parallel/edge_shard.py). Every
    layer's propagation psums its partial aggregations per iteration; the
    update_graph_batch augmentation stays consistent because node-level
    arrays are replicated and arc-level arrays (focus 'a' output scatter)
    are shard-local on both sides of the concat. Covers the
    'parallel'/'residual' loss formulations; 'serial' trains layers
    standalone and passes the mesh down (LGNN.train)."""
    import dataclasses as _dc

    from jax.sharding import PartitionSpec as P

    from gnn_tpu.parallel.edge_shard import _gb_pspecs
    sspecs = tuple(_dc.replace(sp, shard_axis=axis) for sp in specs)
    focus = specs[0].focus
    largs = dict(loss_args or {})
    opt = make_optimizer(optimizer_cfg)

    def shard_loss(params, bns, gb, rng):
        iters, outs, _, new_bns = lgnn_forward(sspecs, params, bns, gb, rng,
                                               True, get_state, get_output)
        loss = _lgnn_loss(sspecs, loss_name, largs, gb, outs, training_mode)
        return loss, (jnp.stack(iters), new_bns)

    mapped = jax.shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P(), P(), _gb_pspecs(axis, focus, edges_sorted), P()),
        out_specs=(P(), (P(), P())), check_vma=False)

    @jax.jit
    def step(params, bns, opt_state, gb, rng):
        def loss_fn(p):
            loss, aux = mapped(p, bns, gb, rng)
            return (loss + sum(_reg_any(s, pi)
                               for s, pi in zip(sspecs, p)), aux)

        grads, (iters, new_bns) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            # per-layer division of state-net grads by that layer's realised
            # iterations (GNN_BaseClass.py:239-241 applied per layer)
            grads = tuple(
                {**g, "state": jax.tree_util.tree_map(
                    lambda x, it=it: x / jnp.maximum(it, 1.0), g["state"])}
                for g, it in zip(grads, iters))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, new_bns, opt_state, iters

    return step


def make_lgnn_dp_train_step(specs, loss_name: str, loss_args: Optional[dict],
                            optimizer_cfg: dict, mesh, axis: str = "data",
                            mean: bool = True, get_state: bool = False,
                            get_output: bool = True,
                            training_mode: str = "parallel"):
    """Data-parallel LGNN training step (mirrors
    parallel/data_parallel.make_dp_train_step for the layer stack): one
    stacked GraphBatch shard per device, per-replica stack grads pmean-ed
    over ICI, replicated update. Covers the 'parallel' and 'residual' loss
    formulations (LGNN.py:304-307); 'serial' trains layers standalone —
    use the per-layer DP step for that.

    step(params, bns, opt_state, stacked_gb, rngs) with params/bns tuples of
    per-layer pytrees; build stacked_gb with parallel.shard_batches."""
    from jax.sharding import PartitionSpec as P

    if training_mode not in ("parallel", "residual"):
        raise ValueError("DP LGNN step covers 'parallel'/'residual' modes")
    specs = tuple(specs)
    loss_args = dict(loss_args or {})
    opt = make_optimizer(optimizer_cfg)

    def per_replica(params, bns, gb, rng):
        gb = jax.tree_util.tree_map(lambda x: x[0], gb)
        rng = rng[0]

        def loss_fn(p):
            iters, outs, _, new_bns = lgnn_forward(specs, p, bns, gb, rng,
                                                   True, get_state, get_output)
            loss = _lgnn_loss(specs, loss_name, loss_args, gb, outs,
                              training_mode)
            loss = loss + sum(_reg_any(s, pi) for s, pi in zip(specs, p))
            return loss, (iters, new_bns)

        grads, (iters, new_bns) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            # per-layer division of state-net grads by that layer's realised
            # iteration count (GNN_BaseClass.py:239-241 applied per layer)
            grads = tuple(
                {**g, "state": jax.tree_util.tree_map(
                    lambda x: x / jnp.maximum(it, 1.0), g["state"])}
                for g, it in zip(grads, iters))
        grads = jax.lax.pmean(grads, axis)
        new_bns = jax.lax.pmean(new_bns, axis)
        iters = jax.lax.pmean(jnp.stack(iters), axis)
        return grads, new_bns, iters

    mapped = jax.shard_map(
        per_replica, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(params, bns, opt_state, stacked_gb, rngs):
        grads, new_bns, iters = mapped(params, bns, stacked_gb, rngs)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, new_bns, opt_state, iters

    return step


class LGNN(BaseModel):
    """Stack of L homogeneous GNNs (reference LGNN.py:13)."""

    def __init__(self, gnns: List[GNNnodeBased], get_state: bool, get_output: bool,
                 optimizer="adam", loss_function: str = "categorical_crossentropy",
                 loss_arguments: Optional[dict] = None, addressed_problem: str = "c",
                 extra_metrics: Optional[dict] = None,
                 extra_metrics_arguments: Optional[dict] = None,
                 path_writer: str = "writer/", namespace: str = "LGNN") -> None:
        gnns_type = set(type(i) for i in gnns)
        if len(gnns_type) != 1:
            raise TypeError("parameter <gnn> must contain gnns of the same type")
        super().__init__(optimizer, loss_function, loss_arguments, addressed_problem,
                         extra_metrics, extra_metrics_arguments, path_writer, namespace)
        self.get_state = bool(get_state)
        self.get_output = bool(get_output)
        self.gnns = list(gnns)
        self.LAYERS = len(gnns)
        self.GNNS_TYPE = list(gnns_type)[0]
        self.namespace = [f"{namespace} - GNN{i}" for i in range(self.LAYERS)]
        self.training_mode: Optional[str] = None
        for gnn, name in zip(self.gnns, self.namespace):
            gnn.namespace = [name]
            gnn.path_writer = f"{self.path_writer}{name}/"
        self._opt = make_optimizer(self.optimizer_config)
        self.opt_state = self._opt.init(self._params())
        self._rng = jax.random.key(np.random.randint(2 ** 31))

    # ------------------------------------------------------------- plumbing
    @property
    def _specs(self):
        return tuple(g.spec for g in self.gnns)

    def _params(self):
        return tuple(g.params for g in self.gnns)

    def _bns(self):
        return tuple(g.bn for g in self.gnns)

    def _set_params(self, params, bns) -> None:
        for g, p, b in zip(self.gnns, params, bns):
            g.params, g.bn = p, b

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    @property
    def focus(self) -> str:
        return self.gnns[0].spec.focus

    def to_batch(self, g: Graph) -> GraphBatch:
        return self.gnns[0].to_batch(g)

    def _opt_tuple(self):
        from gnn_tpu.training.optimizers import freeze_config
        return freeze_config(self.optimizer_config)

    def _loss_args_t(self):
        return tuple(sorted(self.loss_args.items()))

    # ----------------------------------------------------------------- copy
    def copy(self, *, path_writer: str = "", namespace: str = "",
             copy_weights: bool = True) -> "LGNN":
        if not path_writer:
            path_writer = self.path_writer[:-1] + "_copied/"
        if not namespace:
            namespace = "LGNN"
        return self.__class__(
            gnns=[g.copy(copy_weights=copy_weights) for g in self.gnns],
            get_state=self.get_state, get_output=self.get_output,
            optimizer=dict(self.optimizer_config), loss_function=self.loss_function,
            loss_arguments=self.loss_args, addressed_problem=self.addressed_problem,
            extra_metrics=self.extra_metrics, extra_metrics_arguments=self.mt_args,
            path_writer=path_writer, namespace=namespace)

    # ------------------------------------------------------------ save/load
    def save(self, path: str) -> None:
        """Per-layer GNN folders + config.json (reference LGNN.py:83-101)."""
        if path[-1] != "/":
            path += "/"
        os.makedirs(path, exist_ok=True)
        for i, gnn in enumerate(self.gnns):
            gnn.save(f"{path}GNN{i}/")
        gnns_type = {GNNnodeBased: "n", GNNedgeBased: "a", GNNgraphBased: "g"}
        config = {"get_state": self.get_state, "get_output": self.get_output,
                  "loss_function": self.loss_function, "loss_arguments": self.loss_args,
                  "optimizer": self.optimizer_config,
                  "addressed_problem": self.addressed_problem,
                  "gnns_type": gnns_type[self.GNNS_TYPE]}
        with open(f"{path}config.json", "w") as f:
            json.dump(config, f)

    @classmethod
    def load(cls, path: str, path_writer: Optional[str] = None, namespace: str = "LGNN",
             extra_metrics: Optional[dict] = None,
             extra_metrics_arguments: Optional[dict] = None) -> "LGNN":
        """Load from folder (reference LGNN.py:104-141; safe deserialisation)."""
        if path[-1] != "/":
            path += "/"
        if path_writer is None:
            path_writer = f"{path}writer"
        with open(f"{path}config.json") as f:
            config = json.load(f)
        gnns_type = {"n": GNNnodeBased, "a": GNNedgeBased, "g": GNNgraphBased}
        klass = gnns_type[config.pop("gnns_type")]
        layer_dirs = sorted(d for d in os.listdir(path)
                            if os.path.isdir(os.path.join(path, d)) and d.startswith("GNN"))
        gnns = [klass.load(f"{path}{d}", path_writer=f"{path_writer}{namespace} - {d}/",
                           namespace="GNN") for d in layer_dirs]
        return cls(gnns=gnns, optimizer=config.pop("optimizer"),
                   loss_function=config.pop("loss_function"),
                   loss_arguments=config.pop("loss_arguments"),
                   addressed_problem=config.pop("addressed_problem"),
                   get_state=config.pop("get_state"), get_output=config.pop("get_output"),
                   extra_metrics=extra_metrics,
                   extra_metrics_arguments=extra_metrics_arguments,
                   path_writer=path_writer, namespace=namespace)

    # -------------------------------------------------------------- weights
    def trainable_variables(self):
        return ([g.params["state"] for g in self.gnns],
                [g.params["output"] for g in self.gnns])

    def get_weights(self):
        ws, wo = [], []
        for g in self.gnns:
            s, o = g.get_weights()
            ws.append(s[0])
            wo.append(o[0])
        return ws, wo

    def set_weights(self, weights_state, weights_output) -> None:
        assert len(weights_state) == len(weights_output) == self.LAYERS
        for g, ws, wo in zip(self.gnns, weights_state, weights_output):
            g.set_weights([ws], [wo])

    def _weight_summaries(self):
        out = []
        for g, ns in zip(self.gnns, self.namespace):
            for item in g._weight_summaries():
                out.append((ns, item[1], item[2]))
        return out

    # ----------------------------------------------------------- prediction
    def Loop(self, g: Union[Graph, GraphBatch], *, training: bool = False):
        """(iters_list, state, outs_list) (reference LGNN.py:263-290)."""
        gb = g if isinstance(g, GraphBatch) else self.to_batch(g)
        iters, loss, outs, state = _lgnn_eval_impl(
            self._specs, self._params(), self._bns(), gb, self._next_rng(),
            loss_name=self.loss_function, loss_args_t=self._loss_args_t(),
            training=training, get_state=self.get_state, get_output=self.get_output,
            training_mode=self.training_mode or "parallel")
        sel = np.asarray(gb.sel_mask)
        outs_np = [np.asarray(o)[sel] for o in outs]
        return [float(i) for i in np.asarray(iters)], np.asarray(state), outs_np

    def __call__(self, g):
        return self.Loop(g, training=False)[-1][-1]

    def predict(self, g, idx: Union[int, list, range, str] = -1):
        """Selected layer outputs in test mode (reference LGNN.py:172-198)."""
        all_layers = range(self.LAYERS)
        if isinstance(idx, int):
            assert idx in list(all_layers) + [-1]
        elif isinstance(idx, (list, range)):
            assert all(i in all_layers for i in idx)
            idx = sorted(idx)
        elif idx == "all":
            idx = list(all_layers)
        else:
            raise ValueError("param <idx> must be 1.int; 2.list of ordered ints "
                             "in range(self.LAYERS); 3. str 'all'")
        out = self.Loop(g, training=False)[-1]
        return out[idx] if isinstance(idx, int) else [out[i] for i in idx]

    # ------------------------------------------------------------ checkpoint
    def _ckpt_params(self):
        return self._params()

    def _ckpt_bn(self):
        return self._bns()

    def _ckpt_restore(self, params, bn) -> None:
        self._set_params(params, bn)

    # ------------------------------------------------------------- evaluate
    def evaluate_single_graph(self, gb, training: bool) -> tuple:
        gb = gb if isinstance(gb, GraphBatch) else self.to_batch(gb)
        iters, loss, outs, _ = _lgnn_eval_impl(
            self._specs, self._params(), self._bns(), gb, self._next_rng(),
            loss_name=self.loss_function, loss_args_t=self._loss_args_t(),
            training=training, get_state=self.get_state, get_output=self.get_output,
            training_mode=self.training_mode or "parallel")
        sel = np.asarray(gb.sel_mask)
        targs = np.asarray(gb.targets)[sel]
        out_last = np.asarray(outs[-1])[sel]
        return [float(i) for i in np.asarray(iters)], float(loss), targs, out_last

    # ------------------------------------------------------------ train step
    def training_step(self, gb: GraphBatch, mean: bool) -> None:
        params, bns, self.opt_state, _ = _lgnn_train_impl(
            self._specs, self._params(), self._bns(), self.opt_state, gb,
            self._next_rng(), loss_name=self.loss_function,
            loss_args_t=self._loss_args_t(), optimizer=self._opt_tuple(), mean=mean,
            get_state=self.get_state, get_output=self.get_output,
            training_mode=self.training_mode or "parallel")
        self._set_params(params, bns)

    def training_step_dp(self, batches, mean: bool, mesh, axis: str = "data") -> None:
        """One data-parallel step over the layer stack (train(mesh=...)):
        make_lgnn_dp_train_step covers the 'parallel'/'residual' losses;
        'serial' trains layers standalone and passes the mesh down."""
        from gnn_tpu.parallel.data_parallel import shard_batches
        key = ("dp", mesh, axis, mean)
        if not hasattr(self, "_dp_fns"):
            self._dp_fns = {}
        if key not in self._dp_fns:
            self._dp_fns[key] = make_lgnn_dp_train_step(
                self._specs, self.loss_function, self.loss_args,
                self.optimizer_config, mesh, axis, mean=mean,
                get_state=self.get_state, get_output=self.get_output,
                training_mode=self.training_mode or "parallel")
        stacked = shard_batches(batches, mesh, axis)
        rngs = jax.random.split(self._next_rng(), len(batches))
        params, bns, self.opt_state, _ = self._dp_fns[key](
            self._params(), self._bns(), self.opt_state, stacked, rngs)
        self._set_params(params, bns)

    def _shard_for(self, gb: GraphBatch, mesh, axis: str, strategy: str):
        if strategy == "edge":
            from gnn_tpu.parallel.edge_shard import shard_edges
            return shard_edges(gb, mesh, axis)
        from gnn_tpu.parallel.node_shard import shard_nodes
        return shard_nodes(gb, mesh, axis)

    def training_step_sharded(self, gb_sharded, mean: bool, mesh, axis: str,
                              strategy: str) -> None:
        """One optimizer step with every layer's propagation sharded across
        mesh[axis] (train(mesh=..., mesh_strategy='edge'|'node')): the whole
        stack runs inside one shard_map."""
        # edges_sorted is static metadata inside the edge-sharded pspecs — a
        # mismatched flag fails as an opaque pytree-structure error, so it
        # is plumbed from the actual batch and keyed into the cache
        es = bool(getattr(gb_sharded, "edges_sorted", True))
        key = (strategy, mesh, axis, mean, es)
        if not hasattr(self, "_sh_fns"):
            self._sh_fns = {}
        if key not in self._sh_fns:
            kw = {}
            if strategy == "edge":
                builder = make_lgnn_edge_sharded_train_step
                kw["edges_sorted"] = es
            else:
                from gnn_tpu.parallel.node_shard import \
                    make_lgnn_node_sharded_train_step
                builder = make_lgnn_node_sharded_train_step
            self._sh_fns[key] = builder(
                self._specs, self.loss_function, self.loss_args,
                self.optimizer_config, mesh, axis, mean=mean,
                get_state=self.get_state, get_output=self.get_output,
                training_mode=self.training_mode or "parallel", **kw)
        params, bns, self.opt_state, _ = self._sh_fns[key](
            self._params(), self._bns(), self.opt_state, gb_sharded,
            self._next_rng())
        self._set_params(params, bns)

    # ----------------------------------------------------------------- train
    def train(self, gTr, epochs: int, gVa=None, update_freq: int = 10,
              max_fails: int = 10, observed_metric: str = "Loss", policy: str = "min",
              *, mean: bool = True, training_mode: str = "parallel",
              verbose: int = 3, profile_dir=None,
              nan_policy: str = "none", mesh=None,
              mesh_axis=None, mesh_strategy: str = "data") -> None:
        assert training_mode in ("parallel", "serial", "residual")
        if self.training_mode is not None and self.training_mode != training_mode:
            raise ValueError("LGNN training_mode is sticky once set (reference LGNN.py:313-316)")
        self.training_mode = training_mode

        gTr = self.checktype(gTr)
        gVa = self.checktype(gVa)

        if training_mode == "serial":
            gTr1 = list(gTr)
            gVa1 = list(gVa) if gVa is not None else None
            for idx, gnn in enumerate(self.gnns):
                if verbose in (1, 3):
                    print(f"\n\n------------------- GNN{idx} -------------------\n")
                gnn.train(gTr1, epochs, gVa1, update_freq, max_fails, observed_metric,
                          policy, mean=mean, verbose=verbose,
                          nan_policy=nan_policy, mesh=mesh,
                          mesh_axis=mesh_axis, mesh_strategy=mesh_strategy)
                gTr1 = [self._augment(gnn, base, cur) for base, cur in zip(gTr, gTr1)]
                if gVa:
                    gVa1 = [self._augment(gnn, base, cur) for base, cur in zip(gVa, gVa1)]
        else:
            super().train(gTr, epochs, gVa, update_freq, max_fails, observed_metric,
                          policy, mean=mean, verbose=verbose,
                          profile_dir=profile_dir, nan_policy=nan_policy,
                          mesh=mesh, mesh_axis=mesh_axis,
                          mesh_strategy=mesh_strategy)

    def _augment(self, gnn: GNNnodeBased, base: GraphBatch, cur: GraphBatch) -> GraphBatch:
        """Run one layer on its (already augmented) input graph and augment the
        ORIGINAL graph with the resulting state/output (LGNN.py:336-340)."""
        res = _jit_forward_any(
            gnn.spec, gnn.params, gnn.bn, cur, self._next_rng(), training=False)
        return update_graph_batch(base, res["state"], res["out_entity"],
                                  get_state=self.get_state, get_output=self.get_output,
                                  focus=gnn.spec.focus)
