"""User-facing GNN models: node / edge / graph focused.

API mirrors the reference classes (GNN/GNN.py:18-333) — constructor signature,
train/evaluate/test/LKO via the engine, Loop/__call__, copy, save/load — while
the computation is the functional TPU core (models/core.py). Keras Sequentials
are replaced by MLPSpec architecture descriptions + param pytrees; the unsafe
eval()-based optimizer deserialisation (GNN.py:140) is replaced by a plain
JSON config.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.models.core import (GNNSpec, gnn_init, make_eval_step, make_train_step)
from gnn_tpu.models.engine import BaseModel, tree_from_npz, tree_to_npz
from gnn_tpu.ops.mlp import MLPSpec
from gnn_tpu.training.optimizers import make_optimizer


class GNNnodeBased(BaseModel):
    """GNN for node-focused problems (reference GNN.py:18-280)."""

    _focus = "n"

    def __init__(self, net_state: Union[MLPSpec, dict], net_output: Union[MLPSpec, dict],
                 optimizer="adam", loss_function: str = "categorical_crossentropy",
                 loss_arguments: Optional[dict] = None, state_vect_dim: int = 0,
                 max_iteration: int = 5, threshold: float = 0.01,
                 addressed_problem: str = "c", extra_metrics: Optional[dict] = None,
                 extra_metrics_arguments: Optional[dict] = None,
                 path_writer: str = "writer/", namespace: str = "GNN",
                 aggregation: str = "auto", grad_mode: str = "unroll",
                 ift_backward_iters: int = 20, state_dtype: Optional[str] = None,
                 seed: Optional[int] = None, dtype=jnp.float32) -> None:
        super().__init__(optimizer, loss_function, loss_arguments, addressed_problem,
                         extra_metrics, extra_metrics_arguments, path_writer, namespace)
        if isinstance(net_state, dict):
            net_state = MLPSpec.from_config(net_state)
        if isinstance(net_output, dict):
            net_output = MLPSpec.from_config(net_output)
        self.spec = GNNSpec(focus=self._focus, state_spec=net_state,
                            output_spec=net_output, state_dim=int(state_vect_dim),
                            max_iteration=int(max_iteration), threshold=float(threshold),
                            aggregation=aggregation, grad_mode=grad_mode,
                            ift_backward_iters=int(ift_backward_iters),
                            state_dtype=state_dtype)
        self.seed = seed
        self.dtype = dtype
        self._rng = jax.random.key(np.random.randint(2 ** 31) if seed is None else seed)
        self._rng, init_rng = jax.random.split(self._rng)
        self.params, self.bn = gnn_init(self.spec, init_rng, dtype)
        self._opt = make_optimizer(self.optimizer_config)
        self.opt_state = self._opt.init(self.params)
        self._train_fns = {}
        self._eval_fn = make_eval_step(self.spec, self.loss_function, self.loss_args)

    # --------------------------------------------------------------- config
    @property
    def state_vect_dim(self) -> int:
        return self.spec.state_dim

    @property
    def max_iteration(self) -> int:
        return self.spec.max_iteration

    @property
    def state_threshold(self) -> float:
        return self.spec.threshold

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def to_batch(self, g: Graph) -> GraphBatch:
        if g.focus != self._focus:
            raise ValueError(f"graph focus {g.focus!r} does not match model focus {self._focus!r}")
        return GraphBatch.from_graph(g, dtype=self.dtype)

    # ----------------------------------------------------------------- copy
    def copy(self, *, path_writer: str = "", namespace: str = "",
             copy_weights: bool = True):
        if not path_writer:
            path_writer = self.path_writer[:-1] + "_copied/"
        if not namespace:
            namespace = "GNN"
        new = self.__class__(
            net_state=self.spec.state_spec, net_output=self.spec.output_spec,
            optimizer=dict(self.optimizer_config), loss_function=self.loss_function,
            loss_arguments=self.loss_args, state_vect_dim=self.spec.state_dim,
            max_iteration=self.spec.max_iteration, threshold=self.spec.threshold,
            addressed_problem=self.addressed_problem, extra_metrics=self.extra_metrics,
            extra_metrics_arguments=self.mt_args, path_writer=path_writer,
            namespace=namespace, aggregation=self.spec.aggregation,
            grad_mode=self.spec.grad_mode,
            ift_backward_iters=self.spec.ift_backward_iters,
            state_dtype=self.spec.state_dtype, dtype=self.dtype)
        if copy_weights:
            new.params = jax.tree_util.tree_map(jnp.array, self.params)
            new.bn = jax.tree_util.tree_map(jnp.array, self.bn)
            new.opt_state = new._opt.init(new.params)
        return new

    # ------------------------------------------------------------ save/load
    def save(self, path: str) -> None:
        """Save to folder: config.json + params/bn .npz (reference GNN.py:93-111)."""
        if path[-1] != "/":
            path += "/"
        os.makedirs(path, exist_ok=True)
        config = {"model_class": type(self).__name__,
                  "net_state": self.spec.state_spec.to_config(),
                  "net_output": self.spec.output_spec.to_config(),
                  "optimizer": self.optimizer_config,
                  "loss_function": self.loss_function, "loss_arguments": self.loss_args,
                  "max_iteration": self.spec.max_iteration,
                  "threshold": self.spec.threshold,
                  "addressed_problem": self.addressed_problem,
                  "state_vect_dim": self.spec.state_dim,
                  "aggregation": self.spec.aggregation,
                  "grad_mode": self.spec.grad_mode,
                  "ift_backward_iters": self.spec.ift_backward_iters,
                  "state_dtype": self.spec.state_dtype}
        with open(f"{path}config.json", "w") as f:
            json.dump(config, f)
        tree_to_npz(f"{path}params.npz", self.params)
        tree_to_npz(f"{path}bn.npz", self.bn)

    @classmethod
    def load(cls, path: str, path_writer: Optional[str] = None, namespace: str = "GNN",
             extra_metrics: Optional[dict] = None,
             extra_metrics_arguments: Optional[dict] = None):
        """Load from folder (reference GNN.py:114-149; safe deserialisation)."""
        if path[-1] != "/":
            path += "/"
        if path_writer is None:
            path_writer = f"{path}writer"
        with open(f"{path}config.json") as f:
            config = json.load(f)
        model_class = config.pop("model_class", cls.__name__)
        klass = {"GNNnodeBased": GNNnodeBased, "GNNedgeBased": GNNedgeBased,
                 "GNNgraphBased": GNNgraphBased}.get(model_class, cls)
        model = klass(net_state=config.pop("net_state"),
                      net_output=config.pop("net_output"),
                      optimizer=config.pop("optimizer"),
                      loss_function=config.pop("loss_function"),
                      loss_arguments=config.pop("loss_arguments"),
                      state_vect_dim=config.pop("state_vect_dim"),
                      max_iteration=config.pop("max_iteration"),
                      threshold=config.pop("threshold"),
                      addressed_problem=config.pop("addressed_problem"),
                      aggregation=config.pop("aggregation", "auto"),
                      grad_mode=config.pop("grad_mode", "unroll"),
                      ift_backward_iters=config.pop("ift_backward_iters", 20),
                      state_dtype=config.pop("state_dtype", None),
                      extra_metrics=extra_metrics,
                      extra_metrics_arguments=extra_metrics_arguments,
                      path_writer=path_writer, namespace=namespace)
        model.params = tree_from_npz(f"{path}params.npz", model.params)
        model.bn = tree_from_npz(f"{path}bn.npz", model.bn)
        model.opt_state = model._opt.init(model.params)
        return model

    # -------------------------------------------------------------- weights
    def trainable_variables(self):
        return [self.params["state"]], [self.params["output"]]

    def get_weights(self):
        host = jax.tree_util.tree_map(np.asarray, self.params)
        hbn = jax.tree_util.tree_map(np.asarray, self.bn)
        return [(host["state"], hbn["state"])], [(host["output"], hbn["output"])]

    def set_weights(self, weights_state, weights_output) -> None:
        assert len(weights_state) == len(weights_output) == 1
        ps, bs = weights_state[0]
        po, bo = weights_output[0]
        self.params = {"state": jax.tree_util.tree_map(jnp.asarray, ps),
                       "output": jax.tree_util.tree_map(jnp.asarray, po)}
        self.bn = {"state": jax.tree_util.tree_map(jnp.asarray, bs),
                   "output": jax.tree_util.tree_map(jnp.asarray, bo)}

    def _weight_summaries(self):
        out = []
        for net, code in (("state", "N1"), ("output", "N2")):
            leaves = [(jax.tree_util.keystr(kp), np.asarray(v))
                      for kp, v in jax.tree_util.tree_leaves_with_path(self.params[net])]
            out.append((self.namespace[0], code, leaves))
        return out

    # ----------------------------------------------------------- forward API
    def Loop(self, g: Union[Graph, GraphBatch], *, training: bool = False):
        """(iters, state, out) for one graph (reference GNN.py:251-280).
        `out` contains the selected (set ∧ output masked) rows, host numpy."""
        gb = g if isinstance(g, GraphBatch) else self.to_batch(g)
        iters, loss, out_rows, state, out_entity = self._eval_fn(
            self.params, self.bn, gb, self._next_rng(), training=training)
        sel = np.asarray(gb.sel_mask)
        return float(iters), np.asarray(state), np.asarray(out_rows)[sel]

    def __call__(self, g: Union[Graph, GraphBatch]):
        return self.Loop(g, training=False)[-1]

    # ------------------------------------------------------------- evaluate
    def evaluate_single_graph(self, gb, training: bool) -> tuple:
        gb = gb if isinstance(gb, GraphBatch) else self.to_batch(gb)
        iters, loss, out_rows, _, _ = self._eval_fn(
            self.params, self.bn, gb, self._next_rng(), training=training)
        sel = np.asarray(gb.sel_mask)
        targs = np.asarray(gb.targets)[sel]
        outs = np.asarray(out_rows)[sel]
        return float(iters), float(loss), targs, outs

    # ------------------------------------------------------------ train step
    def training_step(self, gb: GraphBatch, mean: bool) -> None:
        if mean not in self._train_fns:
            self._train_fns[mean] = make_train_step(
                self.spec, self.loss_function, self.loss_args,
                self.optimizer_config, mean=mean)
        self.params, self.bn, self.opt_state, _ = self._train_fns[mean](
            self.params, self.bn, self.opt_state, gb, self._next_rng())

    def training_step_dp(self, batches, mean: bool, mesh, axis: str = "data") -> None:
        """One data-parallel step: len(batches) == mesh[axis] equal-shape
        GraphBatches, per-replica grads pmean-ed, one replicated update
        (parallel/data_parallel.py; composite specs use their own builder)."""
        from gnn_tpu.parallel.data_parallel import shard_batches
        key = (mesh, axis, mean)
        if key not in self._train_fns:
            from gnn_tpu.models.composite import (CompositeGNNSpec,
                                                  make_composite_dp_train_step)
            from gnn_tpu.parallel.data_parallel import make_dp_train_step
            builder = (make_composite_dp_train_step
                       if isinstance(self.spec, CompositeGNNSpec)
                       else make_dp_train_step)
            self._train_fns[key] = builder(
                self.spec, self.loss_function, self.loss_args,
                self.optimizer_config, mesh, axis, mean=mean)
        stacked = shard_batches(batches, mesh, axis)
        rngs = jax.random.split(self._next_rng(), len(batches))
        self.params, self.bn, self.opt_state, _ = self._train_fns[key](
            self.params, self.bn, self.opt_state, stacked, rngs)

    def _shard_for(self, gb: GraphBatch, mesh, axis: str, strategy: str):
        if strategy == "edge":
            from gnn_tpu.parallel.edge_shard import shard_edges
            return shard_edges(gb, mesh, axis)
        from gnn_tpu.parallel.node_shard import shard_nodes
        return shard_nodes(gb, mesh, axis)

    def training_step_sharded(self, gb_sharded, mean: bool, mesh, axis: str,
                              strategy: str) -> None:
        """One optimizer step on a single batch whose propagation is sharded
        across mesh[axis] (train(mesh=..., mesh_strategy='edge'|'node'));
        per-iteration partial aggregations psum / all_gather owner-computes
        (parallel/edge_shard.py, node_shard.py)."""
        # edges_sorted is static metadata inside the shard_map pspecs — a
        # mismatched flag fails as an opaque pytree-structure error, so it
        # is plumbed from the actual batch and keyed into the cache
        es = bool(getattr(gb_sharded, "edges_sorted", True))
        key = (strategy, mesh, axis, mean, es)
        if key not in self._train_fns:
            kw = {}
            if strategy == "edge":
                from gnn_tpu.models.composite import (
                    CompositeGNNSpec, make_composite_edge_sharded_train_step)
                from gnn_tpu.parallel.edge_shard import \
                    make_edge_sharded_train_step
                builder = (make_composite_edge_sharded_train_step
                           if isinstance(self.spec, CompositeGNNSpec)
                           else make_edge_sharded_train_step)
                kw["edges_sorted"] = es
            else:
                from gnn_tpu.parallel.node_shard import \
                    make_node_sharded_train_step
                builder = make_node_sharded_train_step
            self._train_fns[key] = builder(
                self.spec, self.loss_function, self.loss_args,
                self.optimizer_config, mesh, axis, mean=mean, **kw)
        self.params, self.bn, self.opt_state, _ = self._train_fns[key](
            self.params, self.bn, self.opt_state, gb_sharded,
            self._next_rng())


class GNNedgeBased(GNNnodeBased):
    """GNN for edge-focused problems (reference GNN.py:286-302): readout on
    [state_src, state_dst, arc_label] per arc, masked over arcs."""

    _focus = "a"


class GNNgraphBased(GNNnodeBased):
    """GNN for graph-focused problems (reference GNN.py:308-333): node outputs
    average-pooled per graph; targets not set/output filtered."""

    _focus = "g"


class CompositeGNNnodeBased(GNNnodeBased):
    """Heterogeneous GNN: one state net per node type (models/composite.py).
    The reference only signalled composite graphs (GraphGenerator.py:8 dead
    import); full engine integration — train/early-stop/test/LKO/save/load —
    is provided here. Constructor takes `net_states`, a sequence of MLPSpec
    (or configs), one per node type."""

    _focus = "n"

    def __init__(self, net_states, net_output: Union[MLPSpec, dict],
                 optimizer="adam", loss_function: str = "categorical_crossentropy",
                 loss_arguments: Optional[dict] = None,
                 max_iteration: int = 5, threshold: float = 0.01,
                 addressed_problem: str = "c", extra_metrics: Optional[dict] = None,
                 extra_metrics_arguments: Optional[dict] = None,
                 path_writer: str = "writer/", namespace: str = "CompositeGNN",
                 aggregation: str = "auto", grad_mode: str = "unroll",
                 ift_backward_iters: int = 20, state_dim: int = 0,
                 seed: Optional[int] = None,
                 dtype=jnp.float32) -> None:
        from gnn_tpu.models.composite import (CompositeGNNSpec, composite_init,
                                              make_composite_full_eval)
        BaseModel.__init__(self, optimizer, loss_function, loss_arguments,
                           addressed_problem, extra_metrics,
                           extra_metrics_arguments, path_writer, namespace)
        net_states = tuple(MLPSpec.from_config(s) if isinstance(s, dict) else s
                           for s in net_states)
        if isinstance(net_output, dict):
            net_output = MLPSpec.from_config(net_output)
        self.spec = CompositeGNNSpec(
            focus=self._focus, state_specs=net_states, output_spec=net_output,
            max_iteration=int(max_iteration), threshold=float(threshold),
            aggregation=aggregation, grad_mode=grad_mode,
            ift_backward_iters=int(ift_backward_iters),
            state_dim=int(state_dim))
        self.seed = seed
        self.dtype = dtype
        self._rng = jax.random.key(np.random.randint(2 ** 31) if seed is None else seed)
        self._rng, init_rng = jax.random.split(self._rng)
        self.params, self.bn = composite_init(self.spec, init_rng, dtype)
        self._opt = make_optimizer(self.optimizer_config)
        self.opt_state = self._opt.init(self.params)
        self._train_fns = {}
        self._eval_fn = make_composite_full_eval(self.spec, self.loss_function,
                                                 self.loss_args)

    def training_step(self, gb: GraphBatch, mean: bool) -> None:
        from gnn_tpu.models.composite import make_composite_train_step
        if mean not in self._train_fns:
            self._train_fns[mean] = make_composite_train_step(
                self.spec, self.loss_function, self.loss_args,
                self.optimizer_config, mean=mean)
        self.params, self.bn, self.opt_state, _ = self._train_fns[mean](
            self.params, self.bn, self.opt_state, gb, self._next_rng())

    # --------------------------------------------------------- copy/save/load
    def copy(self, *, path_writer: str = "", namespace: str = "",
             copy_weights: bool = True):
        if not path_writer:
            path_writer = self.path_writer[:-1] + "_copied/"
        if not namespace:
            namespace = "CompositeGNN"
        new = self.__class__(
            net_states=self.spec.state_specs, net_output=self.spec.output_spec,
            optimizer=dict(self.optimizer_config), loss_function=self.loss_function,
            loss_arguments=self.loss_args, max_iteration=self.spec.max_iteration,
            threshold=self.spec.threshold, addressed_problem=self.addressed_problem,
            extra_metrics=self.extra_metrics, extra_metrics_arguments=self.mt_args,
            path_writer=path_writer, namespace=namespace,
            aggregation=self.spec.aggregation, grad_mode=self.spec.grad_mode,
            ift_backward_iters=self.spec.ift_backward_iters,
            state_dim=self.spec.state_dim, dtype=self.dtype)
        if copy_weights:
            new.params = jax.tree_util.tree_map(jnp.array, self.params)
            new.bn = jax.tree_util.tree_map(jnp.array, self.bn)
            new.opt_state = new._opt.init(new.params)
        return new

    def save(self, path: str) -> None:
        if path[-1] != "/":
            path += "/"
        os.makedirs(path, exist_ok=True)
        config = {"model_class": type(self).__name__,
                  "net_states": [s.to_config() for s in self.spec.state_specs],
                  "net_output": self.spec.output_spec.to_config(),
                  "optimizer": self.optimizer_config,
                  "loss_function": self.loss_function,
                  "loss_arguments": self.loss_args,
                  "max_iteration": self.spec.max_iteration,
                  "threshold": self.spec.threshold,
                  "addressed_problem": self.addressed_problem,
                  "aggregation": self.spec.aggregation,
                  "grad_mode": self.spec.grad_mode,
                  "ift_backward_iters": self.spec.ift_backward_iters,
                  "state_dim": self.spec.state_dim}
        with open(f"{path}config.json", "w") as f:
            json.dump(config, f)
        tree_to_npz(f"{path}params.npz", self.params)
        tree_to_npz(f"{path}bn.npz", self.bn)

    @classmethod
    def load(cls, path: str, path_writer: Optional[str] = None,
             namespace: str = "CompositeGNN", extra_metrics: Optional[dict] = None,
             extra_metrics_arguments: Optional[dict] = None):
        if path[-1] != "/":
            path += "/"
        if path_writer is None:
            path_writer = f"{path}writer"
        with open(f"{path}config.json") as f:
            config = json.load(f)
        model_class = config.pop("model_class", cls.__name__)
        klass = {"CompositeGNNnodeBased": CompositeGNNnodeBased,
                 "CompositeGNNedgeBased": CompositeGNNedgeBased,
                 "CompositeGNNgraphBased": CompositeGNNgraphBased}.get(model_class, cls)
        model = klass(net_states=config.pop("net_states"),
                      net_output=config.pop("net_output"),
                      optimizer=config.pop("optimizer"),
                      loss_function=config.pop("loss_function"),
                      loss_arguments=config.pop("loss_arguments"),
                      max_iteration=config.pop("max_iteration"),
                      threshold=config.pop("threshold"),
                      addressed_problem=config.pop("addressed_problem"),
                      aggregation=config.pop("aggregation", "auto"),
                      grad_mode=config.pop("grad_mode", "unroll"),
                      ift_backward_iters=config.pop("ift_backward_iters", 20),
                      state_dim=config.pop("state_dim", 0),
                      extra_metrics=extra_metrics,
                      extra_metrics_arguments=extra_metrics_arguments,
                      path_writer=path_writer, namespace=namespace)
        model.params = tree_from_npz(f"{path}params.npz", model.params)
        model.bn = tree_from_npz(f"{path}bn.npz", model.bn)
        model.opt_state = model._opt.init(model.params)
        return model

    # -------------------------------------------------------------- weights
    def trainable_variables(self):
        return [list(self.params["state"])], [self.params["output"]]

    def get_weights(self):
        host = jax.tree_util.tree_map(np.asarray, self.params)
        hbn = jax.tree_util.tree_map(np.asarray, self.bn)
        return ([(host["state"], hbn["state"])], [(host["output"], hbn["output"])])

    def _weight_summaries(self):
        out = []
        for t, p in enumerate(self.params["state"]):
            leaves = [(jax.tree_util.keystr(kp), np.asarray(v))
                      for kp, v in jax.tree_util.tree_leaves_with_path(p)]
            out.append((self.namespace[0], f"N1T{t}", leaves))
        leaves = [(jax.tree_util.keystr(kp), np.asarray(v))
                  for kp, v in jax.tree_util.tree_leaves_with_path(self.params["output"])]
        out.append((self.namespace[0], "N2", leaves))
        return out


class CompositeGNNedgeBased(CompositeGNNnodeBased):
    """Heterogeneous GNN for edge-focused problems: composite propagation,
    per-arc readout [state_src, state_dst, arc_label] masked over arcs
    (the composite counterpart of GNNedgeBased, GNN.py:286-302)."""

    _focus = "a"


class CompositeGNNgraphBased(CompositeGNNnodeBased):
    """Heterogeneous GNN for graph-focused problems: composite propagation,
    average-pooled readout (targets not set/output filtered)."""

    _focus = "g"
