"""Production inference: AOT-compiled, shape-bucketed predictors.

The reference framework ends at train/evaluate/test
(GNN_BaseClass.py:150-258) — it has no deployment surface. This module is
the TPU-native serving path on top of the same model zoo:

* **AOT compilation** — each padding bucket's forward is lowered and
  compiled ahead of traffic (``jax.jit(...).lower(...).compile()``), so a
  request never pays a Python trace or an XLA compile; a bucket hit is one
  executable launch (0.73 ms device time for the full-MUTAG forward,
  NOTES_r2.md).
* **Shape-bucket routing** — requests of arbitrary size are padded onto a
  small set of shape buckets (config.pad_size semantics for edges/targets,
  block-count buckets for the block-dense layout), each owning one compiled
  executable. Steady-state traffic recompiles nothing.
* **Device-resident weights** — parameters/BN statistics upload once at
  construction; per request only the padded batch crosses the host-device
  link, and only the (bucket-padded) target rows come back.

Supports every model family: GNNnodeBased / GNNedgeBased / GNNgraphBased,
the Composite* heterogeneous classes, and LGNN stacks (last-layer outputs,
the reference's ``LGNN.predict`` default, LGNN.py:268-283).
``ShardedPredictor`` adds data-parallel serving over a device mesh: the
request is load-balanced across chips (no collectives) and outputs are
reassembled in request order.
"""

from __future__ import annotations

import itertools
import time
from collections import OrderedDict
from typing import List, Optional, Sequence, Union

import jax
import numpy as np

from gnn_tpu.config import pad_size
from gnn_tpu.graphs.batch import (GraphBatch, from_graphs_blocked,
                                  packed_block_count)
from gnn_tpu.graphs.graph import Graph


_TOKEN_COUNTER = itertools.count()


def _lookup_or_compile(compiled: dict, stats: dict, key, build):
    """Shared bucket-cache bookkeeping: compile-on-miss (timed into stats),
    count hits otherwise."""
    exe = compiled.get(key)
    if exe is None:
        t0 = time.perf_counter()
        exe = build()
        compiled[key] = exe
        stats["compiles"] += 1
        stats["last_compile_s"] = time.perf_counter() - t0
    else:
        stats["bucket_hits"] += 1
    return exe


def _forward_callable(model):
    """(fn, params, bn) with fn(params, bn, gb) -> target-aligned [Tp, DT]
    output rows, closed over the model's static spec(s). The rng is a fixed
    key: dropout is inactive at inference and BN uses running statistics, so
    eval outputs are rng-independent (models/core.py::propagate)."""
    from gnn_tpu.models.lgnn import LGNN, lgnn_forward
    key = jax.random.key(0)
    if isinstance(model, LGNN):
        specs = model._specs
        gs, go = model.get_state, model.get_output

        def fn(params, bns, gb):
            _, outs, _, _ = lgnn_forward(specs, params, bns, gb, key,
                                         False, gs, go)
            return outs[-1]

        return fn, model._params(), model._bns()

    spec = model.spec
    from gnn_tpu.models.composite import CompositeGNNSpec, composite_forward
    from gnn_tpu.models.core import gnn_forward
    fwd = (composite_forward if isinstance(spec, CompositeGNNSpec)
           else gnn_forward)

    def fn(params, bn, gb):
        return fwd(spec, params, bn, gb, key, training=False)["out"]

    return fn, model.params, model.bn


class PendingPrediction:
    """In-flight request handle from :meth:`Predictor.predict_async`: the
    executable has been launched; ``result()`` performs the device→host pull
    (the only blocking step) and the per-graph split."""

    def __init__(self, out, gb, glist, single: bool, split: bool):
        self._out, self._gb = out, gb
        self._glist, self._single, self._split = glist, single, split
        # start the device->host copy NOW (non-blocking; the runtime pushes
        # the bytes as soon as the execution completes). Without this every
        # result() pays its own full round-trip sequentially — with it, the
        # transfers of all in-flight requests stream concurrently
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass

    def result(self):
        sel = np.asarray(self._gb.sel_mask)
        rows = np.asarray(self._out)[sel]      # device->host barrier
        if not self._split:
            return rows
        # targets are concatenated in request order (graphs/batch.py) and
        # sel filters order-preservingly -> per-graph spans from sel counts
        spans = np.cumsum([g.targets.shape[0] for g in self._glist])
        counts = [int(sel[a:b].sum()) for a, b in
                  zip(np.concatenate([[0], spans[:-1]]), spans)]
        parts: List[np.ndarray] = np.split(rows, np.cumsum(counts)[:-1])
        return parts[0] if self._single else parts


class Predictor:
    """Serve a trained model: ``Predictor(model).predict(graphs)``.

    :param model: trained GNN*/Composite*/LGNN instance (weights snapshot is
        taken at construction — later training does not leak into serving).
    :param blocked: build block-dense batches (the fused-kernel production
        path). False falls back to index-vector batches (segment aggregation)
        with config.pad_size buckets.
    :param block_w: block width for the blocked layout.
    :param fused_layout: precompute the loop/dep split + packed adjacency so
        ``aggregation='auto'`` specs dispatch to the looped Pallas kernels.
    :param bucket_multiple: block-count bucket granularity (blocked path).
    """

    def __init__(self, model, *, blocked: bool = True, block_w: int = 128,
                 fused_layout: bool = True, bucket_multiple: int = 8,
                 cache_batches: int = 256):
        fn, params, bn = _forward_callable(model)
        self._fn = fn
        self._params = jax.device_put(params)
        self._bn = jax.device_put(bn)
        self._focus = getattr(model, "focus", None) or model.spec.focus
        self._blocked = bool(blocked)
        self._block_w = int(block_w)
        self._fused = bool(fused_layout)
        self._bucket_multiple = int(bucket_multiple)
        self._compiled: dict = {}
        # packed-batch LRU: the host pack + per-leaf H2D transfers dominate
        # small-request latency through the tunnelled runtime (~70 ms around
        # a ~1.5 ms launch, SERVING_r4.json) — repeat graphs skip both.
        # Keyed by per-Graph identity tokens: a Graph is treated as
        # IMMUTABLE once served (mutating nodes/arcs in place after a
        # predict() serves stale results until eviction; build a new Graph
        # instead). cache_batches=0 disables.
        self._batch_cache: "OrderedDict" = OrderedDict()
        self._cache_cap = int(cache_batches)
        self.stats = {"requests": 0, "compiles": 0, "bucket_hits": 0,
                      "batch_cache_hits": 0, "last_ms": None,
                      "last_pack_ms": None, "last_compile_s": None}

    @staticmethod
    def _graph_token(g: Graph) -> int:
        tok = getattr(g, "_predictor_token", None)
        if tok is None:
            tok = next(_TOKEN_COUNTER)
            g._predictor_token = tok
        return tok

    def _cached_batch(self, glist: Sequence[Graph]):
        """Device-resident packed batch for a request, LRU-cached by the
        request's graph identities."""
        if self._cache_cap <= 0:
            return self.build_batch(glist)
        key = tuple(self._graph_token(g) for g in glist)
        gb = self._batch_cache.get(key)
        if gb is not None:
            self._batch_cache.move_to_end(key)
            self.stats["batch_cache_hits"] += 1
            return gb
        t0 = time.perf_counter()
        gb = jax.device_put(self.build_batch(glist))
        self.stats["last_pack_ms"] = (time.perf_counter() - t0) * 1e3
        self._batch_cache[key] = gb
        if len(self._batch_cache) > self._cache_cap:
            self._batch_cache.popitem(last=False)
        return gb

    # ------------------------------------------------------------- batching
    def _check(self, glist: Sequence[Graph]) -> None:
        if not glist:
            raise ValueError("empty request: predict needs at least one Graph")
        for g in glist:
            if g.focus != self._focus:
                raise ValueError(f"graph focus {g.focus!r} does not match "
                                 f"model focus {self._focus!r}")

    def build_batch(self, glist: Sequence[Graph]) -> GraphBatch:
        """Pad a request onto its shape bucket (public so callers can build
        off the hot path / on another thread)."""
        self._check(glist)
        if not self._blocked:
            g = glist[0] if len(glist) == 1 else Graph.merge(
                list(glist), focus=self._focus,
                aggregation_mode=glist[0].aggregation_mode)
            return GraphBatch.from_graph(g)   # config.pad_size buckets
        # serving buckets are log-spaced (powers of two with midpoints) —
        # much coarser than the training-time config.pad_size multiples, so a
        # traffic mix settles on a handful of executables
        ep = pad_size(sum(g.n_arcs for g in glist), multiple=256,
                      pow2_from=256)
        tp = pad_size(sum(g.targets.shape[0] for g in glist), multiple=128,
                      pow2_from=128)
        # block bucket from the cheap packing arithmetic — the (expensive)
        # array pack below runs exactly once per request
        Bb = pad_size(packed_block_count(glist, self._block_w),
                      multiple=self._bucket_multiple,
                      pow2_from=self._bucket_multiple)
        return from_graphs_blocked(list(glist), block_w=self._block_w,
                                   focus=self._focus, edge_pad=ep,
                                   target_pad=tp, min_blocks=Bb,
                                   fused_layout=self._fused)

    # ---------------------------------------------------------- compilation
    def _executable(self, gb: GraphBatch):
        return _lookup_or_compile(
            self._compiled, self.stats, self._shape_key(gb),
            lambda: jax.jit(self._fn).lower(self._params, self._bn,
                                            gb).compile())

    def _prepare(self, glist: Sequence[Graph]):
        """Request -> device operand (overridden by ShardedPredictor)."""
        return self.build_batch(glist)

    def warmup(self, requests: Sequence[Union[Graph, Sequence[Graph]]]):
        """Precompile the buckets a traffic sample lands on. Returns the
        number of distinct executables compiled."""
        before = self.stats["compiles"]
        for req in requests:
            glist = [req] if isinstance(req, Graph) else list(req)
            self._executable(self._prepare(glist))
        return self.stats["compiles"] - before

    # -------------------------------------------------------------- predict
    def predict(self, graphs: Union[Graph, Sequence[Graph]],
                split: bool = True):
        """Outputs for a request.

        :param graphs: one Graph or a sequence (served as one device batch).
        :param split: True returns one [Ti, DT] array per input graph (rows
            follow each graph's own target order); False returns the
            concatenated selected rows.
        """
        t0 = time.perf_counter()
        res = self.predict_async(graphs, split=split).result()
        self.stats["last_ms"] = (time.perf_counter() - t0) * 1e3
        return res

    def predict_async(self, graphs: Union[Graph, Sequence[Graph]],
                      split: bool = True) -> "PendingPrediction":
        """Dispatch a request WITHOUT blocking on the device→host pull.

        Returns a :class:`PendingPrediction`; its ``result()`` blocks and
        returns exactly what ``predict`` would. On a remote/tunnelled
        runtime a synchronous predict pays one full round-trip per request
        (~30 ms through the TPU tunnel vs ~1.5 ms device time —
        SERVING_r5.json ``tunnel_floor_ms``); keeping several requests in
        flight amortises the round-trip so steady-state per-request cost
        approaches device time."""
        single = isinstance(graphs, Graph)
        glist = [graphs] if single else list(graphs)
        gb = self._cached_batch(glist)
        exe = self._executable(gb)
        out = exe(self._params, self._bn, gb)    # async: no host barrier
        self.stats["requests"] += 1
        return PendingPrediction(out, gb, glist, single, split)

    def __call__(self, graphs):
        return self.predict(graphs)

    # -------------------------------------------------------------- export
    @staticmethod
    def _shape_key(gb) -> tuple:
        return tuple((tuple(leaf.shape), str(leaf.dtype))
                     for leaf in jax.tree_util.tree_leaves(gb))

    def export(self, path: str, requests) -> int:
        """Serialize this predictor as a self-contained deployment artifact:
        one StableHLO module per shape bucket (jax.export) with the weight
        snapshot BAKED IN as constants — a frozen pure function of the
        batch, no model/engine code or weight files needed to run it — plus
        the batch-routing config. One bucket per distinct shape in
        `requests`; returns the number of buckets written. Load with
        serving.load_exported(path)."""
        import json
        import os as _os
        from jax import export as jexport
        _register_batch_serialization()
        if path and path[-1] != "/":
            path += "/"
        _os.makedirs(path, exist_ok=True)
        fn, params, bn = self._fn, self._params, self._bn
        frozen = jax.jit(lambda gb: fn(params, bn, gb))
        buckets, seen = [], set()
        for req in requests:
            glist = [req] if isinstance(req, Graph) else list(req)
            gb = self.build_batch(glist)
            key = self._shape_key(gb)
            if key in seen:
                continue
            seen.add(key)
            exp = jexport.export(frozen)(gb)
            fname = f"bucket_{len(buckets)}.stablehlo"
            with open(path + fname, "wb") as f:
                f.write(exp.serialize())
            buckets.append({"file": fname,
                            "key": [[list(s), d] for s, d in key]})
        with open(path + "config.json", "w") as f:
            json.dump({"focus": self._focus, "blocked": self._blocked,
                       "block_w": self._block_w, "fused": self._fused,
                       "bucket_multiple": self._bucket_multiple,
                       "buckets": buckets}, f, indent=1)
        return len(buckets)


_BATCH_SER_DONE = False


def _register_batch_serialization() -> None:
    """Teach jax.export to (de)serialize the batch pytrees (GraphBatch and
    the node-sharded NodeShardBatch): auxdata is a tuple of JSON-safe
    statics (strs/bools/ints) — encoded as JSON, no pickle."""
    global _BATCH_SER_DONE
    if _BATCH_SER_DONE:
        return
    import json
    from jax import export as jexport
    from gnn_tpu.parallel.node_shard import NodeShardBatch
    for klass, name in ((GraphBatch, "gnn_tpu.graphs.batch.GraphBatch"),
                        (NodeShardBatch,
                         "gnn_tpu.parallel.node_shard.NodeShardBatch")):
        jexport.register_pytree_node_serialization(
            klass,
            serialized_name=name,
            serialize_auxdata=lambda aux: json.dumps(list(aux)).encode(),
            deserialize_auxdata=lambda blob: tuple(json.loads(blob.decode())))
    _BATCH_SER_DONE = True


def load_exported(path: str, devices=None) -> "Predictor":
    """Reload a Predictor.export() artifact: batch routing + deserialized
    StableHLO bucket executables (weights baked in) — no model construction,
    no retracing. Requests must land on an exported bucket (warmup
    coverage); misses raise with the available buckets listed.

    :param devices: None serves on the default device. A list of jax.Device
        (or a Mesh) builds a DATA-PARALLEL deployment from the same artifact
        — the ShardedPredictor serving path with the exported modules
        compiled per device (artifacts are device-count agnostic; shards are
        the unit of execution). Requests need >= len(devices) graphs and
        each shard's shape must land on an exported bucket."""
    import json
    from jax import export as jexport
    _register_batch_serialization()
    if path and path[-1] != "/":
        path += "/"
    with open(path + "config.json") as f:
        cfg = json.load(f)
    sharded = devices is not None
    p = (ShardedPredictor if sharded else Predictor).__new__(
        ShardedPredictor if sharded else Predictor)
    p._params, p._bn = None, None   # baked into the exported modules
    p._focus = cfg["focus"]
    p._blocked = cfg["blocked"]
    p._block_w = cfg["block_w"]
    p._fused = cfg["fused"]
    p._bucket_multiple = cfg["bucket_multiple"]
    p._compiled = {}
    p._batch_cache = OrderedDict()
    p._cache_cap = 256
    p.stats = {"requests": 0, "compiles": 0, "bucket_hits": 0,
               "batch_cache_hits": 0, "last_ms": None, "last_pack_ms": None,
               "last_compile_s": None}
    exports = {}
    for b in cfg["buckets"]:
        with open(path + b["file"], "rb") as f:
            exp = jexport.deserialize(f.read())
        key = tuple((tuple(s), d) for s, d in b["key"])
        exports[key] = exp
        # predict() calls exe(params, bn, gb); the frozen module only takes gb
        p._compiled[key] = (lambda e: lambda _p, _b, gb: e.call(gb))(exp)
    known = sorted(b["file"] for b in cfg["buckets"])

    def _miss(kind):
        raise KeyError(
            f"{kind} shape bucket was not exported — re-export with a "
            f"covering warmup sample (have: {known})")

    if not sharded:
        def _executable(gb):
            exe = p._compiled.get(p._shape_key(gb))
            if exe is None:
                _miss("request")
            p.stats["bucket_hits"] += 1
            return exe

        p._executable = _executable
        p._fn = None   # exported artifacts replace the traced forward
        return p

    # data-parallel deployment over the exported buckets: per-device
    # compilation of the SAME modules, same load-balanced routing and async
    # dispatch as a live ShardedPredictor
    p._devices = (list(devices) if isinstance(devices, (list, tuple))
                  else devices.devices.flatten().tolist())
    p._ndev = len(p._devices)
    p._params_dev = [None] * p._ndev    # baked into the exported modules
    p._bn_dev = [None] * p._ndev
    dev_compiled: dict = {}

    def _executable_on(gb_d, d: int):
        key = (Predictor._shape_key(gb_d), d)
        exe = dev_compiled.get(key)
        if exe is None:
            exp = exports.get(key[0])
            if exp is None:
                _miss("shard")
            t0 = time.perf_counter()
            compiled = jax.jit(exp.call).lower(gb_d).compile()
            p.stats["compiles"] += 1
            p.stats["last_compile_s"] = time.perf_counter() - t0
            exe = (lambda c: lambda _p, _b, gb: c(gb))(compiled)
            dev_compiled[key] = exe
        else:
            p.stats["bucket_hits"] += 1
        return exe

    p._executable_on = _executable_on
    p._fn = None
    return p


def load_big_exported(path: str, mesh, axis: Optional[str] = None
                      ) -> "BigGraphPredictor":
    """Reload a BigGraphPredictor.export() artifact onto `mesh`: the
    deserialized shard_map modules serve node-sharded single-graph inference
    with no model construction or retracing. The mesh must have the SAME
    device count as the exporting deployment (the modules bake its
    shardings); `axis` defaults to the exporting axis name and must name a
    mesh axis. Requests must land on an exported padding bucket."""
    import json
    from jax import export as jexport
    _register_batch_serialization()
    if path and path[-1] != "/":
        path += "/"
    with open(path + "config.json") as f:
        cfg = json.load(f)
    if not cfg.get("big_graph"):
        raise ValueError("not a BigGraphPredictor artifact — use "
                         "serving.load_exported for Predictor artifacts")
    n_dev = int(np.prod(list(mesh.shape.values())))
    if n_dev != cfg["n_devices"]:
        raise ValueError(
            f"artifact was exported from a {cfg['n_devices']}-device mesh; "
            f"the loading mesh has {n_dev} (shard_map modules bake the "
            f"exporting mesh's shardings)")
    p = BigGraphPredictor.__new__(BigGraphPredictor)
    p._mesh = mesh
    p._axis = axis or cfg["axis"]
    p._focus = cfg["focus"]
    p._is_lgnn = cfg["is_lgnn"]
    if cfg.get("n_layers") is not None:
        p._n_layers = cfg["n_layers"]
    p._params, p._bn = None, None   # baked into the exported modules
    p._key = None
    p._fwd = None
    p._compiled = {}
    p.stats = {"requests": 0, "compiles": 0, "bucket_hits": 0,
               "last_ms": None, "last_compile_s": None}
    for b in cfg["buckets"]:
        with open(path + b["file"], "rb") as f:
            exp = jexport.deserialize(f.read())
        key = tuple((tuple(s), d) for s, d in b["key"])
        # predict() calls exe(params, bn, nb, key); the frozen module only
        # takes the sharded batch
        p._compiled[key] = (lambda e: lambda _p, _b, nb, _k: e.call(nb))(exp)
    known = sorted(b["file"] for b in cfg["buckets"])

    def _executable(nb):
        exe = p._compiled.get(Predictor._shape_key(nb))
        if exe is None:
            raise KeyError(
                f"request padding bucket was not exported — re-export with "
                f"a covering graph sample (have: {known})")
        p.stats["bucket_hits"] += 1
        return exe

    p._executable = _executable
    return p


class BigGraphPredictor:
    """Inference for single graphs too large for one chip: node states are
    sharded over ``mesh[axis]`` and each propagation iteration runs
    all_gather + owner-computes aggregation over ICI
    (parallel/node_shard.py — exact vs the single-device forward, tested).
    AOT-compiled per padding bucket like Predictor. Supports the homogeneous
    and composite families AND LGNN stacks (the whole layer stack — incl.
    mid-stack update_graph augmentation, LGNN.py:227-290 — runs inside one
    shard_map; ``predict(g)`` returns the last layer's rows, ``predict(g,
    idx)`` mirrors LGNN.predict's layer selection, LGNN.py:172-198)."""

    def __init__(self, model, mesh, *, axis: str = "graph"):
        from gnn_tpu.models.lgnn import LGNN
        from gnn_tpu.parallel.node_shard import (
            make_lgnn_node_sharded_forward, make_node_sharded_forward)
        from jax.sharding import NamedSharding, PartitionSpec as P
        self._mesh, self._axis = mesh, axis
        rep = NamedSharding(mesh, P())
        self._is_lgnn = isinstance(model, LGNN)
        if self._is_lgnn:
            self._focus = model._specs[0].focus
            self._n_layers = len(model._specs)
            self._params = jax.device_put(model._params(), rep)
            self._bn = jax.device_put(model._bns(), rep)
            self._fwd = make_lgnn_node_sharded_forward(
                model._specs, mesh, axis, get_state=model.get_state,
                get_output=model.get_output)
        else:
            self._focus = model.spec.focus
            self._spec = model.spec
            self._params = jax.device_put(model.params, rep)
            self._bn = jax.device_put(model.bn, rep)
            self._fwd = make_node_sharded_forward(model.spec, mesh, axis)
        self._key = jax.random.key(0)
        self._compiled: dict = {}
        self.stats = {"requests": 0, "compiles": 0, "bucket_hits": 0,
                      "last_ms": None, "last_compile_s": None}

    def _place(self, g: Graph):
        """Graph -> (padded batch, node-sharded placement on the mesh)."""
        from gnn_tpu.parallel.node_shard import shard_nodes
        gb = GraphBatch.from_graph(g)          # config.pad_size buckets
        return gb, shard_nodes(gb, self._mesh, self._axis)

    def _executable(self, nb):
        return _lookup_or_compile(
            self._compiled, self.stats, Predictor._shape_key(nb),
            lambda: self._fwd.lower(self._params, self._bn, nb,
                                    self._key).compile())

    def export(self, path: str, graphs: Sequence[Graph]) -> int:
        """Serialize this node-sharded deployment: one StableHLO module per
        padding bucket (jax.export of the shard_map forward) with the
        replicated weight snapshot and rng key baked in as constants, plus
        the routing config. Unlike Predictor artifacts, the modules record
        the mesh's shardings, so the loading deployment must provide a mesh
        of the SAME device count (the config records it). Reload with
        serving.load_big_exported(path, mesh)."""
        import json
        import os as _os
        from jax import export as jexport
        _register_batch_serialization()
        if path and path[-1] != "/":
            path += "/"
        _os.makedirs(path, exist_ok=True)
        fwd, params, bn, key = self._fwd, self._params, self._bn, self._key
        frozen = jax.jit(lambda nb: fwd(params, bn, nb, key))
        buckets, seen = [], set()
        for g in graphs:
            _, nb = self._place(g)
            k = Predictor._shape_key(nb)
            if k in seen:
                continue
            seen.add(k)
            exp = jexport.export(frozen)(nb)
            fname = f"bucket_{len(buckets)}.stablehlo"
            with open(path + fname, "wb") as f:
                f.write(exp.serialize())
            buckets.append({"file": fname,
                            "key": [[list(s), d] for s, d in k]})
        n_dev = int(np.prod(list(self._mesh.shape.values())))
        with open(path + "config.json", "w") as f:
            json.dump({"big_graph": True, "focus": self._focus,
                       "axis": self._axis, "n_devices": n_dev,
                       "is_lgnn": self._is_lgnn,
                       "n_layers": getattr(self, "_n_layers", None),
                       "buckets": buckets}, f, indent=1)
        return len(buckets)

    def predict(self, g: Graph, idx=None):
        """Selected output rows for ONE (typically huge) Graph. For LGNN
        models, ``idx`` picks layers like LGNN.predict (int or list of ints;
        default -1 = last layer, the reference default LGNN.py:174)."""
        if g.focus != self._focus:
            raise ValueError(f"graph focus {g.focus!r} does not match "
                             f"model focus {self._focus!r}")
        if idx is not None and not self._is_lgnn:
            raise ValueError("idx selects LGNN layers; this model is not an LGNN")
        gb, nb = self._place(g)
        exe = self._executable(nb)
        t0 = time.perf_counter()
        _, out = exe(self._params, self._bn, nb, self._key)
        sel = np.asarray(gb.sel_mask)
        if self._is_lgnn:
            layers = np.asarray(out)           # [L, Tp, DT]
            if idx is None:
                rows = layers[-1][sel]
            elif isinstance(idx, int):
                rows = layers[idx][sel]
            else:
                rows = [layers[i][sel] for i in idx]
        else:
            rows = np.asarray(out)[sel]
        self.stats["last_ms"] = (time.perf_counter() - t0) * 1e3
        self.stats["requests"] += 1
        return rows

    def __call__(self, g: Graph):
        return self.predict(g)


class ShardedPredictor(Predictor):
    """Data-parallel serving across devices: the request's graphs are
    load-balanced over the mesh's devices and each device serves its shard
    with the SAME single-device executables as Predictor (compiled once per
    shape bucket per device), dispatched asynchronously so shards execute
    concurrently — inference is embarrassingly parallel, no collectives.
    Results are exactly what serving each shard as its own request returns
    (the reference's per-batch convergence semantics, GNN.py:202-220), and
    shards may have completely different shapes/structure (e.g. one shard
    holding an over-block_w graph with residual edges).

    :param mesh: jax.sharding.Mesh (all its devices are used) or a list of
        jax.Device. Requests need at least that many graphs.
    """

    def __init__(self, model, mesh, **kw):
        super().__init__(model, **kw)
        self._devices = (list(mesh) if isinstance(mesh, (list, tuple))
                         else mesh.devices.flatten().tolist())
        self._ndev = len(self._devices)
        # weights replicated once: one copy resident per device
        self._params_dev = [jax.device_put(self._params, d)
                            for d in self._devices]
        self._bn_dev = [jax.device_put(self._bn, d) for d in self._devices]

    def _split_request(self, glist: Sequence[Graph]) -> List[List[int]]:
        """Load-balance graph indices over devices (largest-first into the
        lightest shard; request order kept within each shard)."""
        n = self._ndev
        if len(glist) < n:
            raise ValueError(f"sharded request needs >= {n} graphs "
                             f"(one per device), got {len(glist)}")
        order = sorted(range(len(glist)), key=lambda i: -glist[i].n_nodes)
        shards: List[List[int]] = [[] for _ in range(n)]
        loads = [0] * n
        for i in order:
            j = int(np.argmin(loads))
            shards[j].append(i)
            loads[j] += glist[i].n_nodes
        return [sorted(s) for s in shards]

    def _executable_on(self, gb_d, d: int):
        key = (self._shape_key(gb_d), d)
        return _lookup_or_compile(
            self._compiled, self.stats, key,
            lambda: jax.jit(self._fn).lower(self._params_dev[d],
                                            self._bn_dev[d], gb_d).compile())

    def _placed_shards(self, glist: Sequence[Graph]):
        shards = self._split_request(glist)
        placed = []
        for d, idx in enumerate(shards):
            gb = self.build_batch([glist[i] for i in idx])
            placed.append((d, idx, jax.device_put(gb, self._devices[d])))
        return placed

    def warmup(self, requests: Sequence[Union[Graph, Sequence[Graph]]]):
        before = self.stats["compiles"]
        for req in requests:
            glist = [req] if isinstance(req, Graph) else list(req)
            for d, _, gb_d in self._placed_shards(glist):
                self._executable_on(gb_d, d)
        return self.stats["compiles"] - before

    def export(self, path: str, requests) -> int:
        """Serialize this data-parallel deployment as a STANDARD Predictor
        artifact (StableHLO buckets + routing config, weights baked in).
        Shards run the same single-device executables as Predictor, so the
        artifact is genuinely device-count agnostic: each request in
        `requests` is split into this deployment's shards and each shard's
        shape bucket is exported once. Reload single-device with
        serving.load_exported(path), or data-parallel on ANY device count
        with serving.load_exported(path, devices=...) — shard shapes must
        land on exported buckets (use the same per-device load for warmup
        coverage, or export from a deployment of the target size)."""
        shard_reqs: List[List[Graph]] = []
        for req in requests:
            glist = [req] if isinstance(req, Graph) else list(req)
            for idx in self._split_request(glist):
                shard_reqs.append([glist[i] for i in idx])
        return Predictor.export(self, path, shard_reqs)

    def predict(self, graphs: Union[Graph, Sequence[Graph]],
                split: bool = True):
        single = isinstance(graphs, Graph)
        glist = [graphs] if single else list(graphs)
        placed = self._placed_shards(glist)
        t0 = time.perf_counter()
        # launch every shard before pulling any result: jax dispatch is
        # async, so the per-device executions overlap
        launched = [(d, idx, gb_d,
                     self._executable_on(gb_d, d)(self._params_dev[d],
                                                  self._bn_dev[d], gb_d))
                    for d, idx, gb_d in placed]
        for _, _, _, out in launched:
            # start all device->host copies before any blocking pull so the
            # per-shard transfers stream concurrently (one round-trip total,
            # not one per shard — see PendingPrediction)
            try:
                out.copy_to_host_async()
            except AttributeError:
                pass
        results: List[np.ndarray] = [None] * len(glist)   # type: ignore
        for d, idx, gb_d, out in launched:
            sel = np.asarray(gb_d.sel_mask)
            rows = np.asarray(out)[sel]                   # host barrier
            spans = np.cumsum([glist[i].targets.shape[0] for i in idx])
            starts = np.concatenate([[0], spans[:-1]])
            counts = [int(sel[a:b].sum()) for a, b in zip(starts, spans)]
            for i, part in zip(idx, np.split(rows, np.cumsum(counts)[:-1])):
                results[i] = part
        self.stats["last_ms"] = (time.perf_counter() - t0) * 1e3
        self.stats["requests"] += 1
        if not split:
            return np.concatenate(results, axis=0)
        return results[0] if single else results
