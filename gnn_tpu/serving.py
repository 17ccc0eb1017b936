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
  link, and only the selected output rows come back.

Supports every model family: GNNnodeBased / GNNedgeBased / GNNgraphBased,
the Composite* heterogeneous classes, and LGNN stacks (last-layer outputs,
the reference's ``LGNN.predict`` default, LGNN.py:268-283).
"""

from __future__ import annotations

import time
from typing import List, Sequence, Union

import jax
import numpy as np

from gnn_tpu.config import pad_size
from gnn_tpu.graphs.batch import GraphBatch, from_graphs_blocked
from gnn_tpu.graphs.graph import Graph


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
                 fused_layout: bool = True, bucket_multiple: int = 8):
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
        self.stats = {"requests": 0, "compiles": 0, "bucket_hits": 0,
                      "last_ms": None, "last_compile_s": None}

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
        gb = from_graphs_blocked(list(glist), block_w=self._block_w,
                                 focus=self._focus, edge_pad=ep,
                                 target_pad=tp, fused_layout=self._fused)
        B = gb.adj_blocks.shape[0]
        Bb = pad_size(B, multiple=self._bucket_multiple,
                      pow2_from=self._bucket_multiple)
        if Bb != B:
            # re-pack onto the block-count bucket (host-side; the second pack
            # is the price of a small executable set)
            gb = from_graphs_blocked(list(glist), block_w=self._block_w,
                                     focus=self._focus, edge_pad=ep,
                                     target_pad=tp, min_blocks=Bb,
                                     fused_layout=self._fused)
        return gb

    # ---------------------------------------------------------- compilation
    def _executable(self, gb: GraphBatch):
        key = tuple((tuple(leaf.shape), str(leaf.dtype))
                    for leaf in jax.tree_util.tree_leaves(gb))
        exe = self._compiled.get(key)
        if exe is None:
            t0 = time.perf_counter()
            exe = jax.jit(self._fn).lower(self._params, self._bn,
                                          gb).compile()
            self._compiled[key] = exe
            self.stats["compiles"] += 1
            self.stats["last_compile_s"] = time.perf_counter() - t0
        else:
            self.stats["bucket_hits"] += 1
        return exe

    def warmup(self, requests: Sequence[Union[Graph, Sequence[Graph]]]):
        """Precompile the buckets a traffic sample lands on. Returns the
        number of distinct executables compiled."""
        before = self.stats["compiles"]
        for req in requests:
            glist = [req] if isinstance(req, Graph) else list(req)
            self._executable(self.build_batch(glist))
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
        single = isinstance(graphs, Graph)
        glist = [graphs] if single else list(graphs)
        gb = self.build_batch(glist)
        exe = self._executable(gb)
        t0 = time.perf_counter()
        out = exe(self._params, self._bn, gb)
        sel = np.asarray(gb.sel_mask)
        rows = np.asarray(out)[sel]        # device->host barrier
        self.stats["last_ms"] = (time.perf_counter() - t0) * 1e3
        self.stats["requests"] += 1
        if not split:
            return rows
        # targets are concatenated in request order (graphs/batch.py) and
        # sel filters order-preservingly -> per-graph spans from sel counts
        spans = np.cumsum([g.targets.shape[0] for g in glist])
        counts = [int(sel[a:b].sum()) for a, b in
                  zip(np.concatenate([[0], spans[:-1]]), spans)]
        parts: List[np.ndarray] = np.split(rows, np.cumsum(counts)[:-1])
        return parts[0] if single else parts

    def __call__(self, graphs):
        return self.predict(graphs)
