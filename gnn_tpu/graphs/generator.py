"""Streaming minibatch generators.

The reference ships a broken/unreachable `GNN/GraphGenerator.py` (imports a
module that does not exist, GraphGenerator.py:8) signalling an abandoned
streaming-minibatch direction (SURVEY.md §2.1). This module provides the
working equivalents:

* GraphDataGenerator — iterate merged-graph batches over a graph list with
  shuffle-on-epoch-end (ref GraphGenerator.py:15-69 intent).
* SingleGraphDataGenerator — minibatch ONE big graph by splitting its
  supervised entities into per-batch set_masks (ref :72-128 intent): every
  batch is the same padded GraphBatch with a different set/sel mask, so jit
  compiles once.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.graph import Graph


class GraphDataGenerator:
    """Iterable over merged GraphBatches with optional epoch-end shuffling."""

    def __init__(self, graphs: Sequence[Graph], batch_size: int = 32,
                 shuffle: bool = True, focus: Optional[str] = None,
                 aggregation_mode: Optional[str] = None, rng=None,
                 build_plan: bool = False):
        if not graphs:
            raise ValueError("graphs must be non-empty")
        self.graphs = list(graphs)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.focus = focus or graphs[0].focus
        self.aggregation_mode = aggregation_mode or graphs[0].aggregation_mode
        self.build_plan = build_plan
        self._rng = np.random.default_rng(rng)

    def __len__(self) -> int:
        return -(-len(self.graphs) // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.graphs))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = [self.graphs[j] for j in order[i:i + self.batch_size]]
            merged = Graph.merge(chunk, focus=self.focus,
                                 aggregation_mode=self.aggregation_mode)
            yield GraphBatch.from_graph(merged, build_plan=self.build_plan)

    def on_epoch_end(self) -> None:  # reference-compatible hook
        pass


class SingleGraphDataGenerator:
    """Minibatch a single big graph via rotating set_masks.

    Each yielded batch shares the SAME padded arrays (one jit compilation);
    only set_mask/sel_mask change, selecting a different slice of the
    supervised entities per step.
    """

    def __init__(self, graph: Graph, batch_size: int = 1024, shuffle: bool = True,
                 rng=None, build_plan: bool = False):
        if graph.focus == "g":
            raise ValueError("single-graph minibatching applies to node/edge focus")
        self.graph = graph
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._rng = np.random.default_rng(rng)
        # edge focus: keep original arc order so with_set_mask's
        # original-order indices align with the batch's entity axis
        self._base = GraphBatch.from_graph(graph, build_plan=build_plan,
                                           sort_edges=(graph.focus != "a"))
        # supervised entities eligible for batching: set ∧ output masked
        self._eligible = np.nonzero(graph.set_mask & graph.output_mask)[0]

    def __len__(self) -> int:
        return max(-(-len(self._eligible) // self.batch_size), 1)

    def __iter__(self):
        idx = self._eligible.copy()
        if self.shuffle:
            self._rng.shuffle(idx)
        n_ent = len(self.graph.set_mask)
        for i in range(0, len(idx), self.batch_size):
            mask = np.zeros(n_ent, dtype=bool)
            mask[idx[i:i + self.batch_size]] = True
            yield self._base.with_set_mask(mask)
