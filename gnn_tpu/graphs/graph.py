"""Host-side graph container (numpy only — device work happens in GraphBatch).

Equivalent in capability to the reference `GraphObject`
(/root/reference/GNN/graph_class.py:14-327), re-designed TPU-first:

* The reference materialises three scipy.sparse matrices per graph — ArcNode
  (E x N incidence, graph_class.py:98-121), Adjacency (N x N, :90-95) and
  NodeGraph (N x G pooling, :132-144) — whose nonzero *values* encode the
  aggregation mode.  All three matmuls against them are edge/node-weighted
  segment sums, so here the sparse matrices degenerate to flat index vectors:
  `src`, `dst` (per edge), `graph_ids` (per node) plus precomputed per-edge
  aggregation weights (`edge_weights`) and per-node pooling weights
  (`pool_weights`).  Those vectors map directly onto `segment_sum` /
  one-hot-matmul kernels on the MXU; no sparse formats reach the device.

* Aggregation modes match graph_class.py:108-118 exactly:
    'sum'        -> w_e = 1
    'normalized' -> w_e = 1/E          (E = number of arcs in the graph)
    'average'    -> w_e = 1/indeg(dst) (in-degree of the destination node)

* `merge` performs the same disjoint-union batching as graph_class.py:285-319
  (index offsetting + block-diagonal NodeGraph, realised as graph-id offsets).

File formats (save/load .npy and .txt folders) are byte-compatible with the
reference (graph_class.py:191-281) so datasets can be moved between frameworks.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Sequence

import numpy as np

from gnn_tpu.config import floatx

AGGREGATIONS = ("average", "normalized", "sum")


class Graph:
    """A single (possibly merged) directed labelled graph.

    :param arcs: (E, 2+AL) matrix, arcs[i] = [src id, dst id, arc label...].
    :param nodes: (N, NL) node label matrix.
    :param targets: (T, DT) target matrix. T depends on focus: N' (node), E'
        (edge, output-masked counts) or G (graph).
    :param focus: 'n' node-based | 'a' arc-based | 'g' graph-based
        (reference name: problem_based).
    :param set_mask: bool (N,) or (E,) — Tr/Va/Te membership when the dataset is
        a single graph. Default all True.
    :param output_mask: bool, same length as set_mask — entities with known
        target. Default all True.
    :param sample_weights: scalar or (T,) per-target loss weights.
    :param node_graph: optional (N, G) pooling matrix (reference NodeGraph);
        kept for file parity. Internally reduced to graph_ids/pool_weights.
    :param aggregation_mode: 'average' | 'normalized' | 'sum'.
    """

    def __init__(self, arcs, nodes, targets, focus: str = "n",
                 set_mask=None, output_mask=None, sample_weights=1,
                 node_graph=None, aggregation_mode: str = "average",
                 node_types=None,
                 # reference-compatible aliases (GraphObject.__init__ kwargs)
                 problem_based: Optional[str] = None, NodeGraph=None, ArcNode=None):
        if problem_based is not None:
            focus = problem_based
        if NodeGraph is not None and node_graph is None:
            node_graph = NodeGraph
        del ArcNode  # derived from arcs + aggregation_mode; never stored
        if focus not in ("n", "a", "g"):
            raise ValueError("focus (problem_based) must be 'n', 'a' or 'g'")
        if aggregation_mode not in AGGREGATIONS:
            raise ValueError("ERROR: Unknown aggregation mode")

        dt = floatx()
        arcs = np.asarray(arcs)
        if arcs.ndim != 2 or arcs.shape[1] < 2:
            raise ValueError("arcs must be (E, 2+AL)")
        self.arcs = arcs.astype(dt)
        self.nodes = np.asarray(nodes).astype(dt)
        self.targets = np.asarray(targets).astype(dt)
        self.sample_weights = (np.asarray(sample_weights, dtype=np.float64)
                               * np.ones(self.targets.shape[0])).astype(dt)

        self.DIM_NODE_LABEL = self.nodes.shape[1]
        self.DIM_ARC_LABEL = self.arcs.shape[1] - 2
        self.DIM_TARGET = self.targets.shape[1]

        self.focus = focus
        self.aggregation_mode = aggregation_mode

        n_mask = {"n": self.nodes.shape[0], "a": self.arcs.shape[0], "g": self.nodes.shape[0]}[focus]
        self.set_mask = (np.ones(n_mask, dtype=bool) if set_mask is None
                         else np.asarray(set_mask).astype(bool).reshape(-1))
        self.output_mask = (np.ones(len(self.set_mask), dtype=bool) if output_mask is None
                            else np.asarray(output_mask).astype(bool).reshape(-1))
        if len(self.set_mask) != len(self.output_mask):
            raise ValueError("Error - len(<set_mask>) != len(<output_mask>)")

        # graph pooling structure (reference NodeGraph, graph_class.py:132-144):
        # for focus 'g' a (N, G) column-normalised block matrix. We keep the
        # dense matrix for save/load parity and derive segment form.
        self.NodeGraph = None
        if node_graph is not None:
            self.NodeGraph = np.asarray(node_graph).astype(dt)
            if self.NodeGraph.ndim == 1:
                self.NodeGraph = self.NodeGraph[:, None]
        elif focus == "g":
            n = self.nodes.shape[0]
            self.NodeGraph = np.full((n, 1), 1.0 / max(n, 1), dtype=dt)

        # heterogeneous ("composite") graphs: integer node type per node,
        # selecting the per-type state network (models/composite.py). The
        # reference signalled this direction but never shipped it
        # (GraphGenerator.py:8 imports a module absent from the tree).
        self.node_types = None
        if node_types is not None:
            self.node_types = np.asarray(node_types, dtype=np.int32).reshape(-1)
            if len(self.node_types) != self.nodes.shape[0]:
                raise ValueError("len(node_types) != number of nodes")

    # ---------------------------------------------------------------- properties
    @property
    def problem_based(self) -> str:  # reference-compatible alias
        return self.focus

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def n_arcs(self) -> int:
        return self.arcs.shape[0]

    @property
    def n_graphs(self) -> int:
        return 1 if self.NodeGraph is None else self.NodeGraph.shape[1]

    # src/dst/edge_weights/graph_ids/pool_weights are cached per instance:
    # batch builders call them repeatedly and the copies dominated host
    # packing time. Returned arrays are shared — treat them as read-only.
    @property
    def src(self) -> np.ndarray:
        c = self.__dict__.get("_src_cache")
        if c is None or c.shape[0] != self.arcs.shape[0]:
            c = np.ascontiguousarray(self.arcs[:, 0], dtype=np.int32)
            self.__dict__["_src_cache"] = c
        return c

    @property
    def dst(self) -> np.ndarray:
        c = self.__dict__.get("_dst_cache")
        if c is None or c.shape[0] != self.arcs.shape[0]:
            c = np.ascontiguousarray(self.arcs[:, 1], dtype=np.int32)
            self.__dict__["_dst_cache"] = c
        return c

    @property
    def arc_labels(self) -> np.ndarray:
        return self.arcs[:, 2:]

    # ------------------------------------------------------------- aggregation
    def edge_weights(self) -> np.ndarray:
        """Per-edge aggregation weights w_e (reference ArcNode values,
        graph_class.py:108-118). Aggregation of any per-edge quantity q_e into
        node n is sum_{e: dst_e == n} w_e * q_e. Uses the native C++ runtime
        when available (gnn_tpu/native). Cached per (instance,
        aggregation_mode) — treat the result as read-only."""
        E = self.n_arcs
        cached = self.__dict__.get("_ew_cache")
        if (cached is not None and cached[0] == self.aggregation_mode
                and cached[1].shape[0] == E
                and cached[1].dtype == floatx()):
            return cached[1]
        w = self._edge_weights_impl(E)
        self.__dict__["_ew_cache"] = (self.aggregation_mode, w)
        return w

    def _edge_weights_impl(self, E: int) -> np.ndarray:
        try:
            from gnn_tpu import native
            w = native.edge_weights(self.dst, self.n_nodes, self.aggregation_mode)
            if w is not None:
                return w.astype(floatx())
        except Exception:
            pass
        w = np.ones(E, dtype=floatx())
        if self.aggregation_mode == "normalized":
            w *= np.float64(1.0 / E) if E else 0.0
        elif self.aggregation_mode == "average":
            # 1 / in-degree of destination node (duplicate arcs all count)
            _, inv, counts = np.unique(self.dst, return_inverse=True, return_counts=True)
            w = w / counts[inv]
        return w.astype(floatx())

    def set_aggregation(self, aggregation_mode: str) -> None:
        """Reference setAggregation (graph_class.py:124-129)."""
        if aggregation_mode not in AGGREGATIONS:
            raise ValueError("ERROR: Unknown aggregation mode")
        self.aggregation_mode = aggregation_mode

    setAggregation = set_aggregation  # reference-compatible alias

    # -------------------------------------------------- sparse-matrix getters
    # The vector design stores edges as index arrays; migrating user code may
    # still want the reference's scipy matrices (graph_class.py:178-184) —
    # built on demand, never used by the compute path.
    def getAdjacency(self):
        """Aggregated N×N adjacency: ADJ[src, dst] = w_e (graph_class.py:90-95,
        178-180). Duplicate arcs accumulate, matching coo semantics."""
        from scipy.sparse import coo_matrix
        n = self.n_nodes
        return coo_matrix((self.edge_weights(), (self.src, self.dst)),
                          shape=(n, n), dtype=floatx())

    def getArcNode(self):
        """E×N incidence: A[e, dst_e] = w_e (graph_class.py:98-121, 182-184)."""
        from scipy.sparse import coo_matrix
        e = self.n_arcs
        return coo_matrix((self.edge_weights(), (np.arange(e), self.dst)),
                          shape=(e, self.n_nodes), dtype=floatx())

    def graph_ids(self) -> np.ndarray:
        """Per-node graph membership (int32, shape (N,)). Derived from the
        block structure of NodeGraph; all-zeros when not graph-focused.
        Cached (NodeGraph is fixed after construction) — read-only result."""
        c = self.__dict__.get("_gid_cache")
        if c is not None and c.shape[0] == self.n_nodes:
            return c
        if self.NodeGraph is None:
            c = np.zeros(self.n_nodes, dtype=np.int32)
        else:
            c = np.argmax(self.NodeGraph != 0, axis=1).astype(np.int32)
        self.__dict__["_gid_cache"] = c
        return c

    def pool_weights(self) -> np.ndarray:
        """Per-node pooling weight (NodeGraph nonzero value per row: 1/n_g).
        Cached — read-only result."""
        c = self.__dict__.get("_pw_cache")
        if (c is not None and c.shape[0] == self.n_nodes
                and c.dtype == floatx()):
            return c
        if self.NodeGraph is None:
            c = np.zeros(self.n_nodes, dtype=floatx())
        else:
            gid = self.graph_ids()
            c = self.NodeGraph[np.arange(self.n_nodes), gid].astype(floatx())
        self.__dict__["_pw_cache"] = c
        return c

    # ------------------------------------------------------------------- copy
    def copy(self) -> "Graph":
        """Deep copy (reference graph_class.py:80-87)."""
        return Graph(arcs=self.arcs.copy(), nodes=self.nodes.copy(),
                     targets=self.targets.copy(), focus=self.focus,
                     set_mask=self.set_mask.copy(), output_mask=self.output_mask.copy(),
                     sample_weights=self.sample_weights.copy(),
                     node_graph=None if self.NodeGraph is None else self.NodeGraph.copy(),
                     aggregation_mode=self.aggregation_mode,
                     node_types=None if self.node_types is None else self.node_types.copy())

    @classmethod
    def fromGraphTensor(cls, gb, aggregation_mode: Optional[str] = None) -> "Graph":
        """Reference-named alias (GraphObject.fromGraphTensor,
        graph_class.py:321-327): reconstruct a host Graph from a device
        GraphBatch. See GraphBatch.to_graph for semantics."""
        return gb.to_graph(aggregation_mode=aggregation_mode)

    # ------------------------------------------------------------------ merge
    @classmethod
    def merge(cls, glist: Sequence["Graph"], focus: Optional[str] = None,
              aggregation_mode: Optional[str] = None,
              problem_based: Optional[str] = None) -> "Graph":
        """Disjoint-union batching (reference graph_class.py:285-319): node ids
        offset per graph, masks/targets/weights concatenated, NodeGraph
        block-diagonal. The merged graph is ONE big graph — the batch."""
        if focus is None:
            focus = problem_based if problem_based is not None else glist[0].focus
        if aggregation_mode is None:
            aggregation_mode = glist[0].aggregation_mode
        if not glist:
            raise ValueError("merge requires a non-empty list of graphs")

        arcs_list, offset = [], 0
        for g in glist:
            a = g.arcs.copy()
            a[:, :2] += offset
            offset += g.n_nodes
            arcs_list.append(a)
        arcs = np.concatenate(arcs_list, axis=0)
        nodes = np.concatenate([g.nodes for g in glist], axis=0)
        targets = np.concatenate([g.targets for g in glist], axis=0)
        set_mask = np.concatenate([g.set_mask for g in glist], axis=0)
        output_mask = np.concatenate([g.output_mask for g in glist], axis=0)
        sample_weights = np.concatenate([g.sample_weights for g in glist], axis=0)

        node_graph = None
        if focus == "g":
            blocks = [g.NodeGraph if g.NodeGraph is not None
                      else np.full((g.n_nodes, 1), 1.0 / max(g.n_nodes, 1), dtype=floatx())
                      for g in glist]
            rows = sum(b.shape[0] for b in blocks)
            cols = sum(b.shape[1] for b in blocks)
            node_graph = np.zeros((rows, cols), dtype=floatx())
            r = c = 0
            for b in blocks:
                node_graph[r:r + b.shape[0], c:c + b.shape[1]] = b
                r += b.shape[0]
                c += b.shape[1]

        node_types = None
        if any(g.node_types is not None for g in glist):
            node_types = np.concatenate(
                [g.node_types if g.node_types is not None
                 else np.zeros(g.n_nodes, np.int32) for g in glist], axis=0)

        return cls(arcs=arcs, nodes=nodes, targets=targets, focus=focus,
                   set_mask=set_mask, output_mask=output_mask,
                   sample_weights=sample_weights, node_graph=node_graph,
                   aggregation_mode=aggregation_mode, node_types=node_types)

    # ------------------------------------------------------------------- I/O
    _FILES = ("arcs", "nodes", "targets", "set_mask", "output_mask",
              "sample_weights", "NodeGraph")

    def save(self, folder: str) -> None:
        """Save as .npy folder, byte-compatible with reference
        graph_class.py:191-212 (optional files only written when non-default)."""
        folder = folder if folder.endswith("/") else folder + "/"
        if os.path.exists(folder):
            shutil.rmtree(folder)
        os.makedirs(folder)
        np.save(folder + "arcs.npy", self.arcs)
        np.save(folder + "nodes.npy", self.nodes)
        np.save(folder + "targets.npy", self.targets)
        if not all(self.set_mask):
            np.save(folder + "set_mask.npy", self.set_mask)
        if not all(self.output_mask):
            np.save(folder + "output_mask.npy", self.output_mask)
        if np.any(self.sample_weights != 1):
            np.save(folder + "sample_weights.npy", self.sample_weights)
        if self.NodeGraph is not None and self.targets.shape[0] > 1:
            np.save(folder + "NodeGraph.npy", self.NodeGraph)
        if self.node_types is not None:
            np.save(folder + "node_types.npy", self.node_types)

    def savetxt(self, folder: str, fmt: str = "%.10g") -> None:
        """Save as .txt folder (reference graph_class.py:216-237)."""
        folder = folder if folder.endswith("/") else folder + "/"
        if os.path.exists(folder):
            shutil.rmtree(folder)
        os.makedirs(folder)
        np.savetxt(folder + "arcs.txt", self.arcs, fmt=fmt)
        np.savetxt(folder + "nodes.txt", self.nodes, fmt=fmt)
        np.savetxt(folder + "targets.txt", self.targets, fmt=fmt)
        if not all(self.set_mask):
            np.savetxt(folder + "set_mask.txt", self.set_mask, fmt=fmt)
        if not all(self.output_mask):
            np.savetxt(folder + "output_mask.txt", self.output_mask, fmt=fmt)
        if np.any(self.sample_weights != 1):
            np.savetxt(folder + "sample_weights.txt", self.sample_weights, fmt=fmt)
        if self.NodeGraph is not None and self.targets.shape[0] > 1:
            np.savetxt(folder + "NodeGraph.txt", self.NodeGraph, fmt=fmt)
        if self.node_types is not None:
            np.savetxt(folder + "node_types.txt", self.node_types, fmt="%d")

    @classmethod
    def load(cls, folder: str, focus: Optional[str] = None, aggregation_mode: str = "average",
             problem_based: Optional[str] = None) -> "Graph":
        """Load a .npy graph folder (reference graph_class.py:241-259)."""
        if focus is None:
            focus = problem_based if problem_based is not None else "n"
        folder = folder if folder.endswith("/") else folder + "/"
        params = {f.rsplit(".", 1)[0]: np.load(folder + f) for f in os.listdir(folder)
                  if f.endswith(".npy")}
        return cls(focus=focus, aggregation_mode=aggregation_mode, **params)

    @classmethod
    def load_txt(cls, folder: str, focus: Optional[str] = None, aggregation_mode: str = "average",
                 problem_based: Optional[str] = None) -> "Graph":
        """Load a .txt graph folder (reference graph_class.py:263-281)."""
        if focus is None:
            focus = problem_based if problem_based is not None else "n"
        folder = folder if folder.endswith("/") else folder + "/"
        params = {f.rsplit(".", 1)[0]: np.loadtxt(folder + f, ndmin=2) for f in os.listdir(folder)
                  if f.endswith(".txt")}
        for key in ("set_mask", "output_mask", "sample_weights", "node_types"):
            if key in params:
                params[key] = params[key].reshape(-1)
        return cls(focus=focus, aggregation_mode=aggregation_mode, **params)

    # ------------------------------------------------------------- reference getters
    def getArcs(self):
        return self.arcs.copy()

    def getNodes(self):
        return self.nodes.copy()

    def getTargets(self):
        return self.targets.copy()

    def getSetMask(self):
        return self.set_mask.copy()

    def getOutputMask(self):
        return self.output_mask.copy()

    def getSampleWeights(self):
        return self.sample_weights.copy()

    def getNodeGraph(self):
        return None if self.NodeGraph is None else self.NodeGraph.copy()

    def __repr__(self) -> str:
        return (f"Graph(N={self.n_nodes}, E={self.n_arcs}, G={self.n_graphs}, "
                f"focus={self.focus!r}, agg={self.aggregation_mode!r}, "
                f"NL={self.DIM_NODE_LABEL}, AL={self.DIM_ARC_LABEL}, DT={self.DIM_TARGET})")


# Reference-compatible alias: the reference class is GraphObject (graph_class.py:14)
GraphObject = Graph
