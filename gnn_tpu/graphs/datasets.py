"""Dataset generators and loaders.

* random_graph — synthetic undirected graphs with mirrored arc labels and
  clustering-derived pseudo-targets (reference GNN_utils.randomGraph,
  GNN_utils.py:16-84).
* simple_graph — the 4-node/8-arc deterministic debug fixture
  (GNN_utils.py:88-105).
* load_mutag — TU-format Mutagenicity parser (reference load_MUTAG.py:1-52):
  edge list, integer edge/node labels one-hot encoded, per-graph node id
  renumbering, graph labels one-hot — 4337 graph-focused Graphs.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from gnn_tpu.graphs.graph import Graph


def random_graph(nodes_number: int, dim_node_label: int, dim_arc_label: int,
                 dim_target: int, density: float, *, normalize_features: bool = False,
                 aggregation_mode: str = "average", focus: str = "n",
                 problem_based: Optional[str] = None, rng=None) -> Graph:
    """Random undirected graph: each sampled arc (i, j) is mirrored as (j, i)
    with the same label; targets come from agglomerative clustering of labels
    ('n'/'a' focus) or a random one-hot ('g')."""
    if problem_based is not None:
        focus = problem_based
    rng = np.random.default_rng(rng)

    nodes = 2 * rng.random((nodes_number, dim_node_label)) - 1

    arcs_number = round(density * nodes_number * (nodes_number - 1) / 2)
    sources = rng.choice(np.arange(nodes_number - 1), max(arcs_number // 2, 1))
    max_diff = nodes_number - sources - 1
    destination = sources + np.ceil(max_diff * rng.random(len(sources)))

    arcs_ascend = np.unique(np.stack([sources, destination], axis=1), axis=0)
    arcs_descend = np.flip(arcs_ascend, axis=1)
    arcs_ids = np.concatenate((arcs_ascend, arcs_descend))
    arcs_label = 2 * rng.random((arcs_ascend.shape[0], dim_arc_label)) - 1
    arcs_label = np.concatenate((arcs_label, arcs_label))
    arcs = np.unique(np.concatenate((arcs_ids, arcs_label), axis=1), axis=0)

    tn = {"n": nodes.shape[0], "a": arcs.shape[0], "g": 1}
    assert focus in tn
    target_number = tn[focus]
    targs = np.zeros((target_number, dim_target))

    if focus in ("a", "n"):
        from sklearn.cluster import AgglomerativeClustering
        feats = arcs[:, 2:] if focus == "a" else nodes
        labels = AgglomerativeClustering(n_clusters=dim_target).fit(feats).labels_
        targs[np.arange(target_number), labels] = 1
    else:
        targs[0, rng.integers(0, dim_target)] = 1

    output_mask = np.ones(arcs.shape[0] if focus == "a" else nodes.shape[0], dtype=bool)

    if normalize_features:
        nodes = nodes / np.max(nodes, axis=0)
        arcs[:, 2:] = arcs[:, 2:] / np.max(arcs[:, 2:], axis=0)

    return Graph(arcs=arcs, nodes=nodes, targets=targs, focus=focus,
                 output_mask=output_mask, aggregation_mode=aggregation_mode)


def simple_graph(focus: str = "n", aggregation_mode: str = "average") -> Graph:
    """Deterministic 4-node debug fixture (GNN_utils.py:88-105)."""
    nodes = np.array([[11, 21], [12, 22], [13, 23], [14, 24]], dtype=float)
    arcs = np.array([[0, 1, 10], [0, 2, 40], [1, 0, 10], [1, 2, 20],
                     [2, 0, 40], [2, 1, 20], [2, 3, 30], [3, 2, 30]], dtype=float)
    tn = {"n": nodes.shape[0], "a": arcs.shape[0], "g": 1}[focus]
    targs = np.zeros((tn, 2))
    if focus in ("a", "n"):
        from sklearn.cluster import AgglomerativeClustering
        feats = arcs[:, 2:] if focus == "a" else nodes
        labels = AgglomerativeClustering(n_clusters=2).fit(feats).labels_
        targs[np.arange(tn), labels] = 1
    else:
        targs[0, 1] = 1
    return Graph(arcs=arcs, nodes=nodes, targets=targs, focus=focus,
                 aggregation_mode=aggregation_mode)


def load_mutag(path: str = "MUTAG_raw/", aggregation_mode: str = "average") -> List[Graph]:
    """Parse TU-format Mutagenicity files into graph-focused Graphs
    (reference load_MUTAG.py:1-52 — vectorised instead of the per-graph python
    relabelling loop)."""
    j = os.path.join
    edges_ids = np.loadtxt(j(path, "Mutagenicity_edges.txt"), dtype=int, delimiter=",")
    edges_l = np.loadtxt(j(path, "Mutagenicity_edge_labels.txt"), dtype=int)
    nodes_l = np.loadtxt(j(path, "Mutagenicity_node_labels.txt"), dtype=int)
    gids_nodes = np.loadtxt(j(path, "Mutagenicity_graph_indicator.txt"), dtype=int)
    gtargs = np.loadtxt(j(path, "Mutagenicity_graph_labels.txt"), dtype=int)

    # node one-hot labels + per-graph node ranges (node ids are 1-based,
    # contiguous per graph)
    n_types = len(np.unique(nodes_l))
    node_onehot = np.zeros((nodes_l.shape[0], n_types), dtype=np.float32)
    node_onehot[np.arange(len(nodes_l)), nodes_l] = 1
    _, starts = np.unique(gids_nodes, return_index=True)
    bounds = np.concatenate([starts, [len(gids_nodes)]])

    # edge one-hot labels; dedupe edges like the reference (np.unique on ids
    # keeps the first occurrence ordering sorted)
    order = np.lexsort((edges_ids[:, 1], edges_ids[:, 0]))
    uniq_mask = np.ones(len(order), dtype=bool)
    se = edges_ids[order]
    uniq_mask[1:] = np.any(se[1:] != se[:-1], axis=1)
    keep = order[uniq_mask]
    e_ids = edges_ids[keep]
    e_lab = edges_l[keep]
    e_types = len(np.unique(edges_l))
    e_onehot = np.zeros((len(e_lab), e_types), dtype=np.float32)
    e_onehot[np.arange(len(e_lab)), e_lab] = 1

    # graph membership of each edge via its (1-based) node ids
    e_graph = gids_nodes[e_ids[:, 0] - 1]

    # graph one-hot targets
    t_types = len(np.unique(gtargs))
    targ_onehot = np.zeros((len(gtargs), t_types), dtype=np.float32)
    targ_onehot[np.arange(len(gtargs)), gtargs] = 1

    graphs = []
    graph_ids = np.unique(gids_nodes)
    e_sorted = np.argsort(e_graph, kind="stable")
    e_ptr = np.searchsorted(e_graph[e_sorted], graph_ids, side="left")
    e_ptr = np.concatenate([e_ptr, [len(e_graph)]])
    for gi, gid in enumerate(graph_ids):
        lo, hi = bounds[gi], bounds[gi + 1]
        rows = e_sorted[e_ptr[gi]: e_ptr[gi + 1]]
        ids = e_ids[rows] - 1 - lo  # renumber node ids per graph, 0-based
        arcs = np.concatenate([ids.astype(np.float32), e_onehot[rows]], axis=1)
        graphs.append(Graph(arcs=arcs, nodes=node_onehot[lo:hi],
                            targets=targ_onehot[gi][None, :], focus="g",
                            aggregation_mode=aggregation_mode))
    return graphs
