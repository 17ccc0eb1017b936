"""Dataset utilities: splitting, batching, normalisation, LKO fold prep.

Ports the semantics of reference GNN/GNN_utils.py:109-353 onto the new Graph
container. The known reference bug in prepare_LKO_data's single-graph path —
it assigns the *test* mask to the validation and training graphs too
(GNN_utils.py:299,306) — is fixed here: each fold graph gets its own mask
(intended semantics per SURVEY.md §3).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from gnn_tpu.graphs.graph import Graph


def progressbar(percent: float, width: int = 30) -> None:
    """In-place textual progress indicator (role of GNN_utils.py:109-113)."""
    filled = round(width * percent / 100)
    bar = ("#" * filled).ljust(width)
    print(f"\r[{bar}] {percent:.1f}%", end="", flush=True)


def getindices(len_dataset: int, perc_Train: float = 0.7, perc_Valid: float = 0.1,
               seed=None) -> Tuple[list, list, list]:
    """Shuffled Train/Test/Validation index split (role of GNN_utils.py:117-149).

    :param seed: number = deterministic shuffle; None = fresh random shuffle;
        False = keep dataset order. Splits are disjoint and cover the dataset;
        test and validation sizes are rounded, train takes the remainder.
    """
    if perc_Train < 0 or perc_Valid < 0 or perc_Train + perc_Valid > 1:
        raise ValueError("Error - percentage must stay in [0-1] and their sum must be <= 1")
    order = np.arange(len_dataset)
    if seed is not False:
        # seed=0 is a valid deterministic seed — only None means fresh entropy
        np.random.default_rng(None if seed is None else seed).shuffle(order)
    n_test = round(len_dataset * (1 - perc_Train - perc_Valid))
    n_valid = round(len_dataset * perc_Valid)
    test_idx, valid_idx, train_idx = np.split(order, [n_test, n_test + n_valid])
    return train_idx.tolist(), test_idx.tolist(), valid_idx.tolist()


def getSet(glist: Sequence[str], set_indices: Sequence[int], focus: str,
           aggregation_mode: str, verbose: bool = False) -> List[Graph]:
    """Load a subset of saved graph folders by index (GNN_utils.py:153-173)."""
    length = len(set_indices)
    setlist = []
    for i, elem in enumerate(set_indices):
        setlist.append(glist[elem])
        if verbose:
            progressbar((i + 1) * 100 / length)
    return [Graph.load(p, focus=focus, aggregation_mode=aggregation_mode) for p in setlist]


def getbatches(glist: List[Graph], focus: Optional[str] = None,
               aggregation_mode: Optional[str] = None, batch_size: int = 32,
               number_of_batches: Optional[int] = None, one_graph_per_batch: bool = True,
               problem_based: Optional[str] = None, block_w: Optional[int] = None):
    """Chunk a graph list into batches; each batch is merged into ONE big
    disjoint-union graph when one_graph_per_batch (GNN_utils.py:177-194).

    block_w: when set (node/graph focus), batches are built as block-dense
    GraphBatches (graphs/batch.py::from_graphs_blocked) — the fast TPU path."""
    if focus is None:
        focus = problem_based if problem_based is not None else glist[0].focus
    if aggregation_mode is None:
        aggregation_mode = glist[0].aggregation_mode
    if number_of_batches is None:
        batches = [glist[i:i + batch_size] for i in range(0, len(glist), batch_size)]
    else:
        splits = np.array_split(np.arange(len(glist)), number_of_batches)
        batches = [[glist[j] for j in s] for s in splits]
    if block_w is not None:
        from gnn_tpu.graphs.batch import from_graphs_blocked
        for b in batches:
            for g in b:
                g.aggregation_mode = aggregation_mode
        return [from_graphs_blocked(b, block_w=block_w, focus=focus,
                                    aggregation_mode=aggregation_mode)
                for b in batches]
    if one_graph_per_batch:
        batches = [Graph.merge(b, focus=focus, aggregation_mode=aggregation_mode)
                   for b in batches]
    return batches


def normalize_graphs(gTr, gVa, gTe, based_on: str = "gTr",
                     norm_rangeN: Optional[Tuple[float, float]] = None,
                     norm_rangeA: Optional[Tuple[float, float]] = None) -> None:
    """In-place MinMax normalisation of node/arc features, fit on gTr (or the
    whole dataset) — GNN_utils.py:198-234. Note the reference fits the arc
    scaler on the full arcs matrix including the two id columns; semantics
    kept (ids are rescaled identically at train/eval so models are unaffected
    — and the device batch reads src/dst from pre-normalisation int ids only
    if normalisation happens after construction; normalise BEFORE batching)."""

    def check(g, name):
        if g is None:
            return []
        if isinstance(g, Graph):
            return [g]
        if isinstance(g, list) and all(isinstance(x, Graph) for x in g):
            return g
        raise TypeError(f"type of param <{name}> must be Graph or list of Graphs")

    gTr, gVa, gTe = check(gTr, "gTr"), check(gVa, "gVa"), check(gTe, "gTe")
    if based_on not in ("gTr", "all"):
        raise ValueError("param <based_on> must be 'gTr' or 'all'")

    G = Graph.merge(gTr, focus="n", aggregation_mode="sum")
    if based_on == "all":
        G = Graph.merge([G] + gTe + gVa, focus="n", aggregation_mode="sum")

    from sklearn.preprocessing import MinMaxScaler
    node_scaler = MinMaxScaler(feature_range=norm_rangeN or (0, 1))
    arc_scaler = MinMaxScaler(feature_range=norm_rangeA or (0, 1))
    node_scaler.fit(G.nodes)
    # fit on label columns only — rescaling the id columns (reference
    # GNN_utils.py:230) would corrupt src/dst indices in the new design
    if G.arcs.shape[1] > 2:
        arc_scaler.fit(G.arcs[:, 2:])
    for g in gTr + gVa + gTe:
        g.nodes = node_scaler.transform(g.nodes).astype(g.nodes.dtype)
        if g.arcs.shape[1] > 2:
            g.arcs[:, 2:] = arc_scaler.transform(g.arcs[:, 2:]).astype(g.arcs.dtype)


def prepare_LKO_data(dataset, focus: Optional[str] = None, number_of_batches: int = 10,
                     useVa: bool = False, seed: Optional[float] = None,
                     normalize_method: str = "gTr", aggregation_mode: str = "average",
                     problem_based: Optional[str] = None):
    """Build Leave-K-Out folds (GNN_utils.py:238-353).

    Returns (gTRs, gTEs, gVAs):
      gTRs[i] — list of training Graphs (or a single masked Graph for the
      single-graph case), gTEs[i] — test Graph, gVAs[i] — validation Graph or
      None. Pass the tuple to model.LKO().
    """
    if focus is None:
        focus = problem_based if problem_based is not None else "n"
    assert number_of_batches > 1 + useVa
    if seed:
        np.random.seed(seed)

    flatten = lambda l: [item for sub in l for item in sub]
    gTRs, gTEs, gVAs = [], [], []

    if isinstance(dataset, Graph):
        # SINGLE GRAPH: folds differ only in set_mask
        zero_mask = np.zeros(len(dataset.set_mask), dtype=bool)
        if normalize_method:
            normalize_graphs(dataset, None, None, based_on=normalize_method)
        idx = np.arange(len(zero_mask))
        np.random.shuffle(idx)
        masks = np.array_split(idx, number_of_batches)

        for i in range(len(masks)):
            M = list(masks)
            mTe = M.pop(i)
            maskTe = zero_mask.copy()
            maskTe[mTe] = True
            gTe = dataset.copy()
            gTe.set_mask = maskTe

            gVa = None
            if useVa:
                mVa = M.pop(-1)
                maskVa = zero_mask.copy()
                maskVa[mVa] = True      # reference bug fixed: uses maskVa
                gVa = dataset.copy()
                gVa.set_mask = maskVa

            maskTr = zero_mask.copy()
            maskTr[np.concatenate(M)] = True  # reference bug fixed: uses maskTr
            gTr = dataset.copy()
            gTr.set_mask = maskTr

            gTRs.append(gTr)
            gTEs.append(gTe)
            gVAs.append(gVa)

    elif isinstance(dataset, list):
        # MULTI GRAPH: list of Graphs (may be class-stratified list of lists)
        if all(isinstance(i, Graph) for i in dataset):
            dataset = [dataset]
        assert all(len(i) > number_of_batches for i in dataset)
        assert all(isinstance(i, list) for i in dataset)
        assert all(isinstance(j, Graph) for i in dataset for j in i)

        for i in dataset:
            np.random.shuffle(i)
        dataset_batches = [getbatches(elem, focus, aggregation_mode, -1,
                                      number_of_batches, False) for elem in dataset]
        flattened = [flatten([db[j] for db in dataset_batches])
                     for j in range(number_of_batches)]
        for i in flattened:
            np.random.shuffle(i)
        merged = [Graph.merge(i, focus=focus, aggregation_mode=aggregation_mode)
                  for i in flattened]

        for i in range(len(merged)):
            gTr = list(merged)
            gTe = gTr.pop(i)
            gVa = gTr.pop(-1) if useVa else None
            if normalize_method:
                normalize_graphs(gTr, gTe, gVa, based_on=normalize_method)
            gTRs.append(gTr)
            gTEs.append(gTe)
            gVAs.append(gVa)
    else:
        raise TypeError("param <dataset> must be a Graph, list of Graphs or list of lists of Graphs")

    return gTRs, gTEs, gVAs
