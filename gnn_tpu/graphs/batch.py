"""Device-side graph batch: a frozen, padded, static-shape pytree.

Equivalent in role to the reference `GraphTensor` (graph_class.py:330-372), but
TPU-native instead of sparse-TF:

* The reference stores pre-transposed `tf.SparseTensor`s and does
  `sparse_dense_matmul` in the hot loop (GNN.py:234,259,263). Here the three
  sparse matmuls become edge/node-weighted segment sums driven by flat index
  vectors (`src`, `dst`, `graph_ids`) — the shapes XLA/Pallas tile well.

* All arrays are padded to bucketed sizes (config.pad_size) so `jit` compiles a
  handful of shapes for an entire ragged dataset. Padding is neutralised by
  masks: padded edges carry weight 0, padded nodes are excluded from
  convergence checks and batch-norm statistics, padded targets have
  `sel_mask == False`.

* Dynamic-size `boolean_mask` readouts (GNN.py:245-248, GNN_BaseClass.py:406-409)
  are replaced by the static gather `out_index` + `sel_mask`: the output net
  runs on every (padded) entity, rows are gathered at `out_index` to align with
  target rows, and `sel_mask` zeroes non-selected rows in the loss. This keeps
  every shape static under jit while matching the reference's filtered-loss
  semantics exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gnn_tpu.config import floatx, pad_size
from gnn_tpu.graphs.graph import Graph


@struct.dataclass
class GraphBatch:
    # --- node level (padded to Np) ---
    nodes: jnp.ndarray        # [Np, NL] float
    node_mask: jnp.ndarray    # [Np] bool — True for real nodes
    graph_ids: jnp.ndarray    # [Np] int32 — graph membership (0 when not 'g')
    pool_w: jnp.ndarray       # [Np] float — graph pooling weight 1/n_g (0 on pad)

    # --- edge level (padded to Ep) ---
    src: jnp.ndarray          # [Ep] int32 (0 on pad)
    dst: jnp.ndarray          # [Ep] int32 (0 on pad)
    arc_labels: jnp.ndarray   # [Ep, AL] float
    edge_w: jnp.ndarray       # [Ep] float — aggregation weight w_e (0 on pad)
    edge_mask: jnp.ndarray    # [Ep] bool

    # --- supervision (entity level: nodes for 'n'/'g', arcs for 'a') ---
    set_mask: jnp.ndarray     # [Np] or [Ep] bool
    output_mask: jnp.ndarray  # [Np] or [Ep] bool

    # --- targets (padded to Tp; for 'g' the graph axis is also Tp) ---
    targets: jnp.ndarray         # [Tp, DT] float
    sample_weights: jnp.ndarray  # [Tp] float
    out_index: jnp.ndarray       # [Tp] int32 — entity (or graph) row per target
    sel_mask: jnp.ndarray        # [Tp] bool — target in active set & not padding

    # --- bookkeeping (device scalars, not used in compute) ---
    n_real: jnp.ndarray          # [3] int32 = (n_nodes, n_arcs, n_targets)

    # --- optional Pallas block-sparse aggregation plan (ops/pallas_segment) ---
    agg_plan: Optional[object] = None  # AggPlanPair or None

    # --- contiguous-pooling ranges (graph focus) -------------------------
    # Merged graphs occupy contiguous node ranges, so the NodeGraph pooling
    # matmul (GNN.py:332) can run as a cumulative-sum difference instead of a
    # scatter: pool[g] = cumsum[end_g] - cumsum[start_g].
    pool_starts: Optional[jnp.ndarray] = None   # [Tp] int32
    pool_ends: Optional[jnp.ndarray] = None     # [Tp] int32

    # --- precomputed constant aggregations -------------------------------
    # ArcNode^T @ arc_labels and A^T @ nodes are loop- and step-invariant
    # (GNN.py:259,263 recompute them every call); caching them at build time
    # removes all per-edge scatters from the node/graph-focus forward.
    agg_arcs_cache: Optional[jnp.ndarray] = None    # [Np, AL]
    agg_nodes_cache: Optional[jnp.ndarray] = None   # [Np, NL]

    # --- heterogeneous graphs: per-node type id (models/composite.py) ---
    node_types: Optional[jnp.ndarray] = None   # [Np] int32 (0 on pad)

    # --- optional block-dense adjacency (graph-aligned node packing) ---
    # When batches are built with from_graphs_blocked, the adjacency is block
    # diagonal: adj_blocks[b, i, j] = w of edge (block b node j -> node i), and
    # the state aggregation becomes ONE batched MXU matmul. Edges crossing
    # blocks (graphs larger than the block) live in the residual arrays.
    adj_blocks: Optional[jnp.ndarray] = None   # [B, W, W]
    res_src: Optional[jnp.ndarray] = None      # [Er] int32
    res_dst: Optional[jnp.ndarray] = None      # [Er] int32
    res_w: Optional[jnp.ndarray] = None        # [Er] float

    # --- fused-kernel layout (ops/pallas_fused.py) -----------------------
    # Built by from_graphs_blocked(fused_layout=True). Blocks are partitioned
    # into residual-free "loop" blocks (the whole K-iteration propagation runs
    # inside one Pallas kernel with the adjacency streamed from HBM ONCE) and
    # residual-coupled "dep" blocks (graphs larger than the block width; these
    # iterate one step at a time because cross-block edges exchange state).
    # Adjacencies are stored pre-transposed (adjT[b, src, dst]) and, for f32,
    # pre-packed as bf16 [hi | lo] columns (same bytes as f32) so no per-call
    # packing pass is paid on the forward.
    # Loop blocks are zero-padded to a multiple of the kernel grid group;
    # padded rows carry node-mask 0 so they never affect convergence, and
    # block_perm never points at them.
    # full packed transposed adjacency (ALL blocks, global order) for the
    # per-step kernels — saves the per-train-step packing pass
    adj_packT: Optional[jnp.ndarray] = None    # [B, W, 2W] (or [B, W, W] bf16)
    adj_loop: Optional[jnp.ndarray] = None     # [Bi, W, 2W] (or [Bi, W, W] bf16)
    loop_ids: Optional[jnp.ndarray] = None     # [Bi] int32 global block ids
    loop_nm: Optional[jnp.ndarray] = None      # [Bi, W] f32 node mask (0 on pad)
    adj_dep: Optional[jnp.ndarray] = None      # [Bd, W, 2W] packed, or None
    dep_ids: Optional[jnp.ndarray] = None      # [Bd] int32
    # residual edges remapped to dep-local flat node ids (pos_in_dep*W + off)
    res_src_loc: Optional[jnp.ndarray] = None  # [Er] int32
    res_dst_loc: Optional[jnp.ndarray] = None  # [Er] int32
    # reconstruction: global block b lives at row block_perm[b] of
    # concat([loop blocks (padded), dep blocks])
    block_perm: Optional[jnp.ndarray] = None   # [B] int32

    # --- static ---
    focus: str = struct.field(pytree_node=False, default="n")
    # edges stored sorted by dst (enables sorted segment reductions and the
    # Pallas tiled kernel; semantically transparent — aggregation is
    # order-invariant and arc-order-dependent structures are permuted
    # consistently at build time)
    edges_sorted: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------ sizes
    @property
    def n_node_pad(self) -> int:
        return self.nodes.shape[0]

    @property
    def n_edge_pad(self) -> int:
        return self.src.shape[0]

    @property
    def n_target_pad(self) -> int:
        return self.targets.shape[0]

    @property
    def dim_node_label(self) -> int:
        return self.nodes.shape[1]

    @property
    def dim_arc_label(self) -> int:
        return self.arc_labels.shape[1]

    @property
    def dim_target(self) -> int:
        return self.targets.shape[1]

    # ----------------------------------------------------------------- build
    @classmethod
    def from_graph(cls, g: Graph, *, node_pad: Optional[int] = None,
                   edge_pad: Optional[int] = None, target_pad: Optional[int] = None,
                   dtype=None, sort_edges: bool = True,
                   build_plan: bool = False) -> "GraphBatch":
        """Pad + upload a host Graph. Pads are bucketed unless given explicitly.

        sort_edges=True stores edges sorted by destination node (stable), with
        every arc-order-dependent structure (labels, edge-level masks,
        out_index) permuted consistently — results are identical, and sorted
        destinations unlock faster TPU segment reductions.

        build_plan=True additionally precomputes the block-sparse Pallas
        aggregation plan (ops/pallas_segment.build_agg_plan) used by the
        'pallas' aggregation strategy."""
        dt = dtype or floatx()
        N, E, T = g.n_nodes, g.n_arcs, g.targets.shape[0]
        Np = node_pad or pad_size(N)
        Ep = edge_pad or pad_size(E)
        Tp = target_pad or pad_size(T)
        if Np < N or Ep < E or Tp < T:
            raise ValueError(f"pad sizes ({Np},{Ep},{Tp}) below real sizes ({N},{E},{T})")

        def padf(x, size, fill=0.0):
            x = np.asarray(x)
            out = np.full((size,) + x.shape[1:], fill, dtype=x.dtype)
            out[: x.shape[0]] = x
            return out

        nodes = padf(g.nodes.astype(dt), Np)
        node_mask = padf(np.ones(N, dtype=bool), Np, False)
        graph_ids = padf(g.graph_ids(), Np)
        pool_w = padf(g.pool_weights().astype(dt), Np)

        # optional stable sort of edges by destination; perm maps
        # new position -> original arc index, inv maps original -> new
        if sort_edges:
            perm = np.argsort(g.dst, kind="stable")
        else:
            perm = np.arange(E)
        inv = np.empty(E, dtype=np.int64)
        inv[perm] = np.arange(E)

        src = padf(g.src[perm], Ep)
        # padded edges keep dst = Np-1 fill? no: weight-0 edges at dst 0 are
        # harmless but would break sortedness; point them at the LAST node so
        # the dst sequence stays non-decreasing
        dst = padf(g.dst[perm], Ep, fill=(N - 1) if sort_edges else 0)
        arc_labels = padf(g.arc_labels[perm].astype(dt), Ep)
        edge_w = padf(g.edge_weights()[perm].astype(dt), Ep)
        edge_mask = padf(np.ones(E, dtype=bool), Ep, False)

        if g.focus == "a":
            set_mask = padf(g.set_mask[perm], Ep, False)
            output_mask = padf(g.output_mask[perm], Ep, False)
        else:
            set_mask = padf(g.set_mask, Np, False)
            output_mask = padf(g.output_mask, Np, False)

        targets = padf(g.targets.astype(dt), Tp)
        sample_weights = padf(g.sample_weights.astype(dt), Tp)

        if g.focus == "g":
            # target row t <-> pooled graph t (pooling runs with Tp segments)
            out_index = np.arange(Tp, dtype=np.int32)
            sel = padf(np.ones(T, dtype=bool), Tp, False)
        else:
            # target rows correspond, in order, to output-masked entities
            # (reference get_filtered_tensor, GNN_BaseClass.py:406-409)
            ent_idx = np.nonzero(g.output_mask)[0].astype(np.int32)
            if len(ent_idx) != T:
                raise ValueError(
                    f"targets rows ({T}) != output-masked entities ({len(ent_idx)})")
            if g.focus == "a":
                # arcs were permuted: map original arc indices to new positions
                ent_idx = inv[ent_idx].astype(np.int32)
            out_index = padf(ent_idx, Tp)
            sel = padf(g.set_mask[np.nonzero(g.output_mask)[0]], Tp, False)

        agg_arcs_c = _host_agg(arc_labels, edge_w, dst, Np)
        agg_nodes_c = _host_agg(nodes[np.minimum(src, Np - 1)], edge_w, dst, Np)
        ps, pe = (_pool_ranges(g.graph_ids(), N, Tp) if g.focus == "g"
                  else (None, None))
        return cls(
            nodes=jnp.asarray(nodes), node_mask=jnp.asarray(node_mask),
            graph_ids=jnp.asarray(graph_ids), pool_w=jnp.asarray(pool_w),
            src=jnp.asarray(src), dst=jnp.asarray(dst),
            arc_labels=jnp.asarray(arc_labels), edge_w=jnp.asarray(edge_w),
            edge_mask=jnp.asarray(edge_mask),
            set_mask=jnp.asarray(set_mask), output_mask=jnp.asarray(output_mask),
            targets=jnp.asarray(targets), sample_weights=jnp.asarray(sample_weights),
            out_index=jnp.asarray(out_index), sel_mask=jnp.asarray(sel),
            n_real=jnp.asarray([N, E, T], dtype=np.int32),
            agg_plan=(_build_plan(src, dst, edge_w, Np) if build_plan else None),
            agg_arcs_cache=jnp.asarray(agg_arcs_c),
            agg_nodes_cache=jnp.asarray(agg_nodes_c),
            pool_starts=ps, pool_ends=pe,
            node_types=(None if getattr(g, "node_types", None) is None
                        else jnp.asarray(padf(g.node_types, Np))),
            focus=g.focus, edges_sorted=bool(sort_edges),
        )

    # ------------------------------------------------------------- utilities
    def with_set_mask(self, set_mask: np.ndarray) -> "GraphBatch":
        """Functional set-mask swap (LKO single-graph folds, GNN_utils.py:268-311).
        Recomputes sel_mask for the new split."""
        sm = np.zeros(self.set_mask.shape[0], dtype=bool)
        sm[: len(set_mask)] = np.asarray(set_mask, dtype=bool)
        if self.focus == "g":
            sel = np.asarray(self.sel_mask)
        else:
            oi = np.asarray(self.out_index)
            valid = np.arange(len(oi)) < int(self.n_real[2])  # real target rows only
            sel = sm[oi] & valid
        return self.replace(set_mask=jnp.asarray(sm), sel_mask=jnp.asarray(sel))

    def to_graph(self, aggregation_mode: Optional[str] = None) -> Graph:
        """Reconstruct a host Graph from this device batch — the analogue of
        the reference's GraphObject.fromGraphTensor (graph_class.py:321-327).

        Padding is stripped; arcs come back in the batch's stored order (dst-
        sorted when sort_edges was used — masks/labels stay consistent, like
        the reference reconstructing from its reordered sparse tensors). The
        aggregation mode is inferred from the stored edge weights unless given
        explicitly. Blocked batches (from_graphs_blocked) reconstruct too:
        graphs are packed sequentially, so real nodes in mask order are in
        original merged order — pad gaps compress out and edge endpoints remap
        through the compression."""
        N, E, T = (int(x) for x in np.asarray(self.n_real))
        src = np.asarray(self.src)[:E].astype(np.int64)
        dst = np.asarray(self.dst)[:E].astype(np.int64)
        if self.adj_blocks is not None:
            # blocked packing interleaves pad slots between graphs; compress
            # node ids over the mask (packing preserves graph order)
            nm = np.asarray(self.node_mask)
            new_id = np.cumsum(nm) - 1          # old padded id -> compact id
            src = new_id[src]
            dst = new_id[dst]
            node_rows = np.nonzero(nm)[0]
        else:
            node_rows = np.arange(N)
        arcs = np.concatenate(
            [src.astype(np.float64)[:, None], dst.astype(np.float64)[:, None],
             np.asarray(self.arc_labels)[:E]], axis=1)
        nodes = np.asarray(self.nodes)[node_rows]
        targets = np.asarray(self.targets)[:T]
        if self.focus == "a":
            set_mask = np.asarray(self.set_mask)[:E]
            output_mask = np.asarray(self.output_mask)[:E]
        else:
            set_mask = np.asarray(self.set_mask)[node_rows]
            output_mask = np.asarray(self.output_mask)[node_rows]
        sample_weights = np.asarray(self.sample_weights)[:T]
        if self.focus == "a" and T:
            # targets are stored in the ORIGINAL entity order while arcs/masks
            # were dst-sorted; put targets into stored-arc order so the
            # reconstructed graph's rows line up with nonzero(output_mask)
            order = np.argsort(np.asarray(self.out_index)[:T], kind="stable")
            targets = targets[order]
            sample_weights = sample_weights[order]

        if aggregation_mode is None:
            w = np.asarray(self.edge_w)[:E].astype(np.float64)
            if E == 0 or np.allclose(w, 1.0):
                aggregation_mode = "sum"
            elif np.allclose(w, 1.0 / E):
                aggregation_mode = "normalized"
            else:
                aggregation_mode = "average"

        node_graph = None
        if self.focus == "g":
            gid = np.asarray(self.graph_ids)[node_rows].astype(np.int64)
            node_graph = np.zeros((N, T), dtype=nodes.dtype)
            node_graph[np.arange(N), gid] = np.asarray(self.pool_w)[node_rows]
        return Graph(arcs=arcs, nodes=nodes, targets=targets, focus=self.focus,
                     set_mask=set_mask, output_mask=output_mask,
                     sample_weights=sample_weights, node_graph=node_graph,
                     aggregation_mode=aggregation_mode,
                     node_types=(None if self.node_types is None
                                 else np.asarray(self.node_types)[node_rows]))

    def pad_shapes(self) -> Tuple[int, int, int]:
        return (self.n_node_pad, self.n_edge_pad, self.n_target_pad)

    def repad(self, node_pad: int, edge_pad: int, target_pad: int) -> "GraphBatch":
        """Grow padding to the given sizes (shrinking is rejected). Used to
        harmonise a batch list onto one shape bucket so jit compiles once.
        Any precomputed aggregation plan is rebuilt for the new node count."""
        if self.adj_blocks is not None:
            raise ValueError("blocked batches are built at their final shape — "
                             "pass target/edge pads to from_graphs_blocked")
        Np0, Ep0, Tp0 = self.pad_shapes()
        if node_pad < Np0 or edge_pad < Ep0 or target_pad < Tp0:
            raise ValueError("repad cannot shrink padded shapes")
        if (node_pad, edge_pad, target_pad) == (Np0, Ep0, Tp0):
            return self

        def grow(x, size, fill=0):
            x = np.asarray(x)
            out = np.full((size,) + x.shape[1:], fill, dtype=x.dtype)
            out[: x.shape[0]] = x
            return jnp.asarray(out)

        n_nodes = int(self.n_real[0])
        dst_fill = (n_nodes - 1) if self.edges_sorted else 0
        ent_pad = edge_pad if self.focus == "a" else node_pad
        new = self.replace(
            nodes=grow(self.nodes, node_pad),
            node_mask=grow(self.node_mask, node_pad, False),
            graph_ids=grow(self.graph_ids, node_pad),
            pool_w=grow(self.pool_w, node_pad),
            src=grow(self.src, edge_pad),
            dst=grow(self.dst, edge_pad, dst_fill),
            arc_labels=grow(self.arc_labels, edge_pad),
            edge_w=grow(self.edge_w, edge_pad),
            edge_mask=grow(self.edge_mask, edge_pad, False),
            set_mask=grow(self.set_mask, ent_pad, False),
            output_mask=grow(self.output_mask, ent_pad, False),
            targets=grow(self.targets, target_pad),
            sample_weights=grow(self.sample_weights, target_pad),
            out_index=grow(self.out_index, target_pad),
            sel_mask=grow(self.sel_mask, target_pad, False),
            agg_arcs_cache=(None if self.agg_arcs_cache is None
                            else grow(self.agg_arcs_cache, node_pad)),
            agg_nodes_cache=(None if self.agg_nodes_cache is None
                             else grow(self.agg_nodes_cache, node_pad)),
            pool_starts=(None if self.pool_starts is None
                         else grow(self.pool_starts, target_pad)),
            pool_ends=(None if self.pool_ends is None
                       else grow(self.pool_ends, target_pad)),
            node_types=(None if self.node_types is None
                        else grow(self.node_types, node_pad)),
        )
        if self.agg_plan is not None:
            new = new.replace(agg_plan=_build_plan(
                np.asarray(new.src), np.asarray(new.dst),
                np.asarray(new.edge_w), node_pad))
        return new


def _pool_ranges(graph_ids, n_nodes, target_pad):
    """Contiguous [start, end) node range per graph (graph ids must be
    non-decreasing — true for merged graphs). Padding rows get empty ranges."""
    gid = np.asarray(graph_ids)[:n_nodes]
    if len(gid) and (np.diff(gid) < 0).any():
        return None, None  # non-contiguous: fall back to segment pooling
    import jax.numpy as _jnp
    n_graphs = int(gid[-1]) + 1 if len(gid) else 0
    starts = np.searchsorted(gid, np.arange(n_graphs), side="left")
    ends = np.searchsorted(gid, np.arange(n_graphs), side="right")
    ps = np.zeros(target_pad, np.int32)
    pe = np.zeros(target_pad, np.int32)
    ps[:n_graphs] = starts
    pe[:n_graphs] = ends
    return _jnp.asarray(ps), _jnp.asarray(pe)


def _host_agg(values, weights, dst, num_nodes):
    if values.dtype == np.float32:
        from gnn_tpu import native
        out = native.seg_rows(values, weights, dst, num_nodes)
        if out is not None:
            return out
    out = np.zeros((num_nodes, values.shape[1]), dtype=values.dtype)
    np.add.at(out, dst, values * weights[:, None])
    return out


def _build_plan(src, dst, edge_w, num_nodes):
    # chunk-grid Pallas segment kernel: correct on hardware, compiles in
    # seconds (ops/pallas_segment.py; the block-dense fused kernels in
    # ops/pallas_fused.py are the faster production path for blocked batches)
    from gnn_tpu.ops.pallas_segment import build_agg_plan
    return build_agg_plan(src, dst, edge_w, num_nodes)


def _pack_offsets(sizes, W: int):
    """Greedy node offsets for block packing (no graph straddles a W-node
    block; graphs larger than W get a dedicated span of ceil(s/W) blocks).
    Returns (offsets, padded node count)."""
    offsets, cursor = [], 0
    for s in sizes:
        if s > W:  # dedicated span of ceil(s/W) blocks
            if cursor % W:
                cursor += W - cursor % W
            offsets.append(cursor)
            cursor += -(-s // W) * W
        else:
            if cursor % W and (cursor % W) + s > W:
                cursor += W - cursor % W
            offsets.append(cursor)
            cursor += s
    return offsets, -(-cursor // W) * W


def packed_block_count(glist, block_w: int = 128) -> int:
    """Block count from_graphs_blocked would produce for `glist` (without
    min_blocks) — cheap: only the packing arithmetic, no array work. Lets
    callers pick a block bucket up front and pack ONCE with min_blocks
    (gnn_tpu/serving.py)."""
    _, Np = _pack_offsets([g.n_nodes for g in glist], int(block_w))
    return Np // int(block_w)


def from_graphs_blocked(glist, *, block_w: int = 128, focus: Optional[str] = None,
                        aggregation_mode: Optional[str] = None,
                        target_pad: Optional[int] = None, edge_pad: Optional[int] = None,
                        min_blocks: Optional[int] = None, dtype=None,
                        adj_dtype=None, fused_layout: bool = False) -> GraphBatch:
    """Build a GraphBatch with graph-aligned node packing and a block-dense
    adjacency.

    Graphs are greedily packed into W-node blocks so no graph straddles a
    block boundary (graphs larger than W span consecutive dedicated blocks;
    their cross-block edges go to a sparse residual). The state aggregation
    then runs as one batched [B, W, W] x [B, W, D] MXU matmul — the TPU-native
    shape of the reference's block-diagonal merged-batch adjacency
    (graph_class.py:285-319) — instead of a scatter.

    Supervision semantics are identical to Graph.merge + from_graph: padding
    slots are mask-excluded everywhere (node_mask interleaves).
    """
    dt = dtype or floatx()
    W = int(block_w)
    if focus is None:
        focus = glist[0].focus
    if aggregation_mode is None:
        aggregation_mode = glist[0].aggregation_mode

    # --- pack graphs into blocks -----------------------------------------
    offsets, Np = _pack_offsets([g.n_nodes for g in glist], W)
    if min_blocks is not None:
        Np = max(Np, int(min_blocks) * W)  # harmonise block counts across batches
    B = Np // W

    # --- node-level arrays ------------------------------------------------
    NL = glist[0].DIM_NODE_LABEL
    nodes = np.zeros((Np, NL), dtype=dt)
    node_mask = np.zeros(Np, dtype=bool)
    graph_ids = np.zeros(Np, dtype=np.int32)
    pool_w = np.zeros(Np, dtype=dt)
    node_types = (np.zeros(Np, dtype=np.int32)
                  if any(g.node_types is not None for g in glist) else None)
    for gi, (g, off) in enumerate(zip(glist, offsets)):
        s = g.n_nodes
        nodes[off:off + s] = g.nodes      # slice assignment casts to dt
        node_mask[off:off + s] = True
        graph_ids[off:off + s] = gi
        if focus == "g":
            pool_w[off:off + s] = g.pool_weights()
        if node_types is not None and g.node_types is not None:
            node_types[off:off + s] = g.node_types

    # --- edges -------------------------------------------------------------
    AL = glist[0].DIM_ARC_LABEL
    src_all, dst_all, w_all, lab_all = [], [], [], []
    for g, off in zip(glist, offsets):
        src_all.append(np.add(g.src, off, dtype=np.int64))
        dst_all.append(np.add(g.dst, off, dtype=np.int64))
        lab_all.append(g.arc_labels)
    src = np.concatenate(src_all)
    dst = np.concatenate(dst_all)
    E = len(src)
    # edge weights follow the REQUESTED aggregation_mode with Graph.merge
    # semantics (the reference re-derives ArcNode on the merged union,
    # graph_class.py:285-319): 'normalized' is 1/E over the UNION edge set;
    # 'average' (per-dst in-degree) and 'sum' are union-invariant so the
    # per-graph (cached) weights are reused when the graph's mode matches
    if aggregation_mode == "normalized":
        w = np.full(E, 1.0 / max(E, 1), dtype=dt)
    elif aggregation_mode == "sum":
        w = np.ones(E, dtype=dt)
    else:
        for g in glist:
            if g.aggregation_mode == "average":
                w_all.append(g.edge_weights())
            else:
                _, inv, counts = np.unique(g.dst, return_inverse=True,
                                           return_counts=True)
                w_all.append((1.0 / counts[inv]))
        w = np.concatenate(w_all).astype(dt, copy=False)
    labs = (np.concatenate(lab_all).astype(dt, copy=False) if AL
            else np.zeros((len(src), 0), dt))
    E = len(src)

    # block-dense adjacency for intra-block edges, residual for the rest
    intra = (src // W) == (dst // W)
    adj = np.zeros((B, W, W), dtype=dt)
    si, di, wi = src[intra], dst[intra], w[intra]
    from gnn_tpu import native
    if not (adj.dtype == np.float32
            and native.block_adj(si, di, np.asarray(wi, np.float32), W, adj)):
        np.add.at(adj, (di // W, di % W, si % W), wi)
    r_src = src[~intra].astype(np.int32)
    r_dst = dst[~intra].astype(np.int32)
    r_w = w[~intra]

    # fused-kernel layout: partition blocks into residual-free "loop" blocks
    # (whole propagation loop runs in VMEM, adjacency streamed once) and
    # residual-coupled "dep" blocks; store transposed, (f32) hi/lo-packed
    # copies so the forward pays no per-call packing pass (pallas_fused.py)
    fl = {}
    if fused_layout:
        import ml_dtypes
        bf16 = ml_dtypes.bfloat16
        dep_set = np.unique(np.concatenate([r_src // W, r_dst // W])
                            ).astype(np.int64)
        loop_ids_np = np.setdiff1d(np.arange(B, dtype=np.int64), dep_set)
        Bi = len(loop_ids_np)
        # hi/lo-pack whenever the EFFECTIVE adjacency precision is above
        # bf16 (adj_dtype=None keeps the batch dtype; an explicit f32/f64
        # request must not silently degrade the fused path to single bf16)
        eff_dt = np.dtype(adj_dtype) if adj_dtype is not None else adj.dtype
        if eff_dt != np.dtype(bf16):
            packed = None
            if adj.dtype == np.float32:
                # one-pass native transpose + hi/lo split (bit-identical
                # round-to-nearest-even; gnn_tpu/native)
                from gnn_tpu import native as _native
                packed = _native.pack_hilo_T(adj)
            if packed is None:
                a32 = np.ascontiguousarray(
                    adj.transpose(0, 2, 1)).astype(np.float32)
                hi = a32.astype(bf16)
                lo = (a32 - hi.astype(np.float32)).astype(bf16)
                packed = np.concatenate([hi, lo], axis=2)  # [B, W, 2W]
        else:
            packed = np.ascontiguousarray(adj.transpose(0, 2, 1)).astype(bf16)
        # the per-step kernels (training / dep-block iteration) read the
        # full packed adjacency in global block order
        fl["adj_packT"] = jnp.asarray(packed)
        if Bi > 0:
            # pad loop blocks to a multiple of the kernel grid group: 24 keeps
            # ~6 MB of VMEM per double-buffered grid step at W=128; any count
            # above 8 pads to a multiple of 8 so a Mosaic-legal group always
            # exists (pick_group loop=True — the mask/margin block shapes
            # need group % 8 == 0 or the full array)
            GRP = 24 if Bi > 24 else 8
            Bi_pad = -(-Bi // GRP) * GRP if Bi > 8 else Bi
            adj_loop = np.zeros((Bi_pad,) + packed.shape[1:], packed.dtype)
            adj_loop[:Bi] = packed[loop_ids_np]
            ids_pad = np.zeros(Bi_pad, np.int32)
            ids_pad[:Bi] = loop_ids_np
            nm_blocks = node_mask.reshape(B, W)
            loop_nm = np.zeros((Bi_pad, W), np.float32)
            loop_nm[:Bi] = nm_blocks[loop_ids_np]
            fl["adj_loop"] = jnp.asarray(adj_loop)
            fl["loop_ids"] = jnp.asarray(ids_pad)
            fl["loop_nm"] = jnp.asarray(loop_nm)
            perm = np.zeros(B, np.int32)
            perm[loop_ids_np] = np.arange(Bi)
            if len(dep_set):
                perm[dep_set] = Bi_pad + np.arange(len(dep_set))
                fl["adj_dep"] = jnp.asarray(packed[dep_set])
                fl["dep_ids"] = jnp.asarray(dep_set.astype(np.int32))
                # residual edges in dep-local flat ids (padding rows land on 0
                # with weight 0, harmless under segment_sum); lengths/padding
                # mirror res_src/res_dst so res_w aligns element-wise
                pos = np.searchsorted(dep_set, r_src // W)
                loc_src = (pos * W + r_src % W).astype(np.int32)
                pos = np.searchsorted(dep_set, r_dst // W)
                loc_dst = (pos * W + r_dst % W).astype(np.int32)
                Er_ = max(-(-len(loc_src) // 128) * 128, 128)
                fl["res_src_loc"] = jnp.asarray(
                    np.pad(loc_src, (0, Er_ - len(loc_src))))
                fl["res_dst_loc"] = jnp.asarray(
                    np.pad(loc_dst, (0, Er_ - len(loc_dst))))
            fl["block_perm"] = jnp.asarray(perm)
    if adj_dtype is not None:
        # opt-in low-precision adjacency: halves the dominant HBM stream in
        # the propagation bmm; weights (1/indeg etc.) round at ~0.4% relative
        adj = jnp.asarray(adj).astype(adj_dtype)
    Er = max(-(-len(r_src) // 128) * 128, 128)
    res_src = np.zeros(Er, np.int32)
    res_dst = np.zeros(Er, np.int32)
    res_w = np.zeros(Er, dt)
    res_src[:len(r_src)] = r_src
    res_dst[:len(r_dst)] = r_dst
    res_w[:len(r_w)] = r_w

    # full edge arrays (arc-label aggregation + edge readout), dst-sorted
    order = np.argsort(dst, kind="stable")
    Ep = edge_pad or pad_size(E)
    def padf(x, size, fill=0):
        out = np.full((size,) + x.shape[1:], fill, dtype=x.dtype)
        out[: x.shape[0]] = x
        return out
    src_p = padf(src[order].astype(np.int32), Ep)
    dst_p = padf(dst[order].astype(np.int32), Ep, fill=Np - 1)
    labs_p = padf(labs[order], Ep)
    w_p = padf(w[order], Ep)
    edge_mask = padf(np.ones(E, bool), Ep, False)

    # --- supervision -------------------------------------------------------
    targets = np.concatenate([g.targets for g in glist]).astype(dt)
    sample_weights = np.concatenate([g.sample_weights for g in glist]).astype(dt)
    T = targets.shape[0]
    Tp = target_pad or pad_size(T)
    if focus == "a":
        # arc-level supervision: masks follow the dst-sort permutation; target
        # rows map to output-masked arcs in ORIGINAL concatenated arc order
        # (reference get_filtered_tensor semantics, GNN_BaseClass.py:406-409)
        set_all = np.concatenate([g.set_mask for g in glist])
        out_all = np.concatenate([g.output_mask for g in glist])
        set_mask = padf(set_all[order], Ep, False)
        output_mask = padf(out_all[order], Ep, False)
        inv = np.empty(E, np.int64)
        inv[order] = np.arange(E)
        orig_idx = np.nonzero(out_all)[0]
        if len(orig_idx) != T:
            raise ValueError(f"targets rows ({T}) != output-masked entities ({len(orig_idx)})")
        out_index = padf(inv[orig_idx].astype(np.int32), Tp)
        sel = padf(set_all[orig_idx], Tp, False)
    else:
        set_mask = np.zeros(Np, bool)
        output_mask = np.zeros(Np, bool)
        for g, off in zip(glist, offsets):
            set_mask[off:off + g.n_nodes] = g.set_mask
            output_mask[off:off + g.n_nodes] = g.output_mask
        if focus == "g":
            out_index = np.arange(Tp, dtype=np.int32)
            sel = padf(np.ones(T, bool), Tp, False)
        else:
            ent_idx = np.nonzero(output_mask)[0].astype(np.int32)
            if len(ent_idx) != T:
                raise ValueError(f"targets rows ({T}) != output-masked entities ({len(ent_idx)})")
            out_index = padf(ent_idx, Tp)
            sel = padf(set_mask[ent_idx], Tp, False)

    agg_arcs_c = _host_agg(labs_p, w_p, dst_p, Np)
    agg_nodes_c = _host_agg(nodes[np.minimum(src_p, Np - 1)], w_p, dst_p, Np)
    if focus == "g":
        ps = np.zeros(Tp, np.int32)
        pe = np.zeros(Tp, np.int32)
        for gi, (g, off) in enumerate(zip(glist, offsets)):
            ps[gi] = off
            pe[gi] = off + g.n_nodes
        ps, pe = jnp.asarray(ps), jnp.asarray(pe)
    else:
        ps = pe = None
    return GraphBatch(
        nodes=jnp.asarray(nodes), node_mask=jnp.asarray(node_mask),
        graph_ids=jnp.asarray(graph_ids), pool_w=jnp.asarray(pool_w),
        src=jnp.asarray(src_p), dst=jnp.asarray(dst_p),
        arc_labels=jnp.asarray(labs_p), edge_w=jnp.asarray(w_p),
        edge_mask=jnp.asarray(edge_mask),
        set_mask=jnp.asarray(set_mask), output_mask=jnp.asarray(output_mask),
        targets=jnp.asarray(padf(targets, Tp)),
        sample_weights=jnp.asarray(padf(sample_weights, Tp)),
        out_index=jnp.asarray(out_index), sel_mask=jnp.asarray(sel),
        n_real=jnp.asarray([int(node_mask.sum()), E, T], np.int32),
        agg_arcs_cache=jnp.asarray(agg_arcs_c),
        agg_nodes_cache=jnp.asarray(agg_nodes_c),
        pool_starts=ps, pool_ends=pe,
        adj_blocks=jnp.asarray(adj),
        res_src=jnp.asarray(res_src),
        **fl,
        res_dst=jnp.asarray(res_dst), res_w=jnp.asarray(res_w),
        node_types=(None if node_types is None else jnp.asarray(node_types)),
        focus=focus, edges_sorted=True,
    )


def batch_key(gb: GraphBatch) -> tuple:
    """Compile-cache key: jit recompiles only when this changes."""
    return (gb.focus, gb.pad_shapes(), gb.dim_node_label, gb.dim_arc_label, gb.dim_target)


def stack_batches(batches) -> GraphBatch:
    """Stack equal-shape GraphBatches along a new leading device axis (for
    data-parallel shard_map: one merged graph per device)."""
    focus = batches[0].focus
    if any(b.focus != focus for b in batches):
        raise ValueError("all batches must share focus")
    if any(b.pad_shapes() != batches[0].pad_shapes() for b in batches):
        raise ValueError("all batches must share padded shapes — pad to a common bucket")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *batches)
