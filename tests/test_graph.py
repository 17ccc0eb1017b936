"""Graph container tests: aggregation weights, merge batching, save/load.

Validates against hand-computed values on the reference's debugging fixture
(simple_graph, GNN_utils.py:88-105) and property-checks merge ≡ block-diagonal
batching (SURVEY.md §4)."""

import os

import jax
import numpy as np
import pytest

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.graph import Graph


def simple_graph(focus="n", aggregation_mode="average"):
    """The reference 4-node/8-arc fixture (GNN_utils.py:88-105), deterministic
    targets (no sklearn clustering — fixed here for reproducibility)."""
    nodes = np.array([[11, 21], [12, 22], [13, 23], [14, 24]], dtype=float)
    arcs = np.array([[0, 1, 10], [0, 2, 40], [1, 0, 10], [1, 2, 20],
                     [2, 0, 40], [2, 1, 20], [2, 3, 30], [3, 2, 30]], dtype=float)
    tn = {"n": 4, "a": 8, "g": 1}[focus]
    targets = np.zeros((tn, 2))
    targets[np.arange(tn) % 2 == 0, 0] = 1
    targets[np.arange(tn) % 2 == 1, 1] = 1
    return Graph(arcs=arcs, nodes=nodes, targets=targets, focus=focus,
                 aggregation_mode=aggregation_mode)


def random_graph(rng, n=30, e=120, nl=3, al=2, dt=2, focus="n", agg="average"):
    nodes = rng.standard_normal((n, nl))
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    arcs = np.concatenate([src[:, None], dst[:, None], rng.standard_normal((e, al))], axis=1)
    tn = {"n": n, "a": e, "g": 1}[focus]
    targets = np.eye(dt)[rng.integers(0, dt, tn)]
    return Graph(arcs=arcs, nodes=nodes, targets=targets, focus=focus, aggregation_mode=agg)


class TestAggregationWeights:
    def test_sum(self):
        g = simple_graph(aggregation_mode="sum")
        assert np.allclose(g.edge_weights(), np.ones(8))

    def test_normalized(self):
        g = simple_graph(aggregation_mode="normalized")
        assert np.allclose(g.edge_weights(), np.full(8, 1.0 / 8.0))

    def test_average_is_one_over_indegree(self):
        g = simple_graph(aggregation_mode="average")
        # dst column: [1,2,0,2,0,1,3,2] -> indegree: node0:2 node1:2 node2:3 node3:1
        expect = np.array([1/2, 1/3, 1/2, 1/3, 1/2, 1/2, 1, 1/3])
        assert np.allclose(g.edge_weights(), expect, atol=1e-6)

    def test_average_weights_sum_to_one_per_reached_node(self, rng):
        g = random_graph(rng)
        w = g.edge_weights()
        per_node = np.zeros(g.n_nodes)
        np.add.at(per_node, g.dst, w)
        reached = np.unique(g.dst)
        assert np.allclose(per_node[reached], 1.0, atol=1e-5)


class TestSparseGetters:
    """getAdjacency/getArcNode parity with the reference matrices
    (graph_class.py:90-121, 178-184) — including against the actual reference
    when it is importable."""

    @pytest.mark.parametrize("agg", ["average", "normalized", "sum"])
    def test_matrices_against_reference_construction(self, rng, agg):
        g = random_graph(rng, agg=agg)
        adj = g.getAdjacency().toarray()
        an = g.getArcNode().toarray()
        w = g.edge_weights()
        # ArcNode: exactly one nonzero per row at dst with value w_e
        assert an.shape == (g.n_arcs, g.n_nodes)
        for e in range(g.n_arcs):
            assert an[e, g.dst[e]] == pytest.approx(w[e])
            assert np.count_nonzero(an[e]) == 1
        # Adjacency accumulates duplicate arcs
        dense = np.zeros_like(adj)
        np.add.at(dense, (g.src, g.dst), w)
        assert np.allclose(adj, dense, atol=1e-6)

    def test_against_actual_reference(self, rng):
        import importlib, sys
        if not os.path.isdir("/root/reference/GNN"):
            pytest.skip("reference unavailable")
        sys.path.insert(0, "/root/reference")
        try:
            gc = importlib.import_module("GNN.graph_class")
        except Exception:
            pytest.skip("reference not importable")
        g = random_graph(rng, agg="average")
        ref = gc.GraphObject(arcs=g.getArcs(), nodes=g.getNodes(),
                             targets=g.getTargets(), problem_based="n",
                             aggregation_mode="average")
        assert np.allclose(g.getAdjacency().toarray(),
                           ref.Adjacency.toarray(), atol=1e-6)
        assert np.allclose(g.getArcNode().toarray(),
                           ref.ArcNode.toarray(), atol=1e-6)


class TestMerge:
    def test_merge_offsets_and_concat(self, rng):
        gs = [random_graph(rng, n=10 + i, e=30 + i) for i in range(3)]
        m = Graph.merge(gs, focus="n", aggregation_mode="average")
        assert m.n_nodes == sum(g.n_nodes for g in gs)
        assert m.n_arcs == sum(g.n_arcs for g in gs)
        # node ids of graph 1 arcs offset by graph 0 node count
        block = m.arcs[gs[0].n_arcs: gs[0].n_arcs + gs[1].n_arcs, :2]
        assert block.min() >= gs[0].n_nodes
        assert np.allclose(m.nodes, np.concatenate([g.nodes for g in gs]))
        assert np.allclose(m.targets, np.concatenate([g.targets for g in gs]))

    def test_merge_average_equals_per_graph(self, rng):
        """Aggregation in a merged graph == per-graph aggregation (disjoint
        union leaves in-degrees untouched)."""
        gs = [random_graph(rng, n=12, e=40) for _ in range(2)]
        m = Graph.merge(gs, focus="n", aggregation_mode="average")
        w_merged = m.edge_weights()
        w_each = np.concatenate([g.edge_weights() for g in gs])
        assert np.allclose(w_merged, w_each, atol=1e-6)

    def test_merge_graph_focus_nodegraph_blockdiag(self, rng):
        gs = [random_graph(rng, n=5, e=12, focus="g"), random_graph(rng, n=7, e=20, focus="g")]
        m = Graph.merge(gs, focus="g", aggregation_mode="sum")
        assert m.NodeGraph.shape == (12, 2)
        assert np.allclose(m.NodeGraph[:5, 0], 1 / 5)
        assert np.allclose(m.NodeGraph[5:, 1], 1 / 7)
        assert np.allclose(m.NodeGraph[:5, 1], 0)
        gid = m.graph_ids()
        assert (gid[:5] == 0).all() and (gid[5:] == 1).all()
        assert np.allclose(m.pool_weights()[:5], 1 / 5)


class TestIO:
    def test_save_load_npy_roundtrip(self, rng, tmp_path):
        g = random_graph(rng, focus="n")
        g.set_mask[:5] = False
        g.sample_weights[0] = 3.0
        g.save(str(tmp_path / "g"))
        g2 = Graph.load(str(tmp_path / "g"), focus="n", aggregation_mode="average")
        assert np.allclose(g.arcs, g2.arcs)
        assert np.allclose(g.nodes, g2.nodes)
        assert np.allclose(g.targets, g2.targets)
        assert (g.set_mask == g2.set_mask).all()
        assert np.allclose(g.sample_weights, g2.sample_weights)

    def test_save_load_txt_roundtrip(self, rng, tmp_path):
        g = random_graph(rng, focus="g")
        g.savetxt(str(tmp_path / "g"))
        g2 = Graph.load_txt(str(tmp_path / "g"), focus="g", aggregation_mode="sum")
        assert np.allclose(g.arcs, g2.arcs, atol=1e-6)
        assert np.allclose(g.nodes, g2.nodes, atol=1e-6)

    def test_copy_independent(self, rng):
        g = random_graph(rng)
        c = g.copy()
        c.nodes[0, 0] = 123.0
        assert g.nodes[0, 0] != 123.0


class TestBatch:
    def test_padding_and_masks(self, rng):
        from gnn_tpu.graphs.batch import GraphBatch
        g = random_graph(rng, n=30, e=120)
        gb = GraphBatch.from_graph(g)
        Np, Ep, Tp = gb.pad_shapes()
        assert Np >= 30 and Ep >= 120
        assert int(np.sum(np.asarray(gb.node_mask))) == 30
        assert int(np.sum(np.asarray(gb.edge_mask))) == 120
        assert np.allclose(np.asarray(gb.edge_w)[120:], 0)
        assert int(np.sum(np.asarray(gb.sel_mask))) == 30  # all nodes targeted

    def test_target_alignment_with_output_mask(self, rng):
        from gnn_tpu.graphs.batch import GraphBatch
        g = random_graph(rng, n=20, e=60)
        om = np.zeros(20, dtype=bool)
        om[[2, 5, 7, 11]] = True
        g2 = Graph(arcs=g.arcs, nodes=g.nodes, targets=g.targets[:4],
                   focus="n", output_mask=om)
        gb = GraphBatch.from_graph(g2)
        assert list(np.asarray(gb.out_index)[:4]) == [2, 5, 7, 11]
        assert int(np.sum(np.asarray(gb.sel_mask))) == 4


class TestToGraph:
    """GraphBatch.to_graph — the fromGraphTensor analogue
    (graph_class.py:321-327): device batch → host Graph round trip."""

    @pytest.mark.parametrize("focus", ["n", "a", "g"])
    def test_roundtrip_forward_identical(self, rng, focus):
        from gnn_tpu.models.core import GNNSpec, gnn_forward, gnn_init
        from gnn_tpu.ops.mlp import MLPSpec, get_inout_dims
        g = random_graph(rng, n=25, e=90, focus=focus)
        # make masks non-trivial
        g.set_mask[::3] = False
        gb = GraphBatch.from_graph(g)
        g2 = gb.to_graph()
        assert g2.focus == focus and g2.aggregation_mode == "average"
        gb2 = GraphBatch.from_graph(g2)
        in_s, ls = get_inout_dims("state", 3, 2, 2, focus, 0, None)
        in_o, lo = get_inout_dims("output", 3, 2, 2, focus, 0, None)
        spec = GNNSpec(
            focus=focus,
            state_spec=MLPSpec(input_dim=in_s, units=tuple(ls), activations="tanh"),
            output_spec=MLPSpec(input_dim=in_o, units=tuple(lo), activations="softmax",
                                batch_normalization=False),
            max_iteration=4, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        r1 = gnn_forward(spec, params, bn, gb, jax.random.key(1))
        r2 = gnn_forward(spec, params, bn, gb2, jax.random.key(1))
        T = int(np.asarray(gb.n_real)[2])
        o1 = np.asarray(r1["out"])[np.asarray(gb.sel_mask)]
        o2 = np.asarray(r2["out"])[np.asarray(gb2.sel_mask)]
        t1 = np.asarray(gb.targets)[np.asarray(gb.sel_mask)]
        t2 = np.asarray(gb2.targets)[np.asarray(gb2.sel_mask)]
        # selected (target, output) pairs agree as sets row-for-row
        k1 = np.lexsort(np.concatenate([o1, t1], axis=1).T)
        k2 = np.lexsort(np.concatenate([o2, t2], axis=1).T)
        assert np.allclose(np.concatenate([o1, t1], 1)[k1],
                           np.concatenate([o2, t2], 1)[k2], atol=1e-6)
        assert T == int(np.asarray(gb2.n_real)[2])

    def test_infers_aggregation(self, rng):
        g = random_graph(rng, n=20, e=60, agg="sum")
        assert GraphBatch.from_graph(g).to_graph().aggregation_mode == "sum"
        g2 = random_graph(rng, n=20, e=60, agg="normalized")
        assert GraphBatch.from_graph(g2).to_graph().aggregation_mode == "normalized"

    @pytest.mark.parametrize("focus", ["n", "a", "g"])
    def test_blocked_roundtrip(self, rng, focus):
        """from_graphs_blocked packs graphs sequentially with pad gaps;
        to_graph compresses them out and must agree with Graph.merge."""
        from gnn_tpu.graphs.batch import from_graphs_blocked
        # one graph bigger than the block width -> residual (cross-block) edges
        gs = [random_graph(rng, n=n, e=3 * n, focus=focus)
              for n in (12, 80, 9, 30)]
        merged = Graph.merge(gs, focus=focus, aggregation_mode="average")
        gbb = from_graphs_blocked(gs, block_w=64)
        g2 = gbb.to_graph()
        assert g2.focus == focus
        assert g2.n_nodes == merged.n_nodes and g2.n_arcs == merged.n_arcs
        # node rows come back in original merged order
        assert np.allclose(g2.nodes, merged.nodes, atol=1e-6)
        # edges as canonical (src, dst, labels) sets
        def canon(g):
            a = np.asarray(g.arcs, dtype=np.float64)
            return a[np.lexsort(a.T[::-1])]
        assert np.allclose(canon(g2), canon(merged), atol=1e-6)
        if focus == "a":
            # arc targets ride the stored (dst-sorted) arc order; compare
            # them keyed by the supervised arc, not by row position
            def arc_targets(g):
                rows = np.nonzero(g.output_mask)[0]
                key = np.asarray(g.arcs, np.float64)[rows]
                order = np.lexsort(key.T[::-1])
                return key[order], np.asarray(g.targets)[order]
            k2, t2 = arc_targets(g2)
            km, tm = arc_targets(merged)
            assert np.allclose(k2, km, atol=1e-6)
            assert np.allclose(t2, tm, atol=1e-6)
        else:
            assert np.allclose(g2.targets, merged.targets, atol=1e-6)
        if focus == "g":
            assert np.allclose(g2.NodeGraph, merged.NodeGraph, atol=1e-6)
        if focus != "a":
            assert np.array_equal(g2.set_mask, merged.set_mask)
            assert np.array_equal(g2.output_mask, merged.output_mask)

    def test_graph_focus_pooling_preserved(self, rng):
        gs = [random_graph(rng, n=8 + i, e=20, focus="g") for i in range(3)]
        merged = Graph.merge(gs, focus="g", aggregation_mode="average")
        g2 = GraphBatch.from_graph(merged).to_graph()
        assert g2.NodeGraph.shape == merged.NodeGraph.shape
        assert np.allclose(g2.NodeGraph, merged.NodeGraph, atol=1e-6)


class TestBlockedAggregationModes:
    """from_graphs_blocked must honor the requested aggregation_mode with
    Graph.merge semantics (the reference re-derives ArcNode on the merged
    union, graph_class.py:285-319). Regression: the aggregation_mode
    parameter used to be ignored for edge weights, and 'normalized' must be
    1/E over the UNION edge set, not per-graph (found by fuzz_parity)."""

    @pytest.mark.parametrize("mode", ["sum", "normalized", "average"])
    def test_blocked_weights_match_merged(self, rng, mode):
        from gnn_tpu.graphs.batch import from_graphs_blocked
        gs = [random_graph(rng, n=int(rng.integers(8, 15)), e=30, nl=3, al=1,
                           agg=mode) for _ in range(4)]
        merged = Graph.merge(gs, focus="n", aggregation_mode=mode)
        gb = from_graphs_blocked(gs, block_w=16, focus="n",
                                 aggregation_mode=mode)
        E = merged.n_arcs
        w_m = np.sort(np.asarray(merged.edge_weights()))
        w_b = np.sort(np.asarray(gb.edge_w)[:E])
        np.testing.assert_allclose(w_b, w_m, atol=1e-7)

    def test_blocked_forward_matches_segment_normalized(self, rng):
        import dataclasses
        from gnn_tpu.graphs.batch import from_graphs_blocked
        from gnn_tpu.models.core import GNNSpec, gnn_forward, gnn_init
        from gnn_tpu.ops.mlp import MLPSpec
        gs = [random_graph(rng, n=int(rng.integers(8, 15)), e=30, nl=3, al=1,
                           agg="normalized") for _ in range(4)]
        merged = Graph.merge(gs, focus="n", aggregation_mode="normalized")
        gb_seg = GraphBatch.from_graph(merged)
        gb_blk = from_graphs_blocked(gs, block_w=16, focus="n",
                                     aggregation_mode="normalized")
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=4, threshold=0.01,
                       aggregation="segment")
        params, bn = gnn_init(spec, jax.random.key(0))
        r1 = gnn_forward(spec, params, bn, gb_seg, jax.random.key(1))
        r2 = gnn_forward(dataclasses.replace(spec, aggregation="blocked"),
                         params, bn, gb_blk, jax.random.key(1))
        o1 = np.asarray(r1["out"])[np.asarray(gb_seg.sel_mask)]
        o2 = np.asarray(r2["out"])[np.asarray(gb_blk.sel_mask)]
        np.testing.assert_allclose(o2, o1, atol=1e-5)
