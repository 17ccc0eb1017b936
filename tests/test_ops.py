"""Ops tests: aggregation strategies agree with each other and with a dense
scipy-style reference; MLP matches hand-computed dense math; BN/dropout
semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.ops.aggregate import aggregate_to_nodes, pool_graphs
from gnn_tpu.ops.mlp import MLPSpec, mlp_init, mlp_apply, mlp_regularization


def dense_reference(values, weights, dst, num_nodes):
    """agg[n] = Σ_{e: dst_e==n} w_e * values[e] — plain numpy."""
    out = np.zeros((num_nodes, values.shape[1]), dtype=np.float64)
    for e in range(values.shape[0]):
        out[dst[e]] += weights[e] * values[e]
    return out


class TestAggregate:
    @pytest.mark.parametrize("strategy", ["segment", "onehot"])
    def test_matches_dense_reference(self, rng, strategy):
        E, N, D = 200, 50, 7
        vals = rng.standard_normal((E, D)).astype(np.float32)
        w = rng.random(E).astype(np.float32)
        dst = rng.integers(0, N, E).astype(np.int32)
        got = aggregate_to_nodes(jnp.asarray(vals), jnp.asarray(w), jnp.asarray(dst),
                                 N, strategy=strategy)
        ref = dense_reference(vals, w, dst, N)
        assert np.allclose(np.asarray(got), ref, atol=1e-4)

    def test_pallas_strategy_routes_per_edge_values(self, rng):
        """Regression: strategy='pallas' on per-edge values must compute (not
        raise) — it degenerates to the weighted segment sum, both for sorted
        and unsorted edges (ops/aggregate.py)."""
        E, N, D = 120, 30, 4
        vals = rng.standard_normal((E, D)).astype(np.float32)
        w = rng.random(E).astype(np.float32)
        dst = rng.integers(0, N, E).astype(np.int32)
        ref = dense_reference(vals, w, dst, N)
        for srt in (False, True):
            if srt:
                order = np.argsort(dst, kind="stable")
                vals_s, w_s, dst_s = vals[order], w[order], dst[order]
            else:
                vals_s, w_s, dst_s = vals, w, dst
            got = aggregate_to_nodes(jnp.asarray(vals_s), jnp.asarray(w_s),
                                     jnp.asarray(dst_s), N, strategy="pallas",
                                     indices_sorted=srt)
            assert np.allclose(np.asarray(got), ref, atol=1e-4)

    def test_strategies_agree(self, rng):
        E, N, D = 333, 41, 5
        vals = rng.standard_normal((E, D)).astype(np.float32)
        w = rng.random(E).astype(np.float32)
        dst = rng.integers(0, N, E).astype(np.int32)
        a = aggregate_to_nodes(jnp.asarray(vals), jnp.asarray(w), jnp.asarray(dst), N, strategy="segment")
        b = aggregate_to_nodes(jnp.asarray(vals), jnp.asarray(w), jnp.asarray(dst), N, strategy="onehot")
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_duplicate_edges_accumulate(self):
        # duplicated (src,dst) pairs must sum — scipy coo_matrix semantics
        vals = jnp.asarray([[1.0], [2.0], [4.0]])
        w = jnp.asarray([1.0, 1.0, 0.5])
        dst = jnp.asarray([3, 3, 3], dtype=jnp.int32)
        out = aggregate_to_nodes(vals, w, dst, 5, strategy="segment")
        assert np.allclose(np.asarray(out)[3], [5.0])

    def test_pool_graphs(self, rng):
        N, G, D = 12, 3, 4
        vals = rng.standard_normal((N, D)).astype(np.float32)
        gid = np.repeat(np.arange(G), 4).astype(np.int32)
        pw = np.full(N, 0.25, dtype=np.float32)
        out = pool_graphs(jnp.asarray(vals), jnp.asarray(gid), jnp.asarray(pw), G)
        for g in range(G):
            assert np.allclose(np.asarray(out)[g], vals[gid == g].mean(0), atol=1e-5)

    def test_grad_flows(self, rng):
        E, N, D = 64, 16, 3
        vals = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
        w = jnp.asarray(rng.random(E).astype(np.float32))
        dst = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
        for s in ("segment", "onehot"):
            g = jax.grad(lambda v: jnp.sum(aggregate_to_nodes(v, w, dst, N, strategy=s) ** 2))(vals)
            assert np.isfinite(np.asarray(g)).all()


class TestMLP:
    def test_dense_math(self):
        spec = MLPSpec(input_dim=3, units=(4, 2), activations=("relu", "linear"),
                       kernel_initializer="glorot_normal", bias_initializer="zeros",
                       batch_normalization=False)
        params, bn = mlp_init(spec, jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(1).standard_normal((5, 3)).astype(np.float32))
        y, _ = mlp_apply(spec, params, bn, x)
        w0, b0 = params["dense_0"]["w"], params["dense_0"]["b"]
        w1, b1 = params["dense_1"]["w"], params["dense_1"]["b"]
        ref = np.maximum(np.asarray(x) @ np.asarray(w0) + np.asarray(b0), 0) @ np.asarray(w1) + np.asarray(b1)
        assert np.allclose(np.asarray(y), ref, atol=1e-5)

    def test_batchnorm_train_vs_eval(self, rng):
        spec = MLPSpec(input_dim=3, units=(4,), activations="linear",
                       batch_normalization=True)
        params, bn = mlp_init(spec, jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
        y_tr, bn2 = mlp_apply(spec, params, bn, x, training=True)
        # train-mode output is standardised (gamma=1, beta=0 at init)
        assert np.allclose(np.asarray(y_tr).mean(0), 0, atol=1e-4)
        assert np.allclose(np.asarray(y_tr).std(0), 1, atol=1e-2)
        # moving stats moved toward batch stats (momentum 0.99)
        assert not np.allclose(np.asarray(bn2["mean"]), np.asarray(bn["mean"]))
        # eval mode uses moving stats (unchanged by apply)
        y_ev, bn3 = mlp_apply(spec, params, bn2, x, training=False)
        assert jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(jnp.all(a == b)), bn2, bn3))

    def test_batchnorm_stat_mask_ignores_padding(self, rng):
        spec = MLPSpec(input_dim=2, units=(2,), activations="linear",
                       batch_normalization=True)
        params, bn = mlp_init(spec, jax.random.key(0))
        x_real = rng.standard_normal((10, 2)).astype(np.float32)
        x_pad = np.concatenate([x_real, np.zeros((22, 2), np.float32)])
        mask = np.zeros(32, bool)
        mask[:10] = True
        y_full, _ = mlp_apply(spec, params, bn, jnp.asarray(x_real), training=True)
        y_mask, _ = mlp_apply(spec, params, bn, jnp.asarray(x_pad), training=True,
                              stat_mask=jnp.asarray(mask))
        assert np.allclose(np.asarray(y_full), np.asarray(y_mask)[:10], atol=1e-5)

    def test_dropout_scaling_and_determinism(self, rng):
        spec = MLPSpec(input_dim=8, units=(8,), activations="linear",
                       kernel_initializer="glorot_normal", bias_initializer="zeros",
                       dropout_rate=(0.5,), dropout_pos=(0,), batch_normalization=False)
        params, bn = mlp_init(spec, jax.random.key(0))
        x = jnp.ones((1000, 8))
        y1, _ = mlp_apply(spec, params, bn, x, training=True, rng=jax.random.key(1))
        y2, _ = mlp_apply(spec, params, bn, x, training=True, rng=jax.random.key(1))
        assert np.allclose(np.asarray(y1), np.asarray(y2))  # same rng -> same mask
        y_ev, _ = mlp_apply(spec, params, bn, x, training=False)
        # E[dropout(x)] == x: compare column means loosely
        assert np.allclose(np.asarray(y1).mean(0), np.asarray(y_ev).mean(0), atol=0.25)

    def test_regularization_terms(self):
        spec = MLPSpec(input_dim=3, units=(2,), activations="linear",
                       kernel_regularizer=("l2", 0.1), bias_regularizer=("l1", 0.5),
                       batch_normalization=False)
        params, _ = mlp_init(spec, jax.random.key(0))
        w = np.asarray(params["dense_0"]["w"])
        b = np.asarray(params["dense_0"]["b"])
        expect = 0.1 * np.sum(w ** 2) + 0.5 * np.sum(np.abs(b))
        assert np.allclose(float(mlp_regularization(spec, params)), expect, rtol=1e-5)

    def test_get_inout_dims_matches_reference_arithmetic(self):
        from gnn_tpu.ops.mlp import get_inout_dims
        # DS=0, node focus, layer 0 (MLP.py:103-110)
        i, layers = get_inout_dims("state", 3, 1, 2, "n", 0, None)
        assert i == 1 + 2 * 3 and layers == [3]
        i, layers = get_inout_dims("output", 3, 1, 2, "n", 0, None)
        assert i == 3 and layers == [2]
        # edge focus output: 2*NL + AL (+2*DS)
        i, _ = get_inout_dims("output", 3, 1, 2, "a", 0, None)
        assert i == 2 * 3 + 1
        # LGNN layer growth, DS=0, get_output only (MLP.py:93-100)
        i, layers = get_inout_dims("state", 3, 1, 2, "n", 0, None,
                                   layer=2, get_state=False, get_output=True)
        assert i == 1 + 2 * (3 + 2) and layers == [5]
        # DS>0
        i, layers = get_inout_dims("state", 3, 1, 2, "n", 4, [8])
        assert i == 1 + 2 * (3 + 4) and layers == [8, 4]


class TestPallasBlockAggregate:
    """Fused block-sparse aggregation kernel (interpret mode on CPU)."""

    def test_forward_matches_dense(self, rng):
        from gnn_tpu.ops.pallas_segment import build_agg_plan, block_aggregate
        N, E, D = 256, 900, 6
        src = rng.integers(0, N, E)
        dst = rng.integers(0, N, E)
        w = rng.random(E).astype(np.float32)
        state = rng.standard_normal((N, D)).astype(np.float32)
        plans = build_agg_plan(src, dst, w, N, block_w=128, chunk_c=128)
        out = block_aggregate(jnp.asarray(state), plans)
        ref = np.zeros((N, D), np.float32)
        np.add.at(ref, dst, w[:, None] * state[src])
        assert np.allclose(np.asarray(out), ref, atol=1e-3)

    def test_vjp_is_exact_transpose(self, rng):
        from gnn_tpu.ops.pallas_segment import build_agg_plan, block_aggregate
        N, E, D = 256, 700, 4
        src = rng.integers(0, N, E)
        dst = rng.integers(0, N, E)
        w = rng.random(E).astype(np.float32)
        state = rng.standard_normal((N, D)).astype(np.float32)
        M = rng.standard_normal((N, D)).astype(np.float32)
        plans = build_agg_plan(src, dst, w, N, block_w=128, chunk_c=128)
        g = jax.grad(lambda s: jnp.sum(block_aggregate(s, plans) * M))(jnp.asarray(state))
        gref = np.zeros((N, D), np.float32)
        np.add.at(gref, src, w[:, None] * M[dst])
        assert np.allclose(np.asarray(g), gref, atol=1e-3)

    def test_full_model_with_pallas_strategy(self, rng):
        """gnn_forward with aggregation='pallas' == 'segment' result."""
        import dataclasses
        from gnn_tpu.graphs.graph import Graph
        from gnn_tpu.graphs.batch import GraphBatch
        from gnn_tpu.models.core import GNNSpec, gnn_init, gnn_forward
        n, e = 100, 400
        nodes = rng.standard_normal((n, 3)).astype(np.float32)
        arcs = np.concatenate([rng.integers(0, n, (e, 1)), rng.integers(0, n, (e, 1)),
                               rng.standard_normal((e, 1)).astype(np.float32)], axis=1)
        targs = np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)]
        g = Graph(arcs=arcs, nodes=nodes, targets=targs, focus="n")
        ss = MLPSpec(input_dim=1 + 2 * 3, units=(3,), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        spec_seg = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                           max_iteration=4, threshold=0.01, aggregation="segment")
        spec_pal = dataclasses.replace(spec_seg, aggregation="pallas")
        params, bn = gnn_init(spec_seg, jax.random.key(0))
        gb_plain = GraphBatch.from_graph(g, node_pad=128, edge_pad=512, target_pad=128)
        gb_plan = GraphBatch.from_graph(g, node_pad=128, edge_pad=512, target_pad=128,
                                        build_plan=True)
        r1 = gnn_forward(spec_seg, params, bn, gb_plain, jax.random.key(1))
        r2 = gnn_forward(spec_pal, params, bn, gb_plan, jax.random.key(1))
        assert float(r1["iters"]) == float(r2["iters"])
        assert np.allclose(np.asarray(r1["state"])[:n], np.asarray(r2["state"])[:n],
                           atol=1e-3)


class TestBlockDense:
    """Block-dense adjacency batches (graph-aligned packing)."""

    def test_edge_focus_matches_standard_path(self, rng):
        """Edge-focused blocked batches (round 2): per-arc supervision rides
        the dst-sorted edge arrays; outputs must equal the from_graph path on
        the selected target rows."""
        from gnn_tpu.graphs.graph import Graph
        from gnn_tpu.graphs.batch import GraphBatch, from_graphs_blocked
        from gnn_tpu.graphs.datasets import random_graph
        from gnn_tpu.models.core import GNNSpec, gnn_init, gnn_forward
        gs = [random_graph(int(rng.integers(10, 40)), 3, 1, 2, 0.5, focus="a", rng=rng)
              for _ in range(8)]
        gs.insert(1, random_graph(200, 3, 1, 2, 0.15, focus="a", rng=rng))  # spans blocks
        merged = Graph.merge(gs, focus="a", aggregation_mode="average")
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=7, units=(2,), activations="softmax",
                      batch_normalization=False)
        spec = GNNSpec(focus="a", state_spec=ss, output_spec=os_,
                       max_iteration=4, threshold=0.01, aggregation="segment")
        params, bn = gnn_init(spec, jax.random.key(0))
        gb_ref = GraphBatch.from_graph(merged)
        gb_blk = from_graphs_blocked(gs, block_w=64, focus="a")
        r1 = gnn_forward(spec, params, bn, gb_ref, jax.random.key(1))
        r2 = gnn_forward(spec, params, bn, gb_blk, jax.random.key(1))
        assert float(r1["iters"]) == float(r2["iters"])
        s1 = np.asarray(gb_ref.sel_mask)
        s2 = np.asarray(gb_blk.sel_mask)
        assert s1.sum() == s2.sum() > 0
        np.testing.assert_allclose(np.asarray(r2["out"])[s2],
                                   np.asarray(r1["out"])[s1], atol=1e-4)

    def test_matches_standard_path(self, rng):
        from gnn_tpu.graphs.graph import Graph
        from gnn_tpu.graphs.batch import GraphBatch, from_graphs_blocked
        from gnn_tpu.graphs.datasets import random_graph
        from gnn_tpu.models.core import GNNSpec, gnn_init, gnn_forward
        gs = [random_graph(int(rng.integers(10, 40)), 3, 1, 2, 0.5, focus="g", rng=rng)
              for _ in range(15)]
        gs.insert(2, random_graph(200, 3, 1, 2, 0.2, focus="g", rng=rng))  # spans blocks
        merged = Graph.merge(gs, focus="g", aggregation_mode="average")
        gb_std = GraphBatch.from_graph(merged)
        gb_blk = from_graphs_blocked(gs, block_w=128)
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh", batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax", batch_normalization=False)
        spec = GNNSpec(focus="g", state_spec=ss, output_spec=os_, max_iteration=4,
                       threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        r1 = gnn_forward(spec, params, bn, gb_std, jax.random.key(1))
        r2 = gnn_forward(spec, params, bn, gb_blk, jax.random.key(1))
        G = len(gs)
        assert float(r1["iters"]) == float(r2["iters"])
        assert np.allclose(np.asarray(r1["out"])[:G], np.asarray(r2["out"])[:G], atol=1e-4)

    def test_training_through_blocked(self, rng):
        from gnn_tpu.graphs.batch import from_graphs_blocked
        from gnn_tpu.graphs.datasets import random_graph
        from gnn_tpu.models.core import GNNSpec, gnn_init, make_train_step
        from gnn_tpu.training.optimizers import make_optimizer, optimizer_config
        gs = [random_graph(15, 3, 1, 2, 0.5, focus="n", rng=rng) for _ in range(8)]
        gb = from_graphs_blocked(gs, block_w=128)
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh", batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax", batch_normalization=False)
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_, max_iteration=4,
                       threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        cfg = optimizer_config("adam", learning_rate=1e-2)
        step = make_train_step(spec, "mse", None, cfg)
        o = make_optimizer(cfg).init(params)
        p, b = params, bn
        for i in range(10):
            p, b, o, _ = step(p, b, o, gb, jax.random.key(i))
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(p))

    def test_agg_caches_match_recompute(self, rng):
        """Batches built with caches equal batches with caches stripped."""
        from gnn_tpu.graphs.datasets import random_graph
        from gnn_tpu.graphs.batch import GraphBatch
        from gnn_tpu.models.core import GNNSpec, gnn_init, gnn_forward
        g = random_graph(40, 3, 2, 2, 0.4, focus="n", rng=rng)
        gb = GraphBatch.from_graph(g)
        gb_nocache = gb.replace(agg_arcs_cache=None, agg_nodes_cache=None)
        ss = MLPSpec(input_dim=2 + 2 * 3, units=(3,), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_, max_iteration=3,
                       threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        r1 = gnn_forward(spec, params, bn, gb, jax.random.key(1))
        r2 = gnn_forward(spec, params, bn, gb_nocache, jax.random.key(1))
        assert np.allclose(np.asarray(r1["state"]), np.asarray(r2["state"]), atol=1e-5)


class TestLowPrecisionAdjacency:
    def test_bf16_adj_close_to_f32(self, rng):
        """adj_dtype=bfloat16 forward stays within bf16 rounding of f32."""
        import jax.numpy as jnp
        from gnn_tpu.graphs.batch import from_graphs_blocked
        from gnn_tpu.graphs.datasets import random_graph
        from gnn_tpu.models.core import GNNSpec, gnn_forward, gnn_init
        from gnn_tpu.ops.mlp import MLPSpec
        gs = [random_graph(int(rng.integers(10, 25)), 3, 1, 2, 0.4, focus="g",
                           rng=rng) for _ in range(6)]
        gb32 = from_graphs_blocked(gs, block_w=64)
        gb16 = from_graphs_blocked(gs, block_w=64, adj_dtype=jnp.bfloat16)
        assert gb16.adj_blocks.dtype == jnp.bfloat16
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        spec = GNNSpec(focus="g", state_spec=ss, output_spec=os_,
                       max_iteration=5, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        r32 = gnn_forward(spec, params, bn, gb32, jax.random.key(1))
        r16 = gnn_forward(spec, params, bn, gb16, jax.random.key(1))
        assert r16["state"].dtype == r32["state"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(r16["out"])[:6],
                                   np.asarray(r32["out"])[:6], atol=2e-2)
