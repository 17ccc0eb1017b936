"""Core model tests: the masked-scan fixed-point loop must match a plain numpy
implementation of the reference semantics (GNN.py:202-280) step for step —
state trajectory, dynamic iteration count, readouts, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.graphs.graph import Graph
from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.ops.mlp import MLPSpec
from gnn_tpu.models.core import (GNNSpec, gnn_init, gnn_forward, evaluate_single,
                                 make_train_step, make_eval_step)
from gnn_tpu.training.optimizers import optimizer_config, make_optimizer


def make_graph(rng, n=25, e=100, nl=3, al=2, dt=2, focus="n", agg="average"):
    nodes = rng.standard_normal((n, nl)).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    arcs = np.concatenate([src[:, None], dst[:, None],
                           rng.standard_normal((e, al)).astype(np.float32)], axis=1)
    tn = {"n": n, "a": e, "g": 1}[focus]
    targets = np.eye(dt, dtype=np.float32)[rng.integers(0, dt, tn)]
    return Graph(arcs=arcs, nodes=nodes, targets=targets, focus=focus, aggregation_mode=agg)


def plain_spec(nl, al, dt, focus, ds=0, hidden=()):
    """Deterministic MLPs: no dropout, no batchnorm — for numpy parity."""
    in_s = al + 2 * (nl + ds)
    state = MLPSpec(input_dim=in_s, units=tuple(hidden) + (ds if ds else nl,),
                    activations="tanh", kernel_initializer="glorot_normal",
                    bias_initializer="glorot_normal", batch_normalization=False)
    in_o = {"n": nl + ds, "g": nl + ds, "a": 2 * (nl + ds) + al}[focus]
    out = MLPSpec(input_dim=in_o, units=(dt,), activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal",
                  batch_normalization=False)
    return state, out


def numpy_forward(params, g: Graph, spec: GNNSpec):
    """Reference semantics in numpy: dynamic while loop (GNN.py:202-280),
    state_dim == 0 (state = labels)."""
    n = g.n_nodes
    w = g.edge_weights().astype(np.float64)
    src, dst = g.src, g.dst

    def agg_edges(vals_per_edge):
        out = np.zeros((n, vals_per_edge.shape[1]))
        np.add.at(out, dst, w[:, None] * vals_per_edge)
        return out

    def agg(vals_per_node):
        return agg_edges(vals_per_node[src])

    def mlp(p, x, acts):
        h = x
        for i, a in enumerate(acts):
            d = p[f"dense_{i}"]
            h = h @ np.asarray(d["w"], np.float64) + np.asarray(d["b"], np.float64)
            if a == "tanh":
                h = np.tanh(h)
            elif a == "softmax":
                h = np.exp(h - h.max(1, keepdims=True))
                h = h / h.sum(1, keepdims=True)
        return h

    agg_arcs = agg_edges(g.arc_labels.astype(np.float64))
    state = g.nodes.astype(np.float64)
    state_old = np.ones_like(state)
    k = 0
    while True:
        dist = np.sqrt(((state - state_old) ** 2).sum(1))
        norm = np.sqrt((state_old ** 2).sum(1))
        if not ((dist > spec.threshold * norm).any() and k < spec.max_iteration):
            break
        inp = np.concatenate([state, agg(state), agg_arcs], axis=1)
        state_old, state = state, mlp(params["state"], inp, spec.state_spec.activations)
        k += 1
    out = mlp(params["output"], state, spec.output_spec.activations)
    return k, state, out


class TestLoopParity:
    @pytest.mark.parametrize("agg", ["average", "normalized", "sum"])
    @pytest.mark.parametrize("max_iter", [1, 3, 5])
    def test_state_trajectory_matches_numpy(self, rng, agg, max_iter):
        g = make_graph(rng, agg=agg)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=max_iter, threshold=0.01, aggregation="segment")
        params, bn = gnn_init(spec, jax.random.key(0))
        res = gnn_forward(spec, params, bn, GraphBatch.from_graph(g),
                          jax.random.key(1), training=False)
        k_ref, state_ref, out_ref = numpy_forward(
            jax.tree_util.tree_map(np.asarray, params), g, spec)
        n = g.n_nodes
        assert float(res["iters"]) == k_ref
        assert np.allclose(np.asarray(res["state"])[:n], state_ref, atol=1e-4)
        assert np.allclose(np.asarray(res["out_entity"])[:n], out_ref, atol=1e-4)

    def test_dynamic_stop_freezes_state(self, rng):
        """With a huge threshold the loop must stop immediately (k == 0) and
        the state must remain the initial labels — identity tail steps."""
        g = make_graph(rng)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=5, threshold=1e6)
        params, bn = gnn_init(spec, jax.random.key(0))
        res = gnn_forward(spec, params, bn, GraphBatch.from_graph(g),
                          jax.random.key(1))
        assert float(res["iters"]) == 0.0
        assert np.allclose(np.asarray(res["state"])[:g.n_nodes], g.nodes, atol=1e-6)

    def test_gradients_match_unrolled_loop(self, rng):
        """Reverse-mode grads through the masked scan == grads through a python
        loop unrolled exactly k times (what tf.GradientTape saw)."""
        g = make_graph(rng, n=12, e=40)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=4, threshold=0.01, aggregation="segment")
        params, bn = gnn_init(spec, jax.random.key(0))
        gb = GraphBatch.from_graph(g)

        def loss_scan(p):
            res = gnn_forward(spec, p, bn, gb, jax.random.key(1))
            return jnp.sum(res["out"] * gb.sel_mask[:, None]), res["iters"]

        (l1, iters), g1 = jax.value_and_grad(loss_scan, has_aux=True)(params)
        k = int(iters)
        assert k >= 1

        from gnn_tpu.ops.mlp import mlp_apply
        from gnn_tpu.ops.aggregate import aggregate_to_nodes

        def loss_unrolled(p):
            Np = gb.n_node_pad
            agg_arcs = aggregate_to_nodes(gb.arc_labels, gb.edge_w, gb.dst, Np)
            state = gb.nodes
            for _ in range(k):
                inp = jnp.concatenate(
                    [state, aggregate_to_nodes(jnp.take(state, gb.src, axis=0),
                                               gb.edge_w, gb.dst, Np), agg_arcs], axis=1)
                state, _ = mlp_apply(spec.state_spec, p["state"], bn["state"], inp)
            out, _ = mlp_apply(spec.output_spec, p["output"], bn["output"], state)
            rows = jnp.take(out, gb.out_index, axis=0)
            return jnp.sum(rows * gb.sel_mask[:, None])

        l2, g2 = jax.value_and_grad(loss_unrolled)(params)
        assert np.allclose(float(l1), float(l2), atol=1e-5)
        for (p1, a), (p2, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                                    jax.tree_util.tree_leaves_with_path(g2)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), p1


class TestFocuses:
    def test_edge_focus_readout(self, rng):
        g = make_graph(rng, focus="a")
        ss, os_ = plain_spec(3, 2, 2, "a")
        spec = GNNSpec(focus="a", state_spec=ss, output_spec=os_,
                       max_iteration=3, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        gb = GraphBatch.from_graph(g, sort_edges=False)
        res = gnn_forward(spec, params, bn, gb, jax.random.key(1))
        # edge readout rows: mlp([state_src, state_dst, arc_label])
        state = np.asarray(res["state"])
        e0 = 5
        inp = np.concatenate([state[g.src[e0]], state[g.dst[e0]], g.arc_labels[e0]])
        from gnn_tpu.ops.mlp import mlp_apply
        expect, _ = mlp_apply(spec.output_spec, params["output"], bn["output"],
                              jnp.asarray(inp[None]))
        assert np.allclose(np.asarray(res["out_entity"])[e0], np.asarray(expect)[0], atol=1e-5)
        assert res["out"].shape[0] == gb.n_target_pad

    def test_graph_focus_pooled_readout(self, rng):
        gs = [make_graph(rng, n=8, e=24, focus="g") for _ in range(3)]
        m = Graph.merge(gs, focus="g", aggregation_mode="average")
        ss, os_ = plain_spec(3, 2, 2, "g")
        spec = GNNSpec(focus="g", state_spec=ss, output_spec=os_,
                       max_iteration=3, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        gb = GraphBatch.from_graph(m)
        res = gnn_forward(spec, params, bn, gb, jax.random.key(1))
        # pooled row g == mean of that graph's node outputs (GNN.py:318-333)
        oe = np.asarray(res["out_entity"])
        gid = m.graph_ids()
        for gi in range(3):
            expect = oe[:m.n_nodes][gid == gi].mean(0)
            assert np.allclose(np.asarray(res["out"])[gi], expect, atol=1e-5)

    def test_state_dim_nonzero(self, rng):
        g = make_graph(rng)
        ds = 4
        in_s = 2 + 2 * (3 + ds)
        ss = MLPSpec(input_dim=in_s, units=(ds,), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=3 + ds, units=(2,), activations="softmax",
                      batch_normalization=False)
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_, state_dim=ds,
                       max_iteration=3, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        res = gnn_forward(spec, params, bn, GraphBatch.from_graph(g), jax.random.key(1))
        assert res["state"].shape[1] == ds
        assert np.isfinite(np.asarray(res["out"])).all()


class TestTraining:
    def test_loss_decreases(self, rng):
        g = make_graph(rng, n=60, e=300)
        # learnable targets: class = sign of first node feature
        t = np.zeros((60, 2), np.float32)
        t[np.arange(60), (g.nodes[:, 0] > 0).astype(int)] = 1
        g.targets = t
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=5, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        gb = GraphBatch.from_graph(g)
        opt_cfg = optimizer_config("adam", learning_rate=1e-2)
        opt = make_optimizer(opt_cfg)
        o = opt.init(params)
        step = make_train_step(spec, "categorical_crossentropy", {"from_logits": False},
                               opt_cfg, mean=True)
        ev = make_eval_step(spec, "categorical_crossentropy", {"from_logits": False})
        _, l0, *_ = ev(params, bn, gb, jax.random.key(9))
        p, b = params, bn
        for i in range(60):
            p, b, o, _ = step(p, b, o, gb, jax.random.key(100 + i))
        _, l1, *_ = ev(p, b, gb, jax.random.key(9))
        assert float(l1) < 0.7 * float(l0)

    def test_train_loop_matches_sequential_steps(self, rng):
        """make_train_loop(n_steps=N) == N make_train_step calls with
        split(rng, N) keys — one device dispatch, identical trajectory."""
        from gnn_tpu.models.core import make_train_loop
        g = make_graph(rng, n=40, e=160)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=4, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        gb = GraphBatch.from_graph(g)
        cfg = optimizer_config("adam", learning_rate=1e-2)
        opt = make_optimizer(cfg)
        o0 = opt.init(params)
        step = make_train_step(spec, "mse", None, cfg, mean=True)
        loop = make_train_loop(spec, "mse", None, cfg, mean=True, n_steps=4)
        base = jax.random.key(7)
        pl_, bl, ol, its = loop(params, bn, o0, gb, base)
        assert its.shape == (4,)
        p, b, o = params, bn, o0
        for r in jax.random.split(base, 4):
            p, b, o, it = step(p, b, o, gb, r)
        for a, c in zip(jax.tree_util.tree_leaves((pl_, bl, ol)),
                        jax.tree_util.tree_leaves((p, b, o))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-6, atol=1e-7)

    def test_mean_flag_divides_state_grads(self, rng):
        """mean=True divides state-net updates by iteration count
        (GNN_BaseClass.py:239-241) — verify via SGD single step."""
        g = make_graph(rng, n=20, e=80)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=5, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        gb = GraphBatch.from_graph(g)
        cfg = optimizer_config("sgd", learning_rate=1.0)
        opt = make_optimizer(cfg)
        o = opt.init(params)
        rngk = jax.random.key(5)
        s_mean = make_train_step(spec, "mse", None, cfg, mean=True)
        s_sum = make_train_step(spec, "mse", None, cfg, mean=False)
        pm, _, _, it = s_mean(params, bn, o, gb, rngk)
        ps, _, _, _ = s_sum(params, bn, o, gb, rngk)
        k = float(it)
        assert k > 1
        dw_mean = np.asarray(pm["state"]["dense_0"]["w"] - params["state"]["dense_0"]["w"])
        dw_sum = np.asarray(ps["state"]["dense_0"]["w"] - params["state"]["dense_0"]["w"])
        assert np.allclose(dw_sum, dw_mean * k, rtol=1e-4, atol=1e-6)
        # output-net grads are NOT divided
        do_mean = np.asarray(pm["output"]["dense_0"]["w"] - params["output"]["dense_0"]["w"])
        do_sum = np.asarray(ps["output"]["dense_0"]["w"] - params["output"]["dense_0"]["w"])
        assert np.allclose(do_sum, do_mean, rtol=1e-5, atol=1e-7)

    def test_padding_invariance(self, rng):
        """Same graph, different pad sizes -> identical outputs."""
        g = make_graph(rng, n=20, e=80)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=5, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        r1 = gnn_forward(spec, params, bn, GraphBatch.from_graph(g, node_pad=128, edge_pad=128, target_pad=128),
                         jax.random.key(1))
        r2 = gnn_forward(spec, params, bn, GraphBatch.from_graph(g, node_pad=256, edge_pad=512, target_pad=256),
                         jax.random.key(1))
        assert float(r1["iters"]) == float(r2["iters"])
        assert np.allclose(np.asarray(r1["state"])[:20], np.asarray(r2["state"])[:20], atol=1e-5)
        assert np.allclose(np.asarray(r1["out"])[:20], np.asarray(r2["out"])[:20], atol=1e-5)


class TestEdgeSorting:
    """sort_edges=True must be semantically transparent (target-aligned rows
    identical) for every focus."""

    @pytest.mark.parametrize("focus", ["n", "a", "g"])
    def test_sorted_vs_unsorted_identical(self, rng, focus):
        g = make_graph(rng, n=20, e=70, focus=focus)
        ss, os_ = plain_spec(3, 2, 2, focus)
        spec = GNNSpec(focus=focus, state_spec=ss, output_spec=os_,
                       max_iteration=4, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))
        r_u = gnn_forward(spec, params, bn,
                          GraphBatch.from_graph(g, sort_edges=False), jax.random.key(1))
        r_s = gnn_forward(spec, params, bn,
                          GraphBatch.from_graph(g, sort_edges=True), jax.random.key(1))
        assert float(r_u["iters"]) == float(r_s["iters"])
        t = g.targets.shape[0]  # padding rows are sel_mask-ed out of the loss
        assert np.allclose(np.asarray(r_u["out"])[:t], np.asarray(r_s["out"])[:t],
                           atol=1e-5)

    def test_sorted_dst_nondecreasing(self, rng):
        g = make_graph(rng, n=20, e=70)
        gb = GraphBatch.from_graph(g, sort_edges=True)
        d = np.asarray(gb.dst)
        assert (np.diff(d) >= 0).all()


class TestBfloat16:
    def test_bf16_forward_and_train(self, rng):
        """bfloat16 batches + params run end-to-end and stay finite."""
        import jax.numpy as jnp
        from gnn_tpu.models.core import make_train_step
        from gnn_tpu.training.optimizers import make_optimizer, optimizer_config
        g = make_graph(rng, n=30, e=120)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=3, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0), dtype=jnp.bfloat16)
        gb = GraphBatch.from_graph(g, dtype=jnp.bfloat16)
        res = gnn_forward(spec, params, bn, gb, jax.random.key(1))
        assert res["state"].dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(res["out"], dtype=np.float32)).all()
        cfg = optimizer_config("sgd", learning_rate=1e-2)
        step = make_train_step(spec, "mse", None, cfg)
        o = make_optimizer(cfg).init(params)
        p, b, o, _ = step(params, bn, o, gb, jax.random.key(2))
        assert all(np.isfinite(np.asarray(x, dtype=np.float32)).all()
                   for x in jax.tree_util.tree_leaves(p))

    def test_mixed_precision_bf16_state_f32_params(self, rng):
        """bf16 graph data with f32 master params: the MLP promotes to f32;
        the scan carry must stay bf16 (propagate casts back)."""
        import jax.numpy as jnp
        from gnn_tpu.models.core import make_train_step
        from gnn_tpu.training.optimizers import make_optimizer, optimizer_config
        g = make_graph(rng, n=30, e=120)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=3, threshold=0.01)
        params, bn = gnn_init(spec, jax.random.key(0))          # f32 params
        gb = GraphBatch.from_graph(g, dtype=jnp.bfloat16)       # bf16 data
        res = gnn_forward(spec, params, bn, gb, jax.random.key(1))
        assert res["state"].dtype == jnp.bfloat16
        cfg = optimizer_config("sgd", learning_rate=1e-2)
        step = make_train_step(spec, "mse", None, cfg)
        o = make_optimizer(cfg).init(params)
        p, _, _, _ = step(params, bn, o, gb, jax.random.key(2))
        leaves = jax.tree_util.tree_leaves(p)
        assert all(x.dtype == jnp.float32 for x in leaves)      # master stays f32
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


class TestIFTGradients:
    """Implicit-function-theorem grad mode (models/ift.py): O(1)-memory
    adjoint equals the unrolled gradient at a converged fixed point."""

    def test_ift_matches_unrolled_at_convergence(self, rng):
        import dataclasses
        n, e = 30, 120
        nodes = 0.3 * rng.standard_normal((n, 3)).astype(np.float32)
        arcs = np.concatenate([rng.integers(0, n, (e, 1)), rng.integers(0, n, (e, 1)),
                               0.3 * rng.standard_normal((e, 1)).astype(np.float32)], axis=1)
        t = np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)]
        g = Graph(arcs=arcs, nodes=nodes, targets=t, focus="n",
                  aggregation_mode="average")
        gb = GraphBatch.from_graph(g)
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh",
                     kernel_initializer="random_normal", bias_initializer="zeros",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        spec_u = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                         max_iteration=60, threshold=1e-7, aggregation="segment")
        spec_i = dataclasses.replace(spec_u, grad_mode="ift", ift_backward_iters=60)
        params, bn = gnn_init(spec_u, jax.random.key(0))
        params = jax.tree_util.tree_map(lambda x: 0.3 * x, params)  # contractive

        from gnn_tpu.models.core import evaluate_single

        def grads(spec):
            def f(p):
                it, loss, _ = evaluate_single(spec, p, bn, gb, jax.random.key(1),
                                              "mse", {}, training=False)
                return loss
            return jax.grad(f)(params)

        g_u, g_i = grads(spec_u), grads(spec_i)
        for a, b in zip(jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_i)):
            denom = float(jnp.max(jnp.abs(a))) + 1e-8
            assert float(jnp.max(jnp.abs(a - b))) / denom < 5e-3

    def test_ift_rejects_state_dropout(self):
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh",
                     dropout_rate=(0.1,), dropout_pos=(0,), batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        with pytest.raises(ValueError):
            GNNSpec(focus="n", state_spec=ss, output_spec=os_, grad_mode="ift")


class TestDimValidation:
    """check_dims: misconfigured specs fail at trace time with actionable
    messages (not broadcast errors inside the scan)."""

    def _spec(self, state_units, out_units, out_in=3, state_in=8, focus="n"):
        ss = MLPSpec(input_dim=state_in, units=state_units, activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=out_in, units=out_units, activations="softmax",
                      batch_normalization=False)
        return GNNSpec(focus=focus, state_spec=ss, output_spec=os_,
                       max_iteration=3, threshold=0.01)

    def test_messages_name_the_mismatch(self, rng):
        g = make_graph(rng, n=20, e=60)      # nl=3, al=2, dt=2
        gb = GraphBatch.from_graph(g)
        cases = [
            (self._spec((4, 4), (2,)), "state net output dim"),
            (self._spec((4, 3), (2,), state_in=9), "state net input_dim"),
            (self._spec((4, 3), (2,), out_in=5), "output net input_dim"),
            (self._spec((4, 3), (3,)), "output net output dim"),
        ]
        for spec, fragment in cases:
            params, bn = gnn_init(spec, jax.random.key(0))
            with pytest.raises(ValueError, match=fragment):
                gnn_forward(spec, params, bn, gb, jax.random.key(1))

    def test_valid_spec_passes(self, rng):
        g = make_graph(rng, n=20, e=60)
        gb = GraphBatch.from_graph(g)
        spec = self._spec((4, 3), (2,))
        params, bn = gnn_init(spec, jax.random.key(0))
        gnn_forward(spec, params, bn, gb, jax.random.key(1))


class TestMixedStatePrecision:
    """GNNSpec(state_dtype='bfloat16'): the propagation carry runs bf16 while
    labels, params and readout stay f32 — the LGNN-safe mixed mode (layer
    augmentation receives unquantised f32 values)."""

    def test_bf16_state_close_to_f32_and_outputs_f32(self, rng):
        import dataclasses
        g = make_graph(rng, n=40, e=160)
        gb = GraphBatch.from_graph(g)
        ss, os_ = plain_spec(3, 2, 2, "n")
        spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                       max_iteration=4, threshold=0.01, aggregation="segment")
        mixed = dataclasses.replace(spec, state_dtype="bfloat16")
        params, bn = gnn_init(spec, jax.random.key(0))
        r32 = gnn_forward(spec, params, bn, gb, jax.random.key(1))
        rmx = gnn_forward(mixed, params, bn, gb, jax.random.key(1))
        assert rmx["state"].dtype == jnp.bfloat16
        assert rmx["out"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(rmx["state"], np.float32),
                                   np.asarray(r32["state"]), atol=0.05)
        # grads flow and stay finite through the mixed carry
        def loss(p):
            r = gnn_forward(mixed, p, bn, gb, jax.random.key(1), training=True)
            return jnp.sum(r["out"] ** 2)
        grads = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(grads))

    def test_lgnn_augmentation_stays_f32(self, rng, tmp_path):
        """The augmented labels written by update_graph must be f32 even when
        every layer carries a bf16 state."""
        from gnn_tpu.models.lgnn import LGNN
        from gnn_tpu.models.gnn import GNNnodeBased
        from gnn_tpu.ops.mlp import get_inout_dims
        layers = []
        for L in range(2):
            ins, us = get_inout_dims("state", 3, 2, 2, "n", 0, None, layer=L,
                                     get_state=True, get_output=False)
            ino, uo = get_inout_dims("output", 3, 2, 2, "n", 0, None, layer=L,
                                     get_state=True, get_output=False)
            layers.append(GNNnodeBased(
                MLPSpec(input_dim=ins, units=tuple(us), activations="tanh",
                        batch_normalization=False),
                MLPSpec(input_dim=ino, units=tuple(uo), activations="softmax",
                        batch_normalization=False),
                max_iteration=3, state_dtype="bfloat16",
                loss_function="categorical_crossentropy",
                path_writer=str(tmp_path / "w") + "/"))
        lgnn = LGNN(layers, get_state=True, get_output=False,
                    path_writer=str(tmp_path / "wl") + "/")
        g = make_graph(rng, n=30, e=120)
        batch = GraphBatch.from_graph(g)
        lgnn.train(batch, epochs=2, update_freq=1, training_mode="serial",
                   verbose=0)
        out = lgnn(batch)
        assert np.isfinite(out).all()
