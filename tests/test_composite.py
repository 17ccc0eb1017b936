"""Composite (heterogeneous) GNN tests: per-type state nets must reduce to
the homogeneous model when all types share weights, and match a numpy
reference when they differ (models/composite.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.models.composite import (CompositeGNNSpec, composite_forward,
                                      composite_init, make_composite_train_step)
from gnn_tpu.models.core import GNNSpec, gnn_forward, gnn_init
from gnn_tpu.ops.mlp import MLPSpec
from gnn_tpu.training.optimizers import make_optimizer, optimizer_config


def het_graph(rng, n=24, e=90, nl=3, al=2, dt=2, n_types=2, focus="n"):
    nodes = rng.standard_normal((n, nl)).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    arcs = np.concatenate([src[:, None], dst[:, None],
                           rng.standard_normal((e, al)).astype(np.float32)], axis=1)
    tn = {"n": n, "a": e, "g": 1}[focus]
    targets = np.eye(dt, dtype=np.float32)[rng.integers(0, dt, tn)]
    types = rng.integers(0, n_types, n).astype(np.int32)
    return Graph(arcs=arcs, nodes=nodes, targets=targets, focus=focus,
                 aggregation_mode="average", node_types=types)


def specs(nl=3, al=2, dt=2, focus="n"):
    ss = MLPSpec(input_dim=2 * nl + al, units=(nl,), activations="tanh",
                 kernel_initializer="glorot_normal",
                 bias_initializer="glorot_normal", batch_normalization=False)
    os_ = MLPSpec(input_dim=nl, units=(dt,), activations="softmax",
                  kernel_initializer="glorot_normal",
                  bias_initializer="glorot_normal", batch_normalization=False)
    return ss, os_


class TestCompositeReduction:
    def test_shared_weights_equal_homogeneous(self, rng):
        """All types using IDENTICAL weights must reproduce the homogeneous
        model bit-for-bit (type masks partition the rows)."""
        g = het_graph(rng, n_types=3)
        gb = GraphBatch.from_graph(g)
        ss, os_ = specs()
        hspec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                        max_iteration=4, threshold=0.01, aggregation="segment")
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss, ss),
                                 output_spec=os_, max_iteration=4,
                                 threshold=0.01, aggregation="segment")
        hp, hb = gnn_init(hspec, jax.random.key(0))
        cp = {"state": (hp["state"],) * 3, "output": hp["output"]}
        cb = {"state": (hb["state"],) * 3, "output": hb["output"]}
        hr = gnn_forward(hspec, hp, hb, gb, jax.random.key(1))
        cr = composite_forward(cspec, cp, cb, gb, jax.random.key(1))
        assert float(hr["iters"]) == float(cr["iters"])
        np.testing.assert_allclose(np.asarray(hr["state"]),
                                   np.asarray(cr["state"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(hr["out"]),
                                   np.asarray(cr["out"]), atol=1e-6)


class TestCompositeNumpyParity:
    def test_two_type_step_matches_numpy(self, rng):
        """One propagation step with DISTINCT per-type nets vs numpy."""
        g = het_graph(rng, n=15, e=50, n_types=2)
        gb = GraphBatch.from_graph(g, sort_edges=False)
        ss, os_ = specs()
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss), output_spec=os_,
                                 max_iteration=1, threshold=0.01,
                                 aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(3))
        res = composite_forward(cspec, params, bn, gb, jax.random.key(1))

        n = g.n_nodes
        w = g.edge_weights().astype(np.float64)
        agg = np.zeros((n, 3))
        np.add.at(agg, g.dst, w[:, None] * g.nodes[g.src].astype(np.float64))
        agg_a = np.zeros((n, 2))
        np.add.at(agg_a, g.dst, w[:, None] * g.arc_labels.astype(np.float64))
        inp = np.concatenate([g.nodes, agg, agg_a], axis=1)

        def dense(p, x):
            d = p["dense_0"]
            return np.tanh(x @ np.asarray(d["w"], np.float64)
                           + np.asarray(d["b"], np.float64))

        s0 = dense(params["state"][0], inp)
        s1 = dense(params["state"][1], inp)
        expect = np.where(g.node_types[:, None] == 0, s0, s1)
        np.testing.assert_allclose(np.asarray(res["state"])[:n], expect,
                                   atol=1e-5)

    def test_type_isolation(self, rng):
        """Perturbing type-1's net must leave the FIRST-step states of type-0
        nodes unchanged (propagation mixes later steps)."""
        g = het_graph(rng, n=20, e=60, n_types=2)
        gb = GraphBatch.from_graph(g)
        ss, os_ = specs()
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss), output_spec=os_,
                                 max_iteration=1, threshold=0.01,
                                 aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(0))
        r1 = composite_forward(cspec, params, bn, gb, jax.random.key(1))
        p2 = {**params, "state": (
            params["state"][0],
            jax.tree_util.tree_map(lambda x: x + 0.5, params["state"][1]))}
        r2 = composite_forward(cspec, p2, bn, gb, jax.random.key(1))
        t0 = np.asarray(gb.node_types) == 0
        t0[g.n_nodes:] = False
        s1, s2 = np.asarray(r1["state"]), np.asarray(r2["state"])
        np.testing.assert_allclose(s1[t0], s2[t0], atol=1e-6)
        assert not np.allclose(s1[~t0][: int((~t0).sum()) - (len(t0) - g.n_nodes)],
                               s2[:g.n_nodes][np.asarray(gb.node_types)[:g.n_nodes] == 1])


class TestCompositeTraining:
    @pytest.mark.parametrize("focus", ["n", "g"])
    def test_trains_and_learns(self, rng, focus):
        if focus == "g":
            gs = [het_graph(rng, n=10 + i, e=30, focus="g") for i in range(6)]
            g = Graph.merge(gs, focus="g", aggregation_mode="average")
        else:
            g = het_graph(rng, n=40, e=160)
        gb = GraphBatch.from_graph(g)
        ss, os_ = specs(focus=focus)
        cspec = CompositeGNNSpec(focus=focus, state_specs=(ss, ss),
                                 output_spec=os_, max_iteration=3,
                                 threshold=0.01, aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(0))
        cfg = optimizer_config("adam", learning_rate=5e-3)
        step = make_composite_train_step(cspec, "categorical_crossentropy",
                                         {"from_logits": False}, cfg)
        o = make_optimizer(cfg).init(params)
        from gnn_tpu.models.composite import make_composite_eval_step
        ev = make_composite_eval_step(cspec, "categorical_crossentropy",
                                      {"from_logits": False})
        _, l0, _ = ev(params, bn, gb, jax.random.key(9))
        for i in range(40):
            params, bn, o, iters = step(params, bn, o, gb, jax.random.key(i))
        _, l1, _ = ev(params, bn, gb, jax.random.key(9))
        assert float(iters) > 0
        assert np.isfinite(float(l1))
        assert float(l1) < float(l0)

    def test_missing_node_types_raises(self, rng):
        g = het_graph(rng)
        g.node_types = None
        gb = GraphBatch.from_graph(g)
        ss, os_ = specs()
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss), output_spec=os_)
        params, bn = composite_init(cspec, jax.random.key(0))
        with pytest.raises(ValueError, match="node_types"):
            composite_forward(cspec, params, bn, gb, jax.random.key(1))

    def test_mismatched_state_dims_rejected(self):
        ss1 = MLPSpec(input_dim=8, units=(3,), activations="tanh",
                      batch_normalization=False)
        ss2 = MLPSpec(input_dim=8, units=(4,), activations="tanh",
                      batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        with pytest.raises(ValueError, match="share"):
            CompositeGNNSpec(focus="n", state_specs=(ss1, ss2), output_spec=os_)


class TestCompositeModelClass:
    """CompositeGNNnodeBased: full engine integration — train/early-stop,
    Loop/__call__, copy, save/load round trip."""

    def _model(self, tmp_path=None):
        from gnn_tpu import CompositeGNNnodeBased
        ss, os_ = specs()
        return CompositeGNNnodeBased(
            net_states=(ss, ss), net_output=os_,
            optimizer={"name": "adam", "kwargs": {"learning_rate": 5e-3}},
            loss_function="categorical_crossentropy",
            loss_arguments={"from_logits": False},
            max_iteration=3, threshold=0.01,
            path_writer=str(tmp_path) + "/w/" if tmp_path else "writer/tc/",
            seed=0)

    def test_train_loop_call(self, rng, tmp_path):
        g = het_graph(rng, n=60, e=240)
        m = self._model(tmp_path)
        m.train([g], epochs=15, update_freq=5, verbose=0)
        out = m(g)
        assert out.shape == (60, 2)
        assert np.isfinite(out).all()
        res = m.test(Graph.merge([het_graph(rng, n=30, e=90)], focus="n"))
        assert np.isfinite(res["Loss"])

    def test_save_load_copy_roundtrip(self, rng, tmp_path):
        g = het_graph(rng, n=40, e=120)
        m = self._model(tmp_path)
        m.train([g], epochs=5, update_freq=5, verbose=0)
        o1 = m(g)
        m.save(str(tmp_path / "model"))
        from gnn_tpu import CompositeGNNnodeBased
        m2 = CompositeGNNnodeBased.load(str(tmp_path / "model"))
        np.testing.assert_allclose(np.asarray(m2(g)), np.asarray(o1), atol=1e-6)
        m3 = m.copy(copy_weights=True)
        np.testing.assert_allclose(np.asarray(m3(g)), np.asarray(o1), atol=1e-6)
        assert m2.spec.n_types == 2


class TestCompositeBlocked:
    def test_blocked_batch_carries_types_and_trains(self, rng):
        """Composite propagation over the block-dense production path must
        match the segment path exactly (same graphs, same weights)."""
        from gnn_tpu.graphs.batch import from_graphs_blocked
        gs = [het_graph(rng, n=12 + i, e=40, focus="g") for i in range(5)]
        gbb = from_graphs_blocked(gs, block_w=64)
        assert gbb.node_types is not None
        merged = Graph.merge(gs, focus="g", aggregation_mode="average")
        gbs = GraphBatch.from_graph(merged)
        ss, os_ = specs(focus="g")
        cb_spec = CompositeGNNSpec(focus="g", state_specs=(ss, ss),
                                   output_spec=os_, max_iteration=3,
                                   threshold=0.01)
        params, bn = composite_init(cb_spec, jax.random.key(0))
        rb = composite_forward(cb_spec, params, bn, gbb, jax.random.key(1))
        rs = composite_forward(cb_spec, params, bn, gbs, jax.random.key(1))
        T = len(gs)
        np.testing.assert_allclose(np.asarray(rb["out"])[:T],
                                   np.asarray(rs["out"])[:T], atol=1e-5)


class TestCompositeDP:
    def test_dp_equals_mean_of_replicas(self, rng):
        """Composite DP step == single-device steps on the gradient average
        (same contract as the homogeneous DP test)."""
        from gnn_tpu.models.composite import make_composite_dp_train_step
        from gnn_tpu.parallel import make_mesh
        from gnn_tpu.parallel.data_parallel import shard_batches
        gs = [het_graph(rng, n=30, e=100) for _ in range(2)]
        bs = [GraphBatch.from_graph(g, node_pad=64, edge_pad=128, target_pad=64)
              for g in gs]
        ss, os_ = specs()
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss), output_spec=os_,
                                 max_iteration=3, threshold=0.01,
                                 aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(0))
        mesh = make_mesh({"data": 2})
        stacked = shard_batches(bs, mesh)
        sgd = optimizer_config("sgd", learning_rate=1.0)
        dp = make_composite_dp_train_step(cspec, "mse", None, sgd, mesh,
                                          mean=False)
        rngs = jax.random.split(jax.random.key(7), 2)
        p_dp, _, _, _ = dp(params, bn, make_optimizer(sgd).init(params),
                           stacked, rngs)

        # manual average of per-batch grads at lr 1.0
        from gnn_tpu.models.composite import (composite_regularization,
                                              composite_forward, weighted_loss)
        from gnn_tpu.training.losses import get_loss
        lf = get_loss("mse")

        def grad_one(gb, rng):
            def loss_fn(p):
                res = composite_forward(cspec, p, bn, gb, rng, training=True)
                return (weighted_loss(lf, {}, gb, res["out"])
                        + composite_regularization(cspec, p))
            return jax.grad(loss_fn)(params)

        g0 = grad_one(bs[0], rngs[0])
        g1 = grad_one(bs[1], rngs[1])
        expect = jax.tree_util.tree_map(
            lambda p, a, b: p - 0.5 * (a + b), params, g0, g1)
        for (kp, x), (_, y) in zip(jax.tree_util.tree_leaves_with_path(p_dp),
                                   jax.tree_util.tree_leaves_with_path(expect)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2e-5, err_msg=str(kp))


class TestCompositeLGNN:
    def test_composite_layers_in_lgnn_stack(self, rng):
        """An LGNN built from CompositeGNNnodeBased layers trains and, with
        all types sharing weights, matches the homogeneous LGNN."""
        from gnn_tpu import CompositeGNNnodeBased, GNNnodeBased, LGNN
        from gnn_tpu.ops.mlp import get_inout_dims
        g = het_graph(rng, n=50, e=200)
        nl, al, dt = 3, 2, 2

        def layer_specs(layer):
            in_s, l_s = get_inout_dims("state", nl, al, dt, "n", 0, None,
                                       layer=layer, get_state=True,
                                       get_output=False)
            in_o, l_o = get_inout_dims("output", nl, al, dt, "n", 0, None,
                                       layer=layer, get_state=True,
                                       get_output=False)
            ss = MLPSpec(input_dim=in_s, units=tuple(l_s), activations="tanh",
                         kernel_initializer="glorot_normal",
                         bias_initializer="glorot_normal",
                         batch_normalization=False)
            os_ = MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                          kernel_initializer="glorot_normal",
                          bias_initializer="glorot_normal",
                          batch_normalization=False)
            return ss, os_

        opt = {"name": "adam", "kwargs": {"learning_rate": 3e-3}}
        comp_layers, homo_layers = [], []
        for layer in range(2):
            ss, os_ = layer_specs(layer)
            comp_layers.append(CompositeGNNnodeBased(
                net_states=(ss, ss), net_output=os_, optimizer=dict(opt),
                loss_function="categorical_crossentropy",
                loss_arguments={"from_logits": False}, max_iteration=3,
                threshold=0.01, path_writer="writer/tcl/", seed=0))
            homo_layers.append(GNNnodeBased(
                net_state=ss, net_output=os_, optimizer=dict(opt),
                loss_function="categorical_crossentropy",
                loss_arguments={"from_logits": False}, max_iteration=3,
                threshold=0.01, path_writer="writer/tcl/", seed=0))

        lc = LGNN(comp_layers, get_state=True, get_output=False,
                  path_writer="writer/tclc/")
        lh = LGNN(homo_layers, get_state=True, get_output=False,
                  path_writer="writer/tclh/")
        # tie composite per-type weights to the homogeneous layer weights
        for cg, hg in zip(lc.gnns, lh.gnns):
            cg.params = {"state": (hg.params["state"],) * 2,
                         "output": hg.params["output"]}
            cg.bn = {"state": (hg.bn["state"],) * 2, "output": hg.bn["output"]}
        oc = lc(g)
        oh = lh(g)
        np.testing.assert_allclose(np.asarray(oc), np.asarray(oh), atol=1e-5)

        lc.train([g], epochs=8, update_freq=4, verbose=0)
        out = lc(g)
        assert np.isfinite(np.asarray(out)).all()


class TestCompositeIO:
    def test_node_types_roundtrip_npy_and_txt(self, rng, tmp_path):
        g = het_graph(rng, n=18, e=50)
        g.save(str(tmp_path / "npy"))
        g2 = Graph.load(str(tmp_path / "npy"))
        np.testing.assert_array_equal(g2.node_types, g.node_types)
        g.savetxt(str(tmp_path / "txt"))
        g3 = Graph.load_txt(str(tmp_path / "txt"))
        np.testing.assert_array_equal(g3.node_types, g.node_types)
        # untyped graphs keep writing the reference file set (no extra file)
        import os as _os
        h = random_g = het_graph(rng, n=10, e=30)
        h.node_types = None
        h.save(str(tmp_path / "plain"))
        assert "node_types.npy" not in _os.listdir(str(tmp_path / "plain"))


class TestCompositeEdgeSharded:
    def test_matches_single_device(self, rng):
        from gnn_tpu.models.composite import (make_composite_edge_sharded_train_step,
                                              make_composite_train_step)
        from gnn_tpu.parallel import make_mesh
        from gnn_tpu.parallel.edge_shard import shard_edges
        g = het_graph(rng, n=60, e=512)
        gb = GraphBatch.from_graph(g, node_pad=64, edge_pad=512, target_pad=64)
        ss, os_ = specs()
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss), output_spec=os_,
                                 max_iteration=4, threshold=0.01,
                                 aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(0))
        mesh = make_mesh({"graph": 8})
        gbs = shard_edges(gb, mesh)
        sgd = optimizer_config("sgd", learning_rate=1.0)
        es = make_composite_edge_sharded_train_step(cspec, "mse", None, sgd, mesh,
                                                    mean=False)
        ref = make_composite_train_step(cspec, "mse", None, sgd, mean=False)
        rk = jax.random.key(3)
        p_es, _, _, it_es = es(params, bn, make_optimizer(sgd).init(params), gbs, rk)
        p_rf, _, _, it_rf = ref(params, bn, make_optimizer(sgd).init(params), gb, rk)
        assert float(it_es) == float(it_rf)
        for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p_es),
                                   jax.tree_util.tree_leaves_with_path(p_rf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                       err_msg=str(kp))


class TestCompositeNodeSharded:
    def test_matches_single_device(self, rng):
        from gnn_tpu.models.composite import make_composite_train_step
        from gnn_tpu.parallel import make_mesh
        from gnn_tpu.parallel.node_shard import (make_node_sharded_forward,
                                                 make_node_sharded_train_step,
                                                 shard_nodes)
        g = het_graph(rng, n=100, e=400)
        gb = GraphBatch.from_graph(g, node_pad=128, edge_pad=512, target_pad=128)
        ss, os_ = specs()
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss), output_spec=os_,
                                 max_iteration=4, threshold=0.01,
                                 aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(0))
        mesh = make_mesh({"graph": 8})
        nb = shard_nodes(gb, mesh)
        assert nb.node_types is not None
        sgd = optimizer_config("sgd", learning_rate=1.0)
        ns = make_node_sharded_train_step(cspec, "mse", None, sgd, mesh, mean=False)
        ref = make_composite_train_step(cspec, "mse", None, sgd, mean=False)
        rk = jax.random.key(3)
        p_ns, _, _, it_ns = ns(params, bn, make_optimizer(sgd).init(params), nb, rk)
        p_rf, _, _, it_rf = ref(params, bn, make_optimizer(sgd).init(params), gb, rk)
        assert float(it_ns) == float(it_rf)
        for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p_ns),
                                   jax.tree_util.tree_leaves_with_path(p_rf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                       err_msg=str(kp))
        fwd = make_node_sharded_forward(cspec, mesh)
        _, out = fwd(params, bn, nb, jax.random.key(1))
        r = composite_forward(cspec, params, bn, gb, jax.random.key(1))
        np.testing.assert_allclose(np.asarray(out)[:100],
                                   np.asarray(r["out"])[:100], atol=1e-4)


class TestCompositeIFT:
    """Composite grad_mode='ift': the implicit adjoint equals the unrolled
    gradient at a converged fixed point (mirrors TestIFTGradients)."""

    def test_ift_matches_unrolled_at_convergence(self, rng):
        import dataclasses
        g = het_graph(rng, n=30, e=120, nl=3, al=2, n_types=2)
        g.nodes[:] = 0.3 * g.nodes
        gb = GraphBatch.from_graph(g)
        ss, os_ = specs()
        ss = dataclasses.replace(ss, kernel_initializer=("random_normal",),
                                 bias_initializer=("zeros",))
        spec_u = CompositeGNNSpec(focus="n", state_specs=(ss, ss),
                                  output_spec=os_, max_iteration=60,
                                  threshold=1e-7, aggregation="segment")
        spec_i = dataclasses.replace(spec_u, grad_mode="ift",
                                     ift_backward_iters=60)
        params, bn = composite_init(spec_u, jax.random.key(0))
        params = jax.tree_util.tree_map(lambda x: 0.3 * x, params)  # contractive

        from gnn_tpu.models.composite import make_composite_eval_step

        def grads(spec):
            ev = composite_forward

            def f(p):
                res = ev(spec, p, bn, gb, jax.random.key(1), training=False)
                from gnn_tpu.models.core import weighted_loss
                from gnn_tpu.training.losses import get_loss
                return weighted_loss(get_loss("mse"), {}, gb, res["out"])

            return jax.grad(f)(params)

        g_u, g_i = grads(spec_u), grads(spec_i)
        for a, b in zip(jax.tree_util.tree_leaves(g_u),
                        jax.tree_util.tree_leaves(g_i)):
            denom = float(jnp.max(jnp.abs(a))) + 1e-8
            assert float(jnp.max(jnp.abs(a - b))) / denom < 5e-3

    def test_ift_rejects_state_dropout(self):
        import dataclasses
        ss, os_ = specs()
        ss = dataclasses.replace(ss, dropout_rate=(0.1,), dropout_pos=(0,))
        with pytest.raises(ValueError):
            CompositeGNNSpec(focus="n", state_specs=(ss,), output_spec=os_,
                             grad_mode="ift")


class TestCompositeEdgeBased:
    def test_trains_saves_loads(self, rng, tmp_path):
        """CompositeGNNedgeBased: full engine surface on an edge-focused
        heterogeneous task (composite counterpart of GNN.py:286-302)."""
        from gnn_tpu.models.gnn import CompositeGNNedgeBased
        gs = [het_graph(rng, n=16, e=60, focus="a") for _ in range(4)]
        batch = Graph.merge(gs, focus="a", aggregation_mode="average")
        ss, _ = specs()
        os_ = MLPSpec(input_dim=2 * 3 + 2, units=(2,), activations="softmax",
                      batch_normalization=False)
        m = CompositeGNNedgeBased(
            net_states=(ss, ss), net_output=os_, max_iteration=3,
            loss_function="categorical_crossentropy",
            path_writer=str(tmp_path / "w") + "/")
        m.train(batch, epochs=3, update_freq=2, verbose=0)
        it, state, out = m.Loop(batch)
        assert out.shape == (batch.n_arcs, 2)
        m.save(str(tmp_path / "m"))
        from gnn_tpu.models.gnn import CompositeGNNnodeBased
        m2 = CompositeGNNnodeBased.load(str(tmp_path / "m"),
                                        path_writer=str(tmp_path / "w2") + "/")
        assert type(m2) is CompositeGNNedgeBased
        _, _, out2 = m2.Loop(batch)
        np.testing.assert_allclose(out2, out, atol=1e-6)


class TestTypedLabels:
    """First-class per-type label widths (graphs/typed.py): packing layouts,
    shape arithmetic, end-to-end learnability."""

    def test_block_layout_packing(self):
        from gnn_tpu.graphs.typed import pack_typed_labels, typed_label_offsets
        types = np.array([0, 1, 0, 1, 1])
        feats = [[1.0, 2.0], [5.0, 6.0, 7.0], [3.0, 4.0], [8.0, 9.0, 10.0],
                 [11.0, 12.0, 13.0]]
        offs, W = typed_label_offsets((2, 3))
        assert offs == (0, 2) and W == 5
        packed = pack_typed_labels(types, feats, (2, 3))
        assert packed.shape == (5, 5)
        np.testing.assert_array_equal(packed[0], [1, 2, 0, 0, 0])
        np.testing.assert_array_equal(packed[1], [0, 0, 5, 6, 7])
        np.testing.assert_array_equal(packed[3], [0, 0, 8, 9, 10])

    def test_overlay_layout_and_errors(self):
        from gnn_tpu.graphs.typed import pack_typed_labels
        types = np.array([0, 1])
        packed = pack_typed_labels(types, [[1.0], [2.0, 3.0]], (1, 2),
                                   layout="overlay")
        assert packed.shape == (2, 2)
        np.testing.assert_array_equal(packed, [[1, 0], [2, 3]])
        with pytest.raises(ValueError):
            pack_typed_labels(types, [[1.0, 9.0], [2.0, 3.0]], (1, 2))
        with pytest.raises(ValueError):
            pack_typed_labels(np.array([0, 5]), [[1.0], [2.0]], (1, 2))

    def test_inout_dims(self):
        from gnn_tpu.graphs.typed import composite_get_inout_dims
        i, layers = composite_get_inout_dims("state", (2, 3), 2, 4, "n", 8)
        assert i == 2 + 2 * 5 and layers == [8, 5]
        i, layers = composite_get_inout_dims("output", (2, 3), 2, 4, "a", None)
        assert i == 2 * 5 + 2 and layers == [4]

    def test_per_type_widths_learnable_end_to_end(self, rng, tmp_path):
        """Two types with different native widths: the target of every node is
        carried only in its own type's feature block — learnable to high
        accuracy through the packed layout."""
        from gnn_tpu.graphs.typed import (composite_get_inout_dims,
                                          pack_typed_labels)
        from gnn_tpu.models.gnn import CompositeGNNnodeBased

        def make(n=40, e=140):
            types = rng.integers(0, 2, n).astype(np.int32)
            cls = rng.integers(0, 2, n)
            feats = []
            for i in range(n):
                if types[i] == 0:       # width 1: the class sign itself
                    feats.append([2.0 * cls[i] - 1.0])
                else:                   # width 3: class hidden in column 2
                    v = rng.standard_normal(3) * 0.1
                    v[2] = 1.0 - 2.0 * cls[i]
                    feats.append(v)
            nodes = pack_typed_labels(types, feats, (1, 3))
            src = rng.integers(0, n, e)
            dst = rng.integers(0, n, e)
            arcs = np.concatenate([src[:, None], dst[:, None],
                                   rng.standard_normal((e, 1))], axis=1)
            targs = np.eye(2, dtype=np.float32)[cls]
            return Graph(arcs=arcs, nodes=nodes, targets=targs, focus="n",
                         aggregation_mode="average", node_types=types)

        batch = Graph.merge([make() for _ in range(4)], focus="n",
                            aggregation_mode="average")
        si, sl = composite_get_inout_dims("state", (1, 3), 1, 2, "n", None)
        oi, ol = composite_get_inout_dims("output", (1, 3), 1, 2, "n", 8)
        ss = MLPSpec(input_dim=si, units=tuple(sl), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=oi, units=tuple(ol),
                      activations=("tanh", "softmax"), batch_normalization=False)
        m = CompositeGNNnodeBased(
            net_states=(ss, ss), net_output=os_, max_iteration=3,
            loss_function="categorical_crossentropy",
            optimizer={"name": "adam", "kwargs": {"learning_rate": 0.01}},
            path_writer=str(tmp_path / "w") + "/")
        m.train(batch, epochs=60, update_freq=30, verbose=0)
        _, _, targs, outs = m.evaluate_single_graph(batch, training=False)
        acc = float((targs.argmax(1) == outs.argmax(1)).mean())
        assert acc > 0.9, acc


class TestCompositeStateDim:
    """state_dim > 0 for the composite family (round 4 — family uniformity
    with the homogeneous model; reference GNN.py:261-266 semantics)."""

    def _sd_specs(self, nl=3, al=2, dt=2, sd=4, focus="n"):
        ss = MLPSpec(input_dim=2 * (nl + sd) + al, units=(sd,),
                     activations="tanh", kernel_initializer="glorot_normal",
                     bias_initializer="glorot_normal",
                     batch_normalization=False)
        o_in = {"n": nl + sd, "g": nl + sd, "a": 2 * (nl + sd) + al}[focus]
        os_ = MLPSpec(input_dim=o_in, units=(dt,), activations="softmax",
                      kernel_initializer="glorot_normal",
                      bias_initializer="glorot_normal",
                      batch_normalization=False)
        return ss, os_

    def test_shared_weights_equal_homogeneous_sd(self, rng):
        """Identical per-type weights at state_dim>0 must reproduce the
        homogeneous state_dim>0 model (shared rng stream incl. the random
        state0 draw)."""
        g = het_graph(rng, n_types=3)
        gb = GraphBatch.from_graph(g)
        ss, os_ = self._sd_specs()
        hspec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                        state_dim=4, max_iteration=4, threshold=0.01,
                        aggregation="segment")
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss, ss),
                                 output_spec=os_, state_dim=4,
                                 max_iteration=4, threshold=0.01,
                                 aggregation="segment")
        hp, hb = gnn_init(hspec, jax.random.key(0))
        cp = {"state": (hp["state"],) * 3, "output": hp["output"]}
        cb = {"state": (hb["state"],) * 3, "output": hb["output"]}
        hr = gnn_forward(hspec, hp, hb, gb, jax.random.key(1))
        cr = composite_forward(cspec, cp, cb, gb, jax.random.key(1))
        assert float(hr["iters"]) == float(cr["iters"])
        np.testing.assert_allclose(np.asarray(cr["state"]),
                                   np.asarray(hr["state"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cr["out"]),
                                   np.asarray(hr["out"]), atol=1e-6)

    @pytest.mark.parametrize("focus", ["n", "a", "g"])
    def test_segment_vs_blocked_paths_agree(self, rng, focus):
        from gnn_tpu.graphs.batch import from_graphs_blocked
        gs = [het_graph(rng, n=int(rng.integers(10, 20)), e=40, focus=focus)
              for _ in range(5)]
        merged = Graph.merge(gs, focus=focus, aggregation_mode="average")
        gb_seg = GraphBatch.from_graph(merged)
        gb_blk = from_graphs_blocked(gs, block_w=16, focus=focus,
                                     aggregation_mode="average")
        ss, os_ = self._sd_specs(focus=focus)
        # state0 is drawn over the padded node geometry, which differs
        # between containers — inject a shared state by comparing through
        # the same container geometry instead: use the blocked pads twice
        cspec = CompositeGNNSpec(focus=focus, state_specs=(ss, ss),
                                 output_spec=os_, state_dim=4,
                                 max_iteration=4, threshold=0.01,
                                 aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(0))
        import dataclasses
        r_s = composite_forward(
            dataclasses.replace(cspec, aggregation="segment"),
            params, bn, gb_blk, jax.random.key(2))
        r_b = composite_forward(
            dataclasses.replace(cspec, aggregation="blocked"),
            params, bn, gb_blk, jax.random.key(2))
        assert float(r_s["iters"]) == float(r_b["iters"])
        np.testing.assert_allclose(np.asarray(r_s["out"]),
                                   np.asarray(r_b["out"]), atol=1e-4)

    def test_node_sharded_sd_matches_single_device(self, rng):
        from gnn_tpu.parallel import make_mesh
        from gnn_tpu.parallel.node_shard import (make_node_sharded_train_step,
                                                 shard_nodes)
        g = het_graph(rng, n=100, e=400)
        gb = GraphBatch.from_graph(g, node_pad=128, edge_pad=512,
                                   target_pad=128)
        ss, os_ = self._sd_specs()
        cspec = CompositeGNNSpec(focus="n", state_specs=(ss, ss),
                                 output_spec=os_, state_dim=4,
                                 max_iteration=4, threshold=0.01,
                                 aggregation="segment")
        params, bn = composite_init(cspec, jax.random.key(0))
        mesh = make_mesh({"graph": 8})
        nb = shard_nodes(gb, mesh)
        sgd = optimizer_config("sgd", learning_rate=1.0)
        ns = make_node_sharded_train_step(cspec, "mse", None, sgd, mesh,
                                          mean=False)
        ref = make_composite_train_step(cspec, "mse", None, sgd, mean=False)
        rk = jax.random.key(3)
        p_ns, _, _, it_ns = ns(params, bn, make_optimizer(sgd).init(params),
                               nb, rk)
        p_rf, _, _, it_rf = ref(params, bn, make_optimizer(sgd).init(params),
                                gb, rk)
        assert float(it_ns) == float(it_rf)
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(p_ns),
                jax.tree_util.tree_leaves_with_path(p_rf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, err_msg=str(kp))

    def test_model_class_save_load_preserves_state_dim(self, rng, tmp_path):
        from gnn_tpu import CompositeGNNnodeBased
        ss, os_ = self._sd_specs()
        m = CompositeGNNnodeBased(
            net_states=(ss, ss), net_output=os_,
            optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
            loss_function="mse", loss_arguments=None,
            max_iteration=4, threshold=0.01, state_dim=4,
            path_writer=str(tmp_path / "w") + "/", seed=0)
        assert m.spec.state_dim == 4
        g = het_graph(rng)
        gb = GraphBatch.from_graph(g)
        m.train(gb, 2, verbose=0)
        m.save(str(tmp_path / "m"))
        m2 = CompositeGNNnodeBased.load(str(tmp_path / "m"),
                                        path_writer=str(tmp_path / "w2") + "/")
        assert m2.spec.state_dim == 4
        r1 = composite_forward(m.spec, m.params, m.bn, gb, jax.random.key(5))
        r2 = composite_forward(m2.spec, m2.params, m2.bn, gb,
                               jax.random.key(5))
        np.testing.assert_allclose(np.asarray(r2["out"]),
                                   np.asarray(r1["out"]), atol=1e-6)
