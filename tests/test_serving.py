"""Serving layer (gnn_tpu/serving.py): AOT-compiled shape-bucketed
predictors must reproduce the model's own forward on the same batch, route
differently-sized requests onto shared executables, and split outputs back
per input graph."""

import jax
import numpy as np
import pytest

from gnn_tpu import (GNNgraphBased, GNNnodeBased, LGNN, MLPSpec,
                     get_inout_dims)
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.metrics import Metrics
from gnn_tpu.serving import Predictor


def build_model(focus="n", nl=3, al=1, dt=2, hidden=None, tmp="/tmp/wserve/"):
    from gnn_tpu import GNNedgeBased
    in_s, l_s = get_inout_dims("state", nl, al, dt, focus, 0, hidden)
    in_o, l_o = get_inout_dims("output", nl, al, dt, focus, 0, None)
    ss = MLPSpec(input_dim=in_s, units=tuple(l_s), activations="tanh",
                 batch_normalization=False)
    os_ = MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                  batch_normalization=False)
    klass = {"n": GNNnodeBased, "a": GNNedgeBased, "g": GNNgraphBased}[focus]
    return klass(net_state=ss, net_output=os_,
                 optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
                 loss_function="categorical_crossentropy",
                 loss_arguments={"from_logits": False},
                 max_iteration=4, threshold=0.01,
                 extra_metrics={"Acc": Metrics["Acc"]},
                 path_writer=tmp, seed=0)


def graphs_for(rng, focus="n", n_graphs=6, nl=3, al=1, dt=2):
    return [random_graph(int(rng.integers(10, 25)), nl, al, dt, 0.6,
                         focus=focus, rng=rng) for _ in range(n_graphs)]


class TestPredictor:
    @pytest.mark.parametrize("focus", ["n", "a", "g"])
    def test_matches_model_forward_on_same_batch(self, rng, focus):
        model = build_model(focus=focus)
        gs = graphs_for(rng, focus=focus)
        pred = Predictor(model, block_w=32)
        gb = pred.build_batch(gs)
        rows = pred.predict(gs, split=False)
        # the model's own forward on the identical padded batch
        _, _, ref = model.Loop(gb)
        np.testing.assert_allclose(rows, ref, atol=1e-6)

    def test_split_outputs_align_per_graph(self, rng):
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=5)
        pred = Predictor(model, block_w=32)
        parts = pred.predict(gs)
        assert len(parts) == 5
        for g, p in zip(gs, parts):
            assert p.shape == g.targets.shape
        rows = pred.predict(gs, split=False)
        np.testing.assert_allclose(np.concatenate(parts, axis=0), rows,
                                   atol=0)

    def test_single_graph_request(self, rng):
        model = build_model(focus="g")
        g = graphs_for(rng, focus="g", n_graphs=1)[0]
        pred = Predictor(model, block_w=32)
        out = pred.predict(g)
        assert out.shape == g.targets.shape

    def test_bucket_reuse_no_recompile(self, rng):
        """Two differently-sized requests landing on the same shape bucket
        must share ONE compiled executable."""
        model = build_model(focus="n")
        pred = Predictor(model, block_w=32)
        req_a = [random_graph(15, 3, 1, 2, 0.5, focus="n", rng=rng)
                 for _ in range(4)]
        req_b = [random_graph(14, 3, 1, 2, 0.5, focus="n", rng=rng)
                 for _ in range(4)]
        pred.predict(req_a)
        assert pred.stats["compiles"] == 1
        pred.predict(req_b)
        assert pred.stats["compiles"] == 1
        assert pred.stats["bucket_hits"] == 1
        assert pred.stats["requests"] == 2

    def test_warmup_precompiles(self, rng):
        model = build_model(focus="n")
        pred = Predictor(model, block_w=32)
        n = pred.warmup([graphs_for(rng, n_graphs=3)])
        assert n == 1
        pred.predict(graphs_for(rng, n_graphs=3))
        assert pred.stats["compiles"] == 1

    def test_unblocked_fallback_matches(self, rng):
        model = build_model(focus="n")
        gs = graphs_for(rng, n_graphs=4)
        pred = Predictor(model, blocked=False)
        gb = pred.build_batch(gs)
        rows = pred.predict(gs, split=False)
        _, _, ref = model.Loop(gb)
        np.testing.assert_allclose(rows, ref, atol=1e-6)

    def test_blocked_rides_fused_kernels(self, rng):
        """The serving path's forward must dispatch to the looped Pallas
        kernels (fused-layout batch + eligible spec)."""
        model = build_model(focus="n")
        pred = Predictor(model, block_w=32)
        gb = pred.build_batch(graphs_for(rng, n_graphs=4))
        jx = str(jax.make_jaxpr(
            lambda p: pred._fn(p, pred._bn, gb))(pred._params))
        assert "pallas" in jx

    def test_empty_request_raises(self, rng):
        model = build_model(focus="n")
        with pytest.raises(ValueError, match="empty request"):
            Predictor(model, block_w=32).predict([])

    def test_focus_mismatch_raises(self, rng):
        model = build_model(focus="n")
        g = graphs_for(rng, focus="g", n_graphs=1)[0]
        with pytest.raises(ValueError, match="focus"):
            Predictor(model, block_w=32).predict(g)

    def test_weights_snapshot_isolated_from_training(self, rng):
        """Serving uses the weights at construction; training the model
        afterwards must not change served outputs."""
        model = build_model(focus="n")
        gs = graphs_for(rng, n_graphs=3)
        pred = Predictor(model, block_w=32)
        before = pred.predict(gs, split=False)
        model.train(model.to_batch(Graph.merge(
            gs, focus="n", aggregation_mode="average")), epochs=3, verbose=0)
        after = pred.predict(gs, split=False)
        np.testing.assert_allclose(before, after, atol=0)


class TestBatchCache:
    def test_repeat_request_hits_cache_and_matches(self, rng):
        """The packed-batch LRU: a repeat request skips pack+H2D (stats
        count the hit) and serves identical outputs."""
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=3)
        pred = Predictor(model, block_w=32)
        r1 = pred.predict(gs, split=False)
        assert pred.stats["batch_cache_hits"] == 0
        r2 = pred.predict(gs, split=False)
        assert pred.stats["batch_cache_hits"] == 1
        np.testing.assert_array_equal(r1, r2)
        # a DIFFERENT request list misses
        pred.predict(gs[:2], split=False)
        assert pred.stats["batch_cache_hits"] == 1

    def test_predict_async_matches_predict(self, rng):
        """predict_async (pipelined serving) returns the same values as the
        blocking predict, for both split modes, with overlapping requests
        in flight."""
        model = build_model(focus="n")
        reqs = [graphs_for(rng, focus="n", n_graphs=k) for k in (2, 3, 1)]
        pred = Predictor(model, block_w=32)
        blocking = [pred.predict(r, split=False) for r in reqs]
        pends = [pred.predict_async(r, split=False) for r in reqs]
        for b, p in zip(blocking, pends):
            np.testing.assert_array_equal(b, p.result())
        # split mode + single-graph request through the async path
        parts = pred.predict_async(reqs[0]).result()
        assert len(parts) == 2
        for g, p in zip(reqs[0], parts):
            assert p.shape == g.targets.shape
        single = pred.predict_async(reqs[2][0]).result()
        np.testing.assert_array_equal(single, pred.predict(reqs[2][0]))

    def test_composite_serving_rides_typed_eval_kernels(self, rng):
        """Heterogeneous serving through the public Predictor surface
        dispatches the typed EVAL chain (round 5) and returns per-graph
        outputs."""
        from gnn_tpu.models.gnn import CompositeGNNgraphBased
        gs = []
        for _ in range(5):
            g = random_graph(14, 5, 3, 2, 0.5, focus="g", rng=rng)
            g.node_types = rng.integers(0, 3, g.n_nodes).astype(np.int32)
            gs.append(g)
        sss = tuple(MLPSpec(input_dim=2 * 5 + 3, units=(5,),
                            activations="selu", batch_normalization=True)
                    for _ in range(3))
        os_ = MLPSpec(input_dim=5, units=(2,), activations="softmax",
                      batch_normalization=False)
        m = CompositeGNNgraphBased(
            net_states=sss, net_output=os_,
            optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
            loss_function="categorical_crossentropy",
            loss_arguments={"from_logits": False},
            max_iteration=4, threshold=0.01,
            path_writer="/tmp/wserve_comp/", seed=0)
        pred = Predictor(m, block_w=32)
        gb = pred.build_batch(gs)
        jx = str(jax.make_jaxpr(
            lambda p: pred._fn(p, pred._bn, gb))(pred._params))
        assert "pallas" in jx
        outs = pred.predict(gs)
        assert len(outs) == 5
        for g, p in zip(gs, outs):
            assert p.shape == g.targets.shape
            assert np.all(np.isfinite(p))

    def test_lru_eviction_and_disable(self, rng):
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=5)
        pred = Predictor(model, block_w=32, cache_batches=2)
        for g in gs[:3]:
            pred.predict(g)
        assert len(pred._batch_cache) == 2      # LRU evicted the first
        pred.predict(gs[0])                     # evicted -> re-pack, no hit
        assert pred.stats["batch_cache_hits"] == 0
        off = Predictor(model, block_w=32, cache_batches=0)
        off.predict(gs[0])
        off.predict(gs[0])
        assert off.stats["batch_cache_hits"] == 0


class TestShardedPredictor:
    pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                    reason="needs 8 (virtual) devices")

    def _mesh(self, n=4):
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()[:n]), ("data",))

    def test_matches_per_shard_single_device(self, rng):
        """DP serving == serving each shard as its own request (per-shard
        convergence semantics are the contract)."""
        from gnn_tpu.serving import ShardedPredictor
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=10)
        mesh = self._mesh(4)
        sp = ShardedPredictor(model, mesh, block_w=32)
        parts = sp.predict(gs)
        assert len(parts) == 10
        single = Predictor(model, block_w=32)
        for idx in sp._split_request(gs):
            ref = single.predict([gs[i] for i in idx])
            for i, r in zip(idx, ref):
                np.testing.assert_allclose(parts[i], r, atol=2e-5)

    def test_heterogeneous_shards_with_oversize_graph(self, rng):
        """A request where one graph exceeds block_w gives that shard a
        residual/dep structure the others lack — per-device executables must
        serve it anyway (regression: the stacked shard_map design crashed)."""
        from gnn_tpu.serving import ShardedPredictor
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=8)
        gs[2] = random_graph(60, 3, 1, 2, 0.3, focus="n", rng=rng)
        sp = ShardedPredictor(model, self._mesh(4), block_w=32)
        parts = sp.predict(gs)
        single = Predictor(model, block_w=32)
        for idx in sp._split_request(gs):
            ref = single.predict([gs[i] for i in idx])
            for i, r in zip(idx, ref):
                np.testing.assert_allclose(parts[i], r, atol=2e-5)

    def test_lgnn_sharded_serving(self, rng):
        """ShardedPredictor is family-agnostic: LGNN stacks serve sharded
        too (per-device executables over the stack forward)."""
        from gnn_tpu import LGNN, GNNnodeBased
        from gnn_tpu.serving import ShardedPredictor
        g0 = build_model(focus="n")
        in_s, l_s = get_inout_dims("state", 3, 1, 2, "n", 0, None, layer=1,
                                   get_state=True)
        in_o, l_o = get_inout_dims("output", 3, 1, 2, "n", 0, None, layer=1,
                                   get_state=True)
        g1 = GNNnodeBased(
            net_state=MLPSpec(input_dim=in_s, units=tuple(l_s),
                              activations="tanh", batch_normalization=False),
            net_output=MLPSpec(input_dim=in_o, units=tuple(l_o),
                               activations="softmax",
                               batch_normalization=False),
            path_writer="/tmp/wserve_ls1/", seed=1)
        lgnn = LGNN([g0, g1], get_state=True, get_output=False,
                    path_writer="/tmp/wserve_ls/")
        gs = graphs_for(rng, focus="n", n_graphs=8)
        sp = ShardedPredictor(lgnn, self._mesh(4), block_w=32)
        parts = sp.predict(gs)
        single = Predictor(lgnn, block_w=32)
        for idx in sp._split_request(gs):
            ref = single.predict([gs[i] for i in idx])
            for i, r in zip(idx, ref):
                np.testing.assert_allclose(parts[i], r, atol=2e-5)

    def test_export_roundtrip_sharded(self, rng, tmp_path):
        """ShardedPredictor.export writes a standard (device-count agnostic)
        Predictor artifact; load_exported(path, devices=...) serves it
        data-parallel with the SAME outputs as the live deployment."""
        from gnn_tpu.serving import ShardedPredictor, load_exported
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=10)
        mesh = self._mesh(4)
        sp = ShardedPredictor(model, mesh, block_w=32)
        live = sp.predict(gs)
        n = sp.export(str(tmp_path / "art"), [gs])
        assert n >= 1
        loaded = load_exported(str(tmp_path / "art"),
                               devices=mesh.devices.flatten().tolist())
        parts = loaded.predict(gs)
        assert len(parts) == 10
        for a, b in zip(parts, live):
            np.testing.assert_allclose(a, b, atol=2e-5)
        assert loaded.stats["requests"] == 1

    def test_export_roundtrip_single_device_reload(self, rng, tmp_path):
        """The same sharded artifact reloads single-device: each shard of
        the exporting deployment serves as its own request."""
        from gnn_tpu.serving import ShardedPredictor, load_exported
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=8)
        sp = ShardedPredictor(model, self._mesh(4), block_w=32)
        sp.export(str(tmp_path / "art"), [gs])
        loaded = load_exported(str(tmp_path / "art"))
        single = Predictor(model, block_w=32)
        for idx in sp._split_request(gs):
            shard = [gs[i] for i in idx]
            got = loaded.predict(shard, split=False)
            ref = single.predict(shard, split=False)
            np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_loaded_sharded_unexported_bucket_raises(self, rng, tmp_path):
        from gnn_tpu.serving import ShardedPredictor, load_exported
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=8)
        mesh = self._mesh(4)
        sp = ShardedPredictor(model, mesh, block_w=32)
        sp.export(str(tmp_path / "art"), [gs])
        loaded = load_exported(str(tmp_path / "art"),
                               devices=mesh.devices.flatten().tolist())
        big = [random_graph(200, 3, 1, 2, 0.3, focus="n", rng=rng)
               for _ in range(4)]
        with pytest.raises(KeyError, match="not exported"):
            loaded.predict(big)

    def test_all_graphs_assigned_once(self, rng):
        from gnn_tpu.serving import ShardedPredictor
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=9)
        sp = ShardedPredictor(model, self._mesh(4), block_w=32)
        shards = sp._split_request(gs)
        flat = sorted(i for s in shards for i in s)
        assert flat == list(range(9))
        parts = sp.predict(gs)
        for g, p in zip(gs, parts):
            assert p.shape == g.targets.shape

    def test_too_few_graphs_raises(self, rng):
        from gnn_tpu.serving import ShardedPredictor
        model = build_model(focus="n")
        sp = ShardedPredictor(model, self._mesh(4), block_w=32)
        with pytest.raises(ValueError, match="sharded request"):
            sp.predict(graphs_for(rng, focus="n", n_graphs=3))

    def test_warmup_and_bucket_reuse(self, rng):
        """Executables are per (bucket, device): one bucket over 4 devices
        compiles 4 executables; a same-bucket request reuses all of them."""
        from gnn_tpu.serving import ShardedPredictor
        model = build_model(focus="n")
        sp = ShardedPredictor(model, self._mesh(4), block_w=32)
        req_a = [random_graph(15, 3, 1, 2, 0.5, focus="n", rng=rng)
                 for _ in range(8)]
        req_b = [random_graph(14, 3, 1, 2, 0.5, focus="n", rng=rng)
                 for _ in range(8)]
        assert sp.warmup([req_a]) == 4
        sp.predict(req_b)
        assert sp.stats["compiles"] == 4
        assert sp.stats["bucket_hits"] == 4


class TestExportedPredictor:
    def test_export_load_roundtrip_matches(self, rng, tmp_path):
        from gnn_tpu.serving import load_exported
        model = build_model(focus="n")
        gs = graphs_for(rng, focus="n", n_graphs=4)
        pred = Predictor(model, block_w=32)
        n = pred.export(str(tmp_path / "artifact"), [gs])
        assert n == 1
        loaded = load_exported(str(tmp_path / "artifact"))
        rows = loaded.predict(gs, split=False)
        ref = pred.predict(gs, split=False)
        np.testing.assert_allclose(rows, ref, atol=1e-6)
        parts = loaded.predict(gs)
        assert len(parts) == 4

    def test_unexported_bucket_raises(self, rng, tmp_path):
        from gnn_tpu.serving import load_exported
        model = build_model(focus="n")
        pred = Predictor(model, block_w=32)
        pred.export(str(tmp_path / "a2"), [graphs_for(rng, n_graphs=4)])
        loaded = load_exported(str(tmp_path / "a2"))
        big = [random_graph(60, 3, 1, 2, 0.5, focus="n", rng=rng)
               for _ in range(40)]
        with pytest.raises(KeyError, match="not exported"):
            loaded.predict(big)

    def test_duplicate_buckets_deduped(self, rng, tmp_path):
        model = build_model(focus="n")
        pred = Predictor(model, block_w=32)
        req_a = [random_graph(15, 3, 1, 2, 0.5, focus="n", rng=rng)
                 for _ in range(4)]
        req_b = [random_graph(14, 3, 1, 2, 0.5, focus="n", rng=rng)
                 for _ in range(4)]
        assert pred.export(str(tmp_path / "a3"), [req_a, req_b]) == 1


class TestBigGraphPredictor:
    pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                    reason="needs 8 (virtual) devices")

    def test_matches_single_device_forward(self, rng):
        from jax.sharding import Mesh
        from gnn_tpu import BigGraphPredictor
        from gnn_tpu.graphs.batch import GraphBatch
        model = build_model(focus="n")
        big = Graph.merge(graphs_for(rng, focus="n", n_graphs=12),
                          focus="n", aggregation_mode="average")
        mesh = Mesh(np.array(jax.devices()[:4]), ("graph",))
        bp = BigGraphPredictor(model, mesh)
        rows = bp.predict(big)
        gb = GraphBatch.from_graph(big)
        _, _, ref = model.Loop(gb)
        np.testing.assert_allclose(rows, ref, atol=2e-5)
        # second identical-bucket request reuses the executable
        bp.predict(big)
        assert bp.stats["compiles"] == 1 and bp.stats["bucket_hits"] == 1

    def test_focus_mismatch_raises(self, rng):
        from jax.sharding import Mesh
        from gnn_tpu import BigGraphPredictor
        model = build_model(focus="n")
        mesh = Mesh(np.array(jax.devices()[:4]), ("graph",))
        g = graphs_for(rng, focus="g", n_graphs=1)[0]
        with pytest.raises(ValueError, match="focus"):
            BigGraphPredictor(model, mesh).predict(g)

    def test_lgnn_matches_single_device_loop(self, rng):
        """LGNN stacks serve node-sharded (round 4, VERDICT r3 missing #1):
        predict(g) == the single-device LGNN.Loop's last layer; predict(g,
        idx) mirrors LGNN.predict layer selection (LGNN.py:172-198)."""
        from jax.sharding import Mesh
        from gnn_tpu import BigGraphPredictor
        from gnn_tpu.graphs.batch import GraphBatch
        g0 = build_model(focus="n")
        in_s, l_s = get_inout_dims("state", 3, 1, 2, "n", 0, None,
                                   layer=1, get_state=True, get_output=False)
        in_o, l_o = get_inout_dims("output", 3, 1, 2, "n", 0, None,
                                   layer=1, get_state=True, get_output=False)
        g1 = GNNnodeBased(
            net_state=MLPSpec(input_dim=in_s, units=tuple(l_s),
                              activations="tanh", batch_normalization=False),
            net_output=MLPSpec(input_dim=in_o, units=tuple(l_o),
                               activations="softmax",
                               batch_normalization=False),
            optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
            loss_function="categorical_crossentropy",
            loss_arguments={"from_logits": False},
            max_iteration=4, threshold=0.01,
            path_writer="/tmp/wserve_bgl1/", seed=1)
        lgnn = LGNN([g0, g1], get_state=True, get_output=False,
                    path_writer="/tmp/wserve_bgl/")
        big = Graph.merge(graphs_for(rng, focus="n", n_graphs=12),
                          focus="n", aggregation_mode="average")
        mesh = Mesh(np.array(jax.devices()[:4]), ("graph",))
        bp = BigGraphPredictor(lgnn, mesh)
        rows = bp.predict(big)
        gb = GraphBatch.from_graph(big)
        _, _, outs = lgnn.Loop(gb)
        np.testing.assert_allclose(rows, outs[-1], atol=2e-5)
        # per-layer selection
        first = bp.predict(big, idx=0)
        np.testing.assert_allclose(first, outs[0], atol=2e-5)
        both = bp.predict(big, idx=[0, 1])
        assert len(both) == 2
        np.testing.assert_allclose(both[1], outs[-1], atol=2e-5)
        assert bp.stats["compiles"] == 1 and bp.stats["bucket_hits"] == 2

    def test_export_roundtrip_node_sharded(self, rng, tmp_path):
        """BigGraphPredictor.export serializes the shard_map modules;
        load_big_exported on a same-size mesh reproduces the live outputs
        with no model construction. A different device count is refused
        (the modules bake the exporting mesh's shardings)."""
        from jax.sharding import Mesh
        from gnn_tpu import BigGraphPredictor
        from gnn_tpu.serving import load_big_exported
        model = build_model(focus="n")
        big = Graph.merge(graphs_for(rng, focus="n", n_graphs=12),
                          focus="n", aggregation_mode="average")
        mesh = Mesh(np.array(jax.devices()[:4]), ("graph",))
        bp = BigGraphPredictor(model, mesh)
        ref = bp.predict(big)
        assert bp.export(str(tmp_path / "big"), [big]) == 1
        lp = load_big_exported(str(tmp_path / "big"), mesh)
        np.testing.assert_allclose(lp.predict(big), ref, atol=2e-5)
        assert lp.stats["requests"] == 1 and lp.stats["bucket_hits"] == 1
        with pytest.raises(ValueError, match="device"):
            load_big_exported(str(tmp_path / "big"),
                              Mesh(np.array(jax.devices()[:2]), ("graph",)))
        small = graphs_for(rng, focus="n", n_graphs=1)[0]
        with pytest.raises(KeyError, match="not exported"):
            lp.predict(small)


class TestCompositePredictor:
    def test_matches_composite_forward(self, rng):
        from gnn_tpu import CompositeGNNnodeBased
        nodes = lambda n: rng.standard_normal((n, 3)).astype(np.float32)  # noqa: E731

        def het(n=18, e=60):
            src = rng.integers(0, n, e)
            dst = rng.integers(0, n, e)
            arcs = np.concatenate(
                [src[:, None], dst[:, None],
                 rng.standard_normal((e, 1)).astype(np.float32)], axis=1)
            targets = np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)]
            return Graph(arcs=arcs, nodes=nodes(n), targets=targets,
                         focus="n", aggregation_mode="average",
                         node_types=rng.integers(0, 2, n).astype(np.int32))

        gs = [het() for _ in range(3)]
        ss = MLPSpec(input_dim=7, units=(3,), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                      batch_normalization=False)
        model = CompositeGNNnodeBased(
            net_states=(ss, ss), net_output=os_,
            optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
            loss_function="categorical_crossentropy",
            loss_arguments={"from_logits": False}, max_iteration=4,
            threshold=0.01, path_writer="/tmp/wserve_c/", seed=0)
        pred = Predictor(model, block_w=32)
        gb = pred.build_batch(gs)
        rows = pred.predict(gs, split=False)
        _, _, ref = model.Loop(gb)
        np.testing.assert_allclose(rows, ref, atol=1e-6)


class TestLGNNPredictor:
    def test_matches_lgnn_last_layer(self, rng):
        g0 = build_model(focus="n")
        g1 = build_model(focus="n", nl=3)
        # layer-1 nets grow with the augmented node labels
        in_s, l_s = get_inout_dims("state", 3, 1, 2, "n", 0, None,
                                   layer=1, get_state=True, get_output=False)
        in_o, l_o = get_inout_dims("output", 3, 1, 2, "n", 0, None,
                                   layer=1, get_state=True, get_output=False)
        ss1 = MLPSpec(input_dim=in_s, units=tuple(l_s), activations="tanh",
                      batch_normalization=False)
        os1 = MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                      batch_normalization=False)
        g1 = GNNnodeBased(net_state=ss1, net_output=os1,
                          optimizer={"name": "adam",
                                     "kwargs": {"learning_rate": 1e-3}},
                          loss_function="categorical_crossentropy",
                          loss_arguments={"from_logits": False},
                          max_iteration=4, threshold=0.01,
                          path_writer="/tmp/wserve1/", seed=1)
        lgnn = LGNN([g0, g1], get_state=True, get_output=False,
                    path_writer="/tmp/wserve_l/")
        gs = graphs_for(rng, n_graphs=4)
        pred = Predictor(lgnn, block_w=32)
        gb = pred.build_batch(gs)
        rows = pred.predict(gs, split=False)
        _, _, outs = lgnn.Loop(gb)
        np.testing.assert_allclose(rows, outs[-1], atol=1e-6)
