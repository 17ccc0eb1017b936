"""LGNN tests: layer stacking, graph augmentation semantics, the three
training modes, predict, save/load — reference LGNN.py:13-344."""

import numpy as np
import pytest

from gnn_tpu import Graph, GNNgraphBased, GNNnodeBased, LGNN, MLPSpec, get_inout_dims
from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.metrics import Metrics


def build_lgnn(focus="n", layers=3, get_state=False, get_output=True,
               tmp="/tmp/wlgnn/", nl=3, al=1, dt=2):
    klass = {"n": GNNnodeBased, "g": GNNgraphBased}[focus]
    gnns = []
    for layer in range(layers):
        in_s, l_s = get_inout_dims("state", nl, al, dt, focus, 0, None,
                                   layer=layer, get_state=get_state, get_output=get_output)
        in_o, l_o = get_inout_dims("output", nl, al, dt, focus, 0, None,
                                   layer=layer, get_state=get_state, get_output=get_output)
        ss = MLPSpec(input_dim=in_s, units=tuple(l_s), activations="tanh",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                      batch_normalization=False)
        gnns.append(klass(net_state=ss, net_output=os_, optimizer="adam",
                          loss_function="categorical_crossentropy",
                          loss_arguments={"from_logits": False}, state_vect_dim=0,
                          max_iteration=3, threshold=0.01, addressed_problem="c",
                          path_writer=f"{tmp}g{layer}/", seed=layer))
    return LGNN(gnns=gnns, get_state=get_state, get_output=get_output,
                optimizer={"name": "adam", "kwargs": {"learning_rate": 3e-3}},
                loss_function="categorical_crossentropy",
                loss_arguments={"from_logits": False}, addressed_problem="c",
                extra_metrics={"Acc": Metrics["Acc"]}, path_writer=tmp)


def node_dataset(rng, n_graphs=8):
    return [random_graph(int(rng.integers(10, 20)), 3, 1, 2, 0.6, focus="n", rng=rng)
            for _ in range(n_graphs)]


class TestAugmentation:
    @pytest.mark.parametrize("gs,go,expect_extra", [
        (False, True, 2),   # + output dims (dt)
        (True, False, 3),   # + state dims (nl)
        (True, True, 5),    # + both
    ])
    def test_update_graph_batch_dims(self, rng, gs, go, expect_extra):
        import jax.numpy as jnp
        from gnn_tpu.models.lgnn import update_graph_batch
        g = random_graph(12, 3, 1, 2, 0.5, focus="n", rng=rng)
        gb = GraphBatch.from_graph(g)
        state = jnp.ones((gb.n_node_pad, 3))
        out = jnp.ones((gb.n_node_pad, 2))
        gb2 = update_graph_batch(gb, state, out, get_state=gs, get_output=go, focus="n")
        assert gb2.nodes.shape[1] == 3 + expect_extra
        assert gb2.arc_labels.shape[1] == gb.arc_labels.shape[1]

    def test_output_scatter_respects_mask(self, rng):
        """Entities outside set∧output get ZERO in the augmented labels
        (tf.scatter_nd semantics, LGNN.py:251)."""
        import jax.numpy as jnp
        from gnn_tpu.models.lgnn import update_graph_batch
        g = random_graph(12, 3, 1, 2, 0.5, focus="n", rng=rng)
        sm = np.zeros(12, bool)
        sm[:5] = True
        g.set_mask = sm
        gb = GraphBatch.from_graph(g)
        out = jnp.ones((gb.n_node_pad, 2))
        gb2 = update_graph_batch(gb, None, out, get_state=False, get_output=True, focus="n")
        aug = np.asarray(gb2.nodes)[:, 3:]
        assert np.allclose(aug[:5], 1.0)
        assert np.allclose(aug[5:], 0.0)

    def test_edge_focus_augments_arcs(self, rng):
        import jax.numpy as jnp
        from gnn_tpu.models.lgnn import update_graph_batch
        g = random_graph(10, 3, 1, 2, 0.5, focus="a", rng=rng)
        gb = GraphBatch.from_graph(g)
        out = jnp.ones((gb.n_edge_pad, 2))
        gb2 = update_graph_batch(gb, None, out, get_state=False, get_output=True, focus="a")
        assert gb2.arc_labels.shape[1] == gb.arc_labels.shape[1] + 2
        assert gb2.nodes.shape[1] == gb.nodes.shape[1]


class TestTrainingModes:
    @pytest.mark.parametrize("mode", ["parallel", "residual", "serial"])
    def test_mode_trains_and_predicts(self, rng, tmp_path, mode):
        gs = node_dataset(rng)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        lgnn.train(batch, epochs=4, update_freq=2, training_mode=mode, verbose=0)
        out = lgnn(batch)
        assert out.shape == (batch.n_nodes, 2)
        assert np.isfinite(out).all()
        outs = lgnn.predict(batch, idx="all")
        assert len(outs) == 3

    def test_serial_augment_does_not_retrace(self, rng, tmp_path):
        """Regression: serial-mode augmentation must reuse ONE jit cache
        entry per (spec, shapes) across batches and layers — round 1 built a
        fresh jax.jit wrapper per call, retracing every batch."""
        from gnn_tpu.models import lgnn as lgnn_mod
        gs = node_dataset(rng, 8)
        batches = [Graph.merge(gs[i:i + 4], focus="n", aggregation_mode="average")
                   for i in (0, 4)]
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        before = lgnn_mod._jit_forward_any._cache_size()
        lgnn.train(batches, epochs=3, update_freq=2, training_mode="serial",
                   verbose=0)
        added = lgnn_mod._jit_forward_any._cache_size() - before
        # one trace per layer-spec (3 layers; identical shapes across batches
        # and epochs) — layer specs differ in input dims so each traces once
        assert added <= 3

    def test_training_mode_sticky(self, rng, tmp_path):
        batch = Graph.merge(node_dataset(rng, 4), focus="n", aggregation_mode="average")
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        lgnn.train(batch, epochs=2, update_freq=2, training_mode="parallel", verbose=0)
        with pytest.raises(ValueError):
            lgnn.train(batch, epochs=2, update_freq=2, training_mode="residual", verbose=0)

    def test_parallel_loss_decreases(self, rng, tmp_path):
        batch = Graph.merge(node_dataset(rng, 10), focus="n", aggregation_mode="average")
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        lgnn.train(batch, epochs=20, update_freq=10, training_mode="parallel", verbose=0)
        assert lgnn.history["Loss Tr"][-1] < lgnn.history["Loss Tr"][0]


class TestGraphFocusLGNN:
    def test_graph_lgnn_trains(self, rng, tmp_path):
        gs = [random_graph(int(rng.integers(8, 15)), 3, 1, 2, 0.6, focus="g", rng=rng)
              for _ in range(8)]
        batch = Graph.merge(gs, focus="g", aggregation_mode="average")
        lgnn = build_lgnn(focus="g", tmp=str(tmp_path / "w") + "/")
        lgnn.train(batch, epochs=4, update_freq=2, training_mode="parallel", verbose=0)
        out = lgnn(batch)
        assert out.shape == (8, 2)


class TestLifecycle:
    def test_save_load_roundtrip(self, rng, tmp_path):
        batch = Graph.merge(node_dataset(rng, 4), focus="n", aggregation_mode="average")
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        lgnn.train(batch, epochs=2, update_freq=2, verbose=0)
        lgnn.save(str(tmp_path / "model"))
        loaded = LGNN.load(str(tmp_path / "model"), path_writer=str(tmp_path / "w2") + "/")
        assert loaded.LAYERS == 3
        assert np.allclose(lgnn(batch), loaded(batch), atol=1e-5)

    def test_copy(self, rng, tmp_path):
        batch = Graph.merge(node_dataset(rng, 4), focus="n", aggregation_mode="average")
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        c = lgnn.copy(copy_weights=True, path_writer=str(tmp_path / "c") + "/")
        assert np.allclose(lgnn(batch), c(batch), atol=1e-6)

    def test_mixed_gnn_types_rejected(self, rng, tmp_path):
        a = build_lgnn(tmp=str(tmp_path / "a") + "/").gnns
        b = build_lgnn(focus="g", tmp=str(tmp_path / "b") + "/").gnns
        with pytest.raises(TypeError):
            LGNN(gnns=[a[0], b[0]], get_state=False, get_output=True,
                 optimizer="adam", loss_function="mse", loss_arguments=None,
                 addressed_problem="c", path_writer=str(tmp_path / "c") + "/")


class TestBlockedLGNN:
    def test_lgnn_blocked_equals_standard_and_trains(self, rng, tmp_path):
        from gnn_tpu.graphs.batch import GraphBatch, from_graphs_blocked
        gs = node_dataset(rng, 10)
        merged = Graph.merge(gs, focus="n", aggregation_mode="average")
        gb_std = GraphBatch.from_graph(merged)
        gb_blk = from_graphs_blocked(gs, block_w=128)
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        assert np.allclose(lgnn(gb_std), lgnn(gb_blk), atol=1e-4)
        lgnn.train([gb_blk], epochs=2, update_freq=2, training_mode="parallel", verbose=0)
        assert np.isfinite(lgnn.history["Loss Tr"][-1])
