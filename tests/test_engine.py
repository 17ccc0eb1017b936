"""Engine tests: training loop, early stopping, history, test/LKO, save/load,
dataset utils — mirroring the reference BaseClass behaviors (SURVEY.md §2.1)."""

import numpy as np
import pytest

from gnn_tpu import Graph, GNNnodeBased, GNNedgeBased, GNNgraphBased, MLPSpec, get_inout_dims
from gnn_tpu.graphs.datasets import random_graph, simple_graph
from gnn_tpu.graphs.utils import getbatches, getindices, normalize_graphs, prepare_LKO_data
from gnn_tpu.metrics import Metrics


def build_gnn(focus="n", nl=3, al=1, dt=2, tmp="/tmp/wtest/", seed=0, **kw):
    in_s, l_s = get_inout_dims("state", nl, al, dt, focus, 0, None)
    in_o, l_o = get_inout_dims("output", nl, al, dt, focus, 0, None)
    ss = MLPSpec(input_dim=in_s, units=tuple(l_s), activations="tanh",
                 batch_normalization=False)
    os_ = MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                  batch_normalization=False)
    klass = {"n": GNNnodeBased, "a": GNNedgeBased, "g": GNNgraphBased}[focus]
    return klass(net_state=ss, net_output=os_,
                 optimizer={"name": "adam", "kwargs": {"learning_rate": 5e-3}},
                 loss_function="categorical_crossentropy",
                 loss_arguments={"from_logits": False}, state_vect_dim=0,
                 max_iteration=4, threshold=0.01, addressed_problem="c",
                 extra_metrics={"Acc": Metrics["Acc"]}, path_writer=tmp, seed=seed, **kw)


def dataset(rng, focus="n", n_graphs=16):
    return [random_graph(int(rng.integers(10, 25)), 3, 1, 2, 0.6, focus=focus, rng=rng)
            for _ in range(n_graphs)]


class TestTrainLoop:
    def test_train_updates_history_and_learns(self, rng, tmp_path):
        gs = dataset(rng)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        gnn.train(batch, epochs=30, update_freq=10, verbose=0)
        assert gnn.history["Epoch"] == [0, 10, 20]
        assert len(gnn.history["Loss Tr"]) == 3
        assert gnn.history["Loss Tr"][-1] < gnn.history["Loss Tr"][0]

    @staticmethod
    def _poison(gnn):
        import jax.numpy as jnp
        w = np.asarray(gnn.params["state"]["dense_0"]["w"]).copy()
        w[0, 0] = np.nan
        gnn.params["state"]["dense_0"]["w"] = jnp.asarray(w)

    def test_nan_policy_raise(self, rng, tmp_path):
        gs = dataset(rng)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        self._poison(gnn)
        with pytest.raises(FloatingPointError, match="non-finite"):
            gnn.train(batch, epochs=5, update_freq=1, verbose=0,
                      nan_policy="raise")

    def test_nan_policy_restore_snapshots_weights(self, rng, tmp_path):
        gs = dataset(rng)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        self._poison(gnn)
        snap = np.asarray(gnn.params["state"]["dense_0"]["w"]).copy()
        gnn.train(batch, epochs=5, update_freq=1, verbose=0,
                  nan_policy="restore")
        # stopped at the first evaluation and restored the pre-train snapshot
        assert gnn.history["Epoch"] == [0]
        np.testing.assert_array_equal(
            np.asarray(gnn.params["state"]["dense_0"]["w"]), snap)

    def test_nan_policy_with_validation_keeps_history_aligned(self, rng, tmp_path):
        """A divergence stop with gVa must not leave history lists with
        unequal lengths (printHistory/saveHistory would crash), and the
        post-loop best-validation restore must still run."""
        gs = dataset(rng)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        gva = Graph.merge(dataset(rng, n_graphs=4), focus="n",
                          aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        self._poison(gnn)
        gnn.train(batch, epochs=5, gVa=gva, update_freq=1, verbose=0,
                  nan_policy="restore")
        lengths = {k: len(v) for k, v in gnn.history.items()}
        assert len(set(lengths.values())) == 1, lengths
        gnn.printHistory()   # must not raise

    def test_nan_policy_default_keeps_reference_behavior(self, rng, tmp_path):
        gs = dataset(rng)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        self._poison(gnn)
        gnn.train(batch, epochs=3, update_freq=1, verbose=0)  # no raise/stop
        assert len(gnn.history["Epoch"]) == 3

    def test_nan_policy_invalid_raises(self, rng, tmp_path):
        gs = dataset(rng)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        with pytest.raises(ValueError, match="nan_policy"):
            gnn.train(batch, epochs=1, verbose=0, nan_policy="explode")

    def test_early_stopping_restores_best_weights(self, rng, tmp_path):
        gs = dataset(rng)
        gTr = Graph.merge(gs[:12], focus="n", aggregation_mode="average")
        gVa = Graph.merge(gs[12:], focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        gnn.train(gTr, epochs=40, gVa=gVa, update_freq=5, max_fails=2, verbose=0)
        assert "Fail" in gnn.history and "Best Loss Va" in gnn.history
        # best metric is monotone under min policy
        best = gnn.history["Best Loss Va"]
        assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(best, best[1:]))

    def test_resume_continues_epoch_numbering(self, rng, tmp_path):
        batch = Graph.merge(dataset(rng, n_graphs=6), focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        gnn.train(batch, epochs=10, update_freq=5, verbose=0)
        # resume: epoch numbering continues from history (GNN_BaseClass.py:278)
        gnn.train(batch, epochs=10, update_freq=5, verbose=0)
        assert gnn.history["Epoch"] == [0, 5, 10, 15]

    def test_history_export(self, rng, tmp_path):
        batch = Graph.merge(dataset(rng, n_graphs=4), focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        gnn.train(batch, epochs=5, update_freq=5, verbose=0)
        gnn.saveHistory_csv(str(tmp_path / "h"))
        gnn.saveHistory_txt(str(tmp_path / "h2"))
        assert (tmp_path / "h.csv").exists() and (tmp_path / "h2.txt").exists()
        # scalar event files written
        assert (tmp_path / "w" / "Training.jsonl").exists()


class TestModelLifecycle:
    @pytest.mark.parametrize("focus", ["n", "a", "g"])
    def test_save_load_roundtrip(self, rng, tmp_path, focus):
        gs = dataset(rng, focus=focus, n_graphs=6)
        batch = Graph.merge(gs, focus=focus, aggregation_mode="average")
        gnn = build_gnn(focus=focus, tmp=str(tmp_path / "w") + "/")
        gnn.train(batch, epochs=3, update_freq=3, verbose=0)
        gnn.save(str(tmp_path / "model"))
        loaded = type(gnn).load(str(tmp_path / "model"), path_writer=str(tmp_path / "w2") + "/")
        assert np.allclose(gnn(batch), loaded(batch), atol=1e-5)
        assert type(loaded) is type(gnn)

    def test_copy_with_and_without_weights(self, rng, tmp_path):
        batch = Graph.merge(dataset(rng, n_graphs=4), focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        c1 = gnn.copy(copy_weights=True, path_writer=str(tmp_path / "c1") + "/")
        c2 = gnn.copy(copy_weights=False, path_writer=str(tmp_path / "c2") + "/")
        assert np.allclose(gnn(batch), c1(batch), atol=1e-6)
        w_orig = np.asarray(gnn.params["state"]["dense_0"]["w"])
        assert not np.allclose(w_orig, np.asarray(c2.params["state"]["dense_0"]["w"]))

    def test_test_method_with_roc_pr(self, rng, tmp_path):
        batch = Graph.merge(dataset(rng, n_graphs=6), focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        res = gnn.test(batch, rocdir=str(tmp_path / "roc.png"),
                       prisofsdir=str(tmp_path / "pr.png"))
        assert "Loss" in res and "It" in res and "Acc" in res
        assert (tmp_path / "roc.png").exists() and (tmp_path / "pr.png").exists()


class TestLKO:
    def test_multi_graph_lko(self, rng, tmp_path):
        gs = dataset(rng, n_graphs=14)
        batches = prepare_LKO_data(gs, focus="n", number_of_batches=3, useVa=False,
                                   seed=4, normalize_method="")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        metrics = gnn.LKO(batches, epochs=3, update_freq=3, verbose=0)
        assert len(metrics["Loss"]) == 3
        assert all(np.isfinite(v) for v in metrics["Loss"])

    def test_single_graph_lko_masks_are_disjoint(self, rng):
        g = random_graph(60, 3, 1, 2, 0.4, focus="n", rng=rng)
        gTRs, gTEs, gVAs = prepare_LKO_data(g, focus="n", number_of_batches=4,
                                            useVa=True, seed=1, normalize_method="")
        assert len(gTRs) == 4
        for tr, te, va in zip(gTRs, gTEs, gVAs):
            mtr, mte, mva = tr.set_mask, te.set_mask, va.set_mask
            # reference bug fixed: all three masks differ and are disjoint
            assert not (mtr & mte).any()
            assert not (mtr & mva).any()
            assert not (mte & mva).any()
            assert (mtr | mte | mva).sum() == 60


class TestUtils:
    def test_getindices_split_sizes(self):
        tr, te, va = getindices(100, 0.7, 0.1, seed=3)
        assert len(tr) == 70 and len(te) == 20 and len(va) == 10
        assert sorted(tr + te + va) == list(range(100))

    def test_getindices_seed_zero_deterministic(self):
        # seed=0 is falsy but must still be a deterministic seed
        assert getindices(50, 0.6, 0.2, seed=0) == getindices(50, 0.6, 0.2, seed=0)

    def test_getindices_no_shuffle(self):
        tr, te, va = getindices(10, 0.5, 0.2, seed=False)
        assert te == [0, 1, 2] and va == [3, 4] and tr == [5, 6, 7, 8, 9]

    def test_getbatches_merge(self, rng):
        gs = dataset(rng, n_graphs=10)
        batches = getbatches(gs, batch_size=4)
        assert len(batches) == 3
        assert batches[0].n_nodes == sum(g.n_nodes for g in gs[:4])
        raw = getbatches(gs, batch_size=4, one_graph_per_batch=False)
        assert isinstance(raw[0], list) and len(raw[0]) == 4

    def test_normalize_graphs_range(self, rng):
        gs = dataset(rng, n_graphs=6)
        normalize_graphs(gs[:4], gs[4:5], gs[5:], based_on="gTr")
        merged = Graph.merge(gs[:4], focus="n", aggregation_mode="sum")
        assert merged.nodes.min() >= -1e-6 and merged.nodes.max() <= 1 + 1e-6

    def test_simple_graph_fixture(self):
        g = simple_graph("n")
        assert g.n_nodes == 4 and g.n_arcs == 8
        g2 = simple_graph("g")
        assert g2.targets.shape == (1, 2)


class TestEdgeFocusEndToEnd:
    def test_edge_classification_trains(self, rng, tmp_path):
        gs = dataset(rng, focus="a", n_graphs=8)
        batch = Graph.merge(gs, focus="a", aggregation_mode="average")
        gnn = build_gnn(focus="a", tmp=str(tmp_path / "w") + "/")
        gnn.train(batch, epochs=20, update_freq=10, verbose=0)
        assert gnn.history["Loss Tr"][-1] < gnn.history["Loss Tr"][0]
        out = gnn(batch)
        assert out.shape == (batch.n_arcs, 2)


class TestLKOStratified:
    def test_stratified_class_lists(self, rng, tmp_path):
        """Multi-graph LKO with class-stratified list-of-lists input
        (GNN_utils.py:314-348): each fold batch mixes both classes."""
        c0 = [random_graph(int(rng.integers(10, 18)), 3, 1, 2, 0.5, focus="g", rng=rng)
              for _ in range(8)]
        c1 = [random_graph(int(rng.integers(10, 18)), 3, 1, 2, 0.5, focus="g", rng=rng)
              for _ in range(8)]
        for g in c0:
            g.targets = np.array([[1.0, 0.0]], dtype=np.float32)
        for g in c1:
            g.targets = np.array([[0.0, 1.0]], dtype=np.float32)
        batches = prepare_LKO_data([c0, c1], focus="g", number_of_batches=3,
                                   useVa=False, seed=5, normalize_method="")
        gTRs, gTEs, gVAs = batches
        assert len(gTRs) == 3
        for gte in gTEs:
            # both classes present in each merged fold
            counts = gte.targets.sum(axis=0)
            assert counts[0] > 0 and counts[1] > 0

    def test_lko_with_validation(self, rng, tmp_path):
        gs = dataset(rng, n_graphs=16)
        batches = prepare_LKO_data(gs, focus="n", number_of_batches=4, useVa=True,
                                   seed=2, normalize_method="")
        gnn = build_gnn(tmp=str(tmp_path / "w") + "/")
        metrics = gnn.LKO(batches, epochs=3, update_freq=3, max_fails=2, verbose=0)
        assert len(metrics["Loss"]) == 4


class TestMetricsParity:
    def test_per_class_and_rates_metrics(self, rng, tmp_path):
        """Full 13-metric registry incl. per-class accuracy hooks."""
        gs = dataset(rng, n_graphs=8)
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        extra = {k: Metrics[k] for k in ["Acc", "Bacc", "Tpr", "Tnr", "Fpr", "Fnr",
                                         "Ck", "Js", "Prec", "Rec", "Fs", "Cl0", "Cl1"]}
        margs = {**{k: {"average": "weighted", "zero_division": 0}
                    for k in ["Fs", "Prec", "Rec", "Js"]},
                 "Cl0": {"class_label": 0}, "Cl1": {"class_label": 1}}
        in_s, l_s = get_inout_dims("state", 3, 1, 2, "n", 0, None)
        in_o, l_o = get_inout_dims("output", 3, 1, 2, "n", 0, None)
        gnn = GNNnodeBased(
            net_state=MLPSpec(input_dim=in_s, units=tuple(l_s), activations="tanh",
                              batch_normalization=False),
            net_output=MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                               batch_normalization=False),
            optimizer="adam", loss_function="categorical_crossentropy",
            loss_arguments={"from_logits": False}, extra_metrics=extra,
            extra_metrics_arguments=margs, path_writer=str(tmp_path / "w") + "/", seed=0)
        res = gnn.test(batch, rocdir=str(tmp_path / "roc.png"), micro_and_macro=True)
        for k in extra:
            assert k in res and np.isfinite(res[k])

    def test_set_aggregation_switch(self, rng):
        g = dataset(rng, n_graphs=1)[0]
        w_avg = g.edge_weights()
        g.set_aggregation("sum")
        assert np.allclose(g.edge_weights(), 1.0)
        g.setAggregation("normalized")  # reference-compatible alias
        assert np.allclose(g.edge_weights(), 1.0 / g.n_arcs)
        assert not np.allclose(g.edge_weights(), w_avg)

    def test_savetxt_nodegraph_roundtrip(self, rng, tmp_path):
        gs = dataset(rng, focus="g", n_graphs=3)
        m = Graph.merge(gs, focus="g", aggregation_mode="average")
        m.savetxt(str(tmp_path / "g"))
        m2 = Graph.load_txt(str(tmp_path / "g"), focus="g", aggregation_mode="average")
        assert m2.NodeGraph is not None
        assert np.allclose(m.NodeGraph, m2.NodeGraph, atol=1e-6)
