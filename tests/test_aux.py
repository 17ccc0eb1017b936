"""Aux subsystems: data generators, full training-state checkpointing,
multi-host helpers (SURVEY.md §5)."""

import jax
import numpy as np
import pytest

from gnn_tpu import Graph, GNNnodeBased, MLPSpec
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.graphs.generator import GraphDataGenerator, SingleGraphDataGenerator


def build_gnn(tmp, seed=0, **kw):
    ss = MLPSpec(input_dim=7, units=(3,), activations="tanh", batch_normalization=False)
    os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax", batch_normalization=False)
    return GNNnodeBased(net_state=ss, net_output=os_, optimizer="adam",
                        loss_function="mse", path_writer=str(tmp) + "/",
                        seed=seed, **kw)


class TestGenerators:
    def test_graph_data_generator(self, rng):
        gs = [random_graph(15, 3, 1, 2, 0.5, focus="n", rng=rng) for _ in range(10)]
        gen = GraphDataGenerator(gs, batch_size=4, shuffle=True, rng=0)
        assert len(gen) == 3
        batches = list(gen)
        assert len(batches) == 3
        total_nodes = sum(int(b.n_real[0]) for b in batches)
        assert total_nodes == sum(g.n_nodes for g in gs)
        # iterable is restartable (fresh shuffle each epoch)
        assert len(list(gen)) == 3

    def test_generator_feeds_training(self, rng, tmp_path):
        gs = [random_graph(15, 3, 1, 2, 0.5, focus="n", rng=rng) for _ in range(8)]
        gen = GraphDataGenerator(gs, batch_size=4, rng=0)
        gnn = build_gnn(tmp_path)
        gnn.train(list(gen), epochs=3, update_freq=3, verbose=0)
        assert len(gnn.history["Loss Tr"]) == 1

    def test_single_graph_generator_masks_partition(self, rng):
        g = random_graph(60, 3, 1, 2, 0.4, focus="n", rng=rng)
        gen = SingleGraphDataGenerator(g, batch_size=25, shuffle=True, rng=0)
        batches = list(gen)
        assert len(batches) == len(gen) == 3
        sel_total = np.zeros(60, dtype=int)
        for b in batches:
            sel_total[: 60] += np.asarray(b.set_mask)[:60].astype(int)
        assert (sel_total == 1).all()  # exact partition of supervised nodes

    def test_single_graph_generator_rejects_graph_focus(self, rng):
        g = random_graph(20, 3, 1, 2, 0.4, focus="g", rng=rng)
        with pytest.raises(ValueError):
            SingleGraphDataGenerator(g)


class TestCheckpoint:
    def test_full_state_roundtrip_resumes_identically(self, rng, tmp_path):
        gs = [random_graph(20, 3, 1, 2, 0.5, focus="n", rng=rng) for _ in range(4)]
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp_path / "a")
        gnn.train(batch, epochs=5, update_freq=5, verbose=0)
        gnn.save_checkpoint(str(tmp_path / "ckpt"))

        # continue original
        gnn.train(batch, epochs=3, update_freq=3, verbose=0)
        out_cont = gnn(batch)

        # restore into a fresh model and continue the same way
        gnn2 = build_gnn(tmp_path / "b", seed=123)
        gnn2.load_checkpoint(str(tmp_path / "ckpt"))
        assert gnn2.history["Epoch"] == [0]  # history restored
        gnn2.train(batch, epochs=3, update_freq=3, verbose=0)
        out_resumed = gnn2(batch)
        # optimizer slots + rng restored -> identical continuation
        assert np.allclose(out_cont, out_resumed, atol=1e-6)

    def test_lgnn_checkpoint(self, rng, tmp_path):
        from tests.test_lgnn import build_lgnn
        batch = Graph.merge([random_graph(12, 3, 1, 2, 0.5, focus="n", rng=rng)
                             for _ in range(4)], focus="n", aggregation_mode="average")
        lgnn = build_lgnn(tmp=str(tmp_path / "w") + "/")
        lgnn.train(batch, epochs=2, update_freq=2, verbose=0)
        lgnn.save_checkpoint(str(tmp_path / "ck"))
        before = lgnn(batch)
        lgnn2 = build_lgnn(tmp=str(tmp_path / "w2") + "/")
        lgnn2.training_mode = "parallel"
        lgnn2.opt_state = lgnn.opt_state  # structure for restore
        lgnn2.load_checkpoint(str(tmp_path / "ck"))
        assert np.allclose(before, lgnn2(batch), atol=1e-6)


class TestMultihost:
    def test_process_info_single(self):
        from gnn_tpu.parallel.multihost import host_local_batch_indices, process_info
        info = process_info()
        assert info["process_count"] >= 1
        idx = host_local_batch_indices(10)
        assert idx == list(range(0, 10, info["process_count"]))


class TestProfiler:
    def test_profile_dir_writes_trace(self, rng, tmp_path):
        batch = Graph.merge([random_graph(12, 3, 1, 2, 0.5, focus="n", rng=rng)
                             for _ in range(2)], focus="n", aggregation_mode="average")
        gnn = build_gnn(tmp_path / "w")
        gnn.train(batch, epochs=2, update_freq=2, verbose=0,
                  profile_dir=str(tmp_path / "trace"))
        import os
        assert any(os.scandir(str(tmp_path / "trace")))


class TestGeneratorTraining:
    def test_engine_accepts_generator_directly(self, rng, tmp_path):
        """train() re-iterates a GraphDataGenerator each epoch (fresh shuffle)."""
        gs = [random_graph(12, 3, 1, 2, 0.5, focus="n", rng=rng) for _ in range(8)]
        gen = GraphDataGenerator(gs, batch_size=4, shuffle=True, rng=0)
        gnn = build_gnn(tmp_path / "w")
        gnn.train(gen, epochs=4, update_freq=2, verbose=0)
        assert len(gnn.history["Epoch"]) == 2
        assert np.isfinite(gnn.history["Loss Tr"][-1])
