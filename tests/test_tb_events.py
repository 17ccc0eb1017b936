"""TensorBoard event-file writer tests.

The reference writes real TB summaries (GNN_BaseClass.py:428-459) and its
README documents `tensorboard --logdir writer` (README.md:95-98). The
pure-Python encoder (training/tb_events.py) must produce files TensorFlow's
own event reader parses back bit-for-bit — asserted here when TF is
installed; the framing/CRC invariants are asserted without it.
"""

import glob
import os
import struct

import numpy as np
import pytest

from gnn_tpu.training import tb_events as tb


class TestFraming:
    def test_crc32c_known_vectors(self):
        # published CRC-32C check values
        assert tb._crc32c(b"123456789") == 0xE3069283
        assert tb._crc32c(b"") == 0x0

    def test_record_framing_roundtrip(self, tmp_path):
        f = tb.TBEventFile(str(tmp_path / "run"))
        f.scalar("grp/metric", 0.5, step=3)
        f.histogram("grp/w", np.arange(10.0), step=3)
        f.close()
        raw = open(f.path, "rb").read()
        # walk the TFRecord stream verifying both CRCs per record
        off, n = 0, 0
        while off < len(raw):
            header = raw[off:off + 8]
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", raw[off + 8:off + 12])
            payload = raw[off + 12:off + 12 + length]
            (pcrc,) = struct.unpack("<I", raw[off + 12 + length:off + 16 + length])
            assert hcrc == tb._masked_crc(header)
            assert pcrc == tb._masked_crc(payload)
            off += 16 + length
            n += 1
        assert off == len(raw) and n == 3  # file_version + scalar + histo

    def test_varint_encoding(self):
        assert tb._varint(0) == b"\x00"
        assert tb._varint(127) == b"\x7f"
        assert tb._varint(300) == b"\xac\x02"


@pytest.mark.skipif(pytest.importorskip("tensorflow", reason="TF absent") is None,
                    reason="TF absent")
class TestTensorFlowReadsBack:
    def _events(self, path):
        import tensorflow as tf
        return list(tf.compat.v1.train.summary_iterator(path))

    def test_scalars_readable_by_tf(self, tmp_path):
        f = tb.TBEventFile(str(tmp_path / "run"))
        f.scalar("Accuracy & Loss/Loss", 1.25, step=0)
        f.scalar("Accuracy & Loss/Loss", 0.75, step=5)
        f.close()
        evs = self._events(f.path)
        assert evs[0].file_version == "brain.Event:2"
        got = [(e.step, e.summary.value[0].tag, e.summary.value[0].simple_value)
               for e in evs[1:]]
        assert got == [(0, "Accuracy & Loss/Loss", 1.25),
                       (5, "Accuracy & Loss/Loss", 0.75)]

    def test_histograms_readable_by_tf(self, tmp_path):
        vals = np.linspace(-2.0, 3.0, 100)
        f = tb.TBEventFile(str(tmp_path / "run"))
        f.histogram("GNN: Weights/N1 dense_0", vals, step=7)
        f.close()
        (ev,) = self._events(f.path)[1:]
        h = ev.summary.value[0].histo
        assert ev.step == 7
        assert h.min == pytest.approx(-2.0) and h.max == pytest.approx(3.0)
        assert h.num == 100 and h.sum == pytest.approx(vals.sum())
        assert h.sum_squares == pytest.approx(np.square(vals).sum())
        assert sum(h.bucket) == 100 and len(h.bucket_limit) == len(h.bucket)

    def test_engine_training_emits_tb_run_dirs(self, tmp_path, rng):
        """End-to-end: model.train() produces TB event files TensorBoard can
        consume, alongside the JSONL logs (reference layout: one run dir per
        writer under path_writer)."""
        from gnn_tpu.graphs.datasets import random_graph
        from gnn_tpu.graphs.graph import Graph
        from gnn_tpu.models.gnn import GNNnodeBased
        from gnn_tpu.ops.mlp import MLPSpec

        gs = [random_graph(10, 3, 1, 2, 0.5, focus="n", rng=rng) for _ in range(4)]
        batch = Graph.merge(gs, focus="n", aggregation_mode="average")
        st = MLPSpec(input_dim=7, units=(8, 3), activations="tanh",
                     batch_normalization=False)
        ou = MLPSpec(input_dim=3, units=(2,), activations="softmax",
                     batch_normalization=False)
        wdir = str(tmp_path / "writer") + "/"
        model = GNNnodeBased(st, ou, state_vect_dim=0, max_iteration=3,
                             loss_function="categorical_crossentropy",
                             path_writer=wdir)
        model.train(batch, epochs=2, update_freq=1, verbose=0)

        event_files = glob.glob(os.path.join(wdir, "*", "events.out.tfevents.*"))
        rundirs = {os.path.basename(os.path.dirname(p)) for p in event_files}
        assert {"Training", "Net - State", "Net - Output"} <= rundirs
        # Training run must contain scalar events TF can iterate
        train_file = [p for p in event_files if "/Training/" in p][0]
        evs = self._events(train_file)
        tags = {v.tag for e in evs for v in e.summary.value}
        assert any(t.endswith("/Loss") for t in tags)
        hist_file = [p for p in event_files if "Net - State" in p][0]
        hevs = self._events(hist_file)
        assert any(v.histo.num > 0 for e in hevs for v in e.summary.value)
