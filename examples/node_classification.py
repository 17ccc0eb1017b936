"""Node classification on random graphs — the starter default workload
(reference starter.py with use_MUTAG=False).

NOTE: this mirrors the reference's DEFAULT hyperparameters, which use no
hidden layers (get_inout_dims(..., hidden=None) → a single dense layer per
net). That capacity learns little beyond the majority class on the random
clustering pseudo-targets — the same behaviour the reference default shows
on MUTAG (~0.61, see BASELINE.md). Pass e.g. hidden=150 to get_inout_dims
(as in examples/mutag_lgnn.py) for a config that actually learns.

Run: GNN_TPU_CPU=1 python examples/node_classification.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from gnn_tpu import Graph, GNNnodeBased, MLPSpec, get_inout_dims
from gnn_tpu.graphs import utils
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.metrics import Metrics

rng = np.random.default_rng(0)
graphs = [random_graph(int(rng.integers(15, 40)), dim_node_label=3, dim_arc_label=1,
                       dim_target=2, density=0.7, focus="n", rng=rng)
          for _ in range(100)]

iTr, iTe, iVa = utils.getindices(len(graphs), 0.7, 0.2, seed=0)
gTr = utils.getbatches([graphs[i] for i in iTr], batch_size=32)
gVa = Graph.merge([graphs[i] for i in iVa])
gTe = Graph.merge([graphs[i] for i in iTe])
utils.normalize_graphs(gTr, gVa, gTe, based_on="gTr")

in_s, layers_s = get_inout_dims("state", 3, 1, 2, "n", 0, None)
in_o, layers_o = get_inout_dims("output", 3, 1, 2, "n", 0, None)
gnn = GNNnodeBased(
    net_state=MLPSpec(input_dim=in_s, units=tuple(layers_s), activations="selu",
                      kernel_initializer="lecun_normal", bias_initializer="lecun_normal",
                      dropout_rate=(0.1,), dropout_pos=(0,), alphadropout=True),
    net_output=MLPSpec(input_dim=in_o, units=tuple(layers_o), activations="softmax",
                       batch_normalization=False),
    optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
    loss_function="categorical_crossentropy", loss_arguments={"from_logits": False},
    max_iteration=5, threshold=0.01,
    extra_metrics={k: Metrics[k] for k in ["Acc", "Bacc", "Fs"]},
    extra_metrics_arguments={"Fs": {"average": "weighted", "zero_division": 0}},
    path_writer="writer/node_example/", seed=0)

gnn.train(gTr, epochs=100, gVa=gVa, update_freq=10, max_fails=10, verbose=1)
print("\nTEST:", gnn.test(gTe))
gnn.save("models/node_example/")
