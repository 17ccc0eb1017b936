"""Edge (arc) classification on random graphs — the 'a' focus
(reference GNNedgeBased, GNN.py:286-302).

Run: GNN_TPU_CPU=1 python examples/edge_classification.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from gnn_tpu import Graph, GNNedgeBased, MLPSpec, get_inout_dims
from gnn_tpu.graphs import utils
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.metrics import Metrics

rng = np.random.default_rng(0)
graphs = [random_graph(int(rng.integers(15, 35)), dim_node_label=3, dim_arc_label=2,
                       dim_target=2, density=0.6, focus="a", rng=rng)
          for _ in range(60)]

iTr, iTe, iVa = utils.getindices(len(graphs), 0.7, 0.15, seed=0)
gTr = utils.getbatches([graphs[i] for i in iTr], batch_size=16)
gVa = Graph.merge([graphs[i] for i in iVa])
gTe = Graph.merge([graphs[i] for i in iTe])

# edge focus: output net sees [state_src, state_dst, arc_label]
in_s, layers_s = get_inout_dims("state", 3, 2, 2, "a", 0, None)
in_o, layers_o = get_inout_dims("output", 3, 2, 2, "a", 0, [20])
gnn = GNNedgeBased(
    net_state=MLPSpec(input_dim=in_s, units=tuple(layers_s), activations="tanh",
                      batch_normalization=False),
    net_output=MLPSpec(input_dim=in_o, units=tuple(layers_o),
                       activations=("tanh", "softmax"), batch_normalization=False),
    optimizer={"name": "adam", "kwargs": {"learning_rate": 3e-3}},
    loss_function="categorical_crossentropy", loss_arguments={"from_logits": False},
    max_iteration=5, threshold=0.01,
    extra_metrics={k: Metrics[k] for k in ["Acc", "Bacc"]},
    path_writer="writer/edge_example/", seed=0)

gnn.train(gTr, epochs=80, gVa=gVa, update_freq=10, max_fails=8, verbose=1)
print("\nTEST:", gnn.test(gTe))
out = gnn(gTe)
print("per-arc outputs:", out.shape)
