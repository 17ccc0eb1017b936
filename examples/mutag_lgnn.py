"""5-layer LGNN on MUTAG graph classification — the reference's headline
configuration (starter.py defaults), on fast block-dense batches.

Run: python examples/mutag_lgnn.py            (TPU)
     GNN_TPU_CPU=1 python examples/mutag_lgnn.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

from gnn_tpu import GNNgraphBased, LGNN, MLPSpec, get_inout_dims
from gnn_tpu.graphs import utils
from gnn_tpu.graphs.batch import from_graphs_blocked
from gnn_tpu.graphs.datasets import load_mutag
from gnn_tpu.metrics import Metrics

MUTAG = os.environ.get("MUTAG_PATH", "/root/reference/MUTAG_raw/")
graphs = load_mutag(MUTAG)

iTr, iTe, iVa = utils.getindices(len(graphs), 0.7, 0.1, seed=7)
tr = [graphs[i] for i in iTr]
chunks = [tr[i:i + 32] for i in range(0, len(tr), 32)]
probe = [from_graphs_blocked(c, block_w=128, target_pad=128, edge_pad=4096) for c in chunks]
max_b = max(b.adj_blocks.shape[0] for b in probe)
# fused_layout=True prepacks the kernel layout; the hidden-150 two-layer
# state nets ride the 2-layer fused kernels (dropout-free, 'auto' dispatch)
gTr = [from_graphs_blocked(c, block_w=128, target_pad=128, edge_pad=4096,
                           min_blocks=max_b, fused_layout=True) for c in chunks]
gVa = from_graphs_blocked([graphs[i] for i in iVa], block_w=128, fused_layout=True)
gTe = from_graphs_blocked([graphs[i] for i in iTe], block_w=128, fused_layout=True)

LAYERS, get_state, get_output = 5, False, True
gnns = []
for layer in range(LAYERS):
    in_s, l_s = get_inout_dims("state", 14, 3, 2, "g", 0, 150, layer=layer,
                               get_state=get_state, get_output=get_output)
    in_o, l_o = get_inout_dims("output", 14, 3, 2, "g", 0, 150, layer=layer,
                               get_state=get_state, get_output=get_output)
    gnns.append(GNNgraphBased(
        net_state=MLPSpec(input_dim=in_s, units=tuple(l_s), activations="selu",
                          kernel_initializer="lecun_normal",
                          bias_initializer="lecun_normal", batch_normalization=False),
        net_output=MLPSpec(input_dim=in_o, units=tuple(l_o),
                           activations=("selu", "softmax"), batch_normalization=False),
        optimizer="adam", loss_function="categorical_crossentropy",
        loss_arguments={"from_logits": False}, max_iteration=5, threshold=0.01,
        path_writer=f"writer/mutag_lgnn/GNN{layer}/", seed=layer))

lgnn = LGNN(gnns=gnns, get_state=get_state, get_output=get_output,
            optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
            loss_function="categorical_crossentropy",
            loss_arguments={"from_logits": False},
            extra_metrics={k: Metrics[k] for k in ["Acc", "Bacc", "Fs"]},
            extra_metrics_arguments={"Fs": {"average": "weighted", "zero_division": 0}},
            path_writer="writer/mutag_lgnn/")

lgnn.train(gTr, epochs=200, gVa=gVa, update_freq=20, max_fails=6,
           observed_metric="Acc", policy="max", training_mode="parallel", verbose=1)
print("\nLGNN TEST:", lgnn.test(gTe))
