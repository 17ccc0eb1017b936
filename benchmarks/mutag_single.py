"""Single GNN on MUTAG graph classification — the accuracy-recommended
config (hidden-150 selu, state-net BN off; round-1 headline 0.790), with
dropout and cosine learning-rate decay knobs. hidden-150 means a TWO-layer
state net: both dropout-free runs (2-layer eval/loop kernels) and DROPOUT>0
runs (fused_train_loop2, the looped 2-layer dropout training kernel) ride
the fused production path.

Run on the chip:  PYTHONUNBUFFERED=1 python benchmarks/mutag_single.py
Env: DROPOUT=0.1 (0 disables)  EPOCHS=600  LR=1e-3  COSINE=1|0
     SPLIT_SEED=7  SEED=0  UPDATE_FREQ=10  MAX_FAILS=20
     ADJ_DTYPE=bfloat16 — single-pass bf16 adjacency products (the opt-in
     throughput mode, docs/kernels.md): round-5 accuracy qualification of
     the HWVALID_r4 3.7e-2 worst-grad error class
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

from gnn_tpu import GNNgraphBased, MLPSpec, get_inout_dims
from gnn_tpu.graphs import utils
from gnn_tpu.graphs.batch import from_graphs_blocked
from gnn_tpu.graphs.datasets import load_mutag
from gnn_tpu.metrics import Metrics

DROPOUT = float(os.environ.get("DROPOUT", "0.1"))
EPOCHS = int(os.environ.get("EPOCHS", "600"))
LR = float(os.environ.get("LR", "1e-3"))
COSINE = os.environ.get("COSINE", "0") != "0"
SPLIT_SEED = int(os.environ.get("SPLIT_SEED", "7"))
SEED = int(os.environ.get("SEED", "0"))
UPDATE_FREQ = int(os.environ.get("UPDATE_FREQ", "10"))
MAX_FAILS = int(os.environ.get("MAX_FAILS", "20"))
MUTAG = os.environ.get("MUTAG_PATH", "/root/reference/MUTAG_raw/")

graphs = load_mutag(MUTAG)
iTr, iTe, iVa = utils.getindices(len(graphs), 0.7, 0.1, seed=SPLIT_SEED)
tr = [graphs[i] for i in iTr]
chunks = [tr[i:i + 32] for i in range(0, len(tr), 32)]
probe = [from_graphs_blocked(c, block_w=128, target_pad=128, edge_pad=4096)
         for c in chunks]
max_b = max(b.adj_blocks.shape[0] for b in probe)
adj_dtype = None
if os.environ.get("ADJ_DTYPE"):
    import jax.numpy as jnp
    adj_dtype = {"bfloat16": jnp.bfloat16,
                 "float32": jnp.float32}[os.environ["ADJ_DTYPE"]]
mk = dict(block_w=128, target_pad=128, edge_pad=4096, min_blocks=max_b,
          fused_layout=True, adj_dtype=adj_dtype)
gTr = [from_graphs_blocked(c, **mk) for c in chunks]
gVa = from_graphs_blocked([graphs[i] for i in iVa], block_w=128,
                          fused_layout=True, adj_dtype=adj_dtype)
gTe = from_graphs_blocked([graphs[i] for i in iTe], block_w=128,
                          fused_layout=True, adj_dtype=adj_dtype)

in_s, l_s = get_inout_dims("state", 14, 3, 2, "g", 0, 150)
in_o, l_o = get_inout_dims("output", 14, 3, 2, "g", 0, 150)
drop = dict(dropout_rate=(DROPOUT,), dropout_pos=(0,),
            alphadropout=True) if DROPOUT > 0 else {}
ss = MLPSpec(input_dim=in_s, units=tuple(l_s), activations="selu",
             kernel_initializer="lecun_normal",
             bias_initializer="lecun_normal",
             batch_normalization=False, **drop)
os_ = MLPSpec(input_dim=in_o, units=tuple(l_o),
              activations=("selu", "softmax"),
              kernel_initializer="glorot_normal",
              bias_initializer="glorot_normal",
              batch_normalization=False, **drop)
lr = ({"name": "cosine_decay",
       "kwargs": {"init_value": LR, "decay_steps": EPOCHS * len(gTr),
                  "alpha": 0.05}} if COSINE else LR)
gnn = GNNgraphBased(
    net_state=ss, net_output=os_,
    optimizer={"name": "adam", "kwargs": {"learning_rate": lr}},
    loss_function="categorical_crossentropy",
    loss_arguments={"from_logits": False},
    max_iteration=5, threshold=0.01,
    extra_metrics={k: Metrics[k] for k in ["Acc", "Bacc", "Fs"]},
    extra_metrics_arguments={"Fs": {"average": "weighted",
                                    "zero_division": 0}},
    path_writer="writer/mutag_single/", seed=SEED)

t0 = time.perf_counter()
gnn.train(gTr, epochs=EPOCHS, gVa=gVa, update_freq=UPDATE_FREQ,
          max_fails=MAX_FAILS, observed_metric="Acc", policy="max", verbose=0)
dt = time.perf_counter() - t0
res = gnn.test(gTe)
print(f"\nDROPOUT={DROPOUT} COSINE={COSINE} EPOCHS={EPOCHS} LR={LR} "
      f"SPLIT_SEED={SPLIT_SEED} SEED={SEED} "
      f"trained_to={gnn.history['Epoch'][-1]} wall={dt:.0f}s "
      f"TEST={json.dumps({k: round(float(v), 4) for k, v in res.items()})}",
      flush=True)
