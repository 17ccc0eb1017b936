"""3-layer LGNN on MUTAG with the mixed-precision recipe (VERDICT r1 #7):
bf16 state carry + bf16 adjacency stream, f32 labels/params/augmentation.

Round-1 baselines: f32 0.795 / all-bf16 0.767 (the augmentation cascade).
Target: >= 0.79 at bf16-class step time.

Run on the chip:  PYTHONUNBUFFERED=1 python benchmarks/mutag_lgnn_bf16.py
Env: LGNN_BF16_MODE=mixed (default) | f32 | bf16   LGNN_LAYERS=3  EPOCHS=200
     LGNN_BF16_ADJ=f32|bf16 (mixed mode only; default f32 — round-1 data
     shows a bf16 adjacency stream alone costs ~0.013 accuracy)
     SPLIT_SEED=7   LGNN_FUSED=1|0 (fused-layout batches -> Pallas kernels)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from gnn_tpu import GNNgraphBased, LGNN, MLPSpec, get_inout_dims
from gnn_tpu.graphs import utils
from gnn_tpu.graphs.batch import from_graphs_blocked
from gnn_tpu.graphs.datasets import load_mutag
from gnn_tpu.metrics import Metrics

MODE = os.environ.get("LGNN_BF16_MODE", "mixed")
LAYERS = int(os.environ.get("LGNN_LAYERS", "3"))
EPOCHS = int(os.environ.get("EPOCHS", "200"))
MUTAG = os.environ.get("MUTAG_PATH", "/root/reference/MUTAG_raw/")

if MODE == "bf16":
    from gnn_tpu.config import set_floatx
    set_floatx("bfloat16")

ADJ = os.environ.get("LGNN_BF16_ADJ", "f32")
adj_dtype = jnp.bfloat16 if (MODE == "mixed" and ADJ == "bf16") else None
state_dtype = "bfloat16" if MODE == "mixed" else None
SPLIT_SEED = int(os.environ.get("SPLIT_SEED", "7"))
FUSED = os.environ.get("LGNN_FUSED", "1") != "0"
COSINE = os.environ.get("COSINE", "0") != "0"
MAX_FAILS = int(os.environ.get("MAX_FAILS", "6"))

graphs = load_mutag(MUTAG)
iTr, iTe, iVa = utils.getindices(len(graphs), 0.7, 0.1, seed=SPLIT_SEED)
tr = [graphs[i] for i in iTr]
chunks = [tr[i:i + 32] for i in range(0, len(tr), 32)]
probe = [from_graphs_blocked(c, block_w=128, target_pad=128, edge_pad=4096)
         for c in chunks]
max_b = max(b.adj_blocks.shape[0] for b in probe)
# The hidden-150 config has a TWO-layer state net: since the late-round-2
# 2-layer kernels (ops/pallas_fused.py::fused_propagation_loop2), this
# dropout-free config rides the fused kernels under 'auto' when
# LGNN_FUSED=1; LGNN_FUSED=0 keeps the XLA block-dense body
mk = dict(block_w=128, target_pad=128, edge_pad=4096, min_blocks=max_b,
          adj_dtype=adj_dtype, fused_layout=FUSED)
gTr = [from_graphs_blocked(c, **mk) for c in chunks]
gVa = from_graphs_blocked([graphs[i] for i in iVa], block_w=128,
                          adj_dtype=adj_dtype, fused_layout=FUSED)
gTe = from_graphs_blocked([graphs[i] for i in iTe], block_w=128,
                          adj_dtype=adj_dtype, fused_layout=FUSED)

get_state, get_output = False, True
gnns = []
for layer in range(LAYERS):
    in_s, l_s = get_inout_dims("state", 14, 3, 2, "g", 0, 150, layer=layer,
                               get_state=get_state, get_output=get_output)
    in_o, l_o = get_inout_dims("output", 14, 3, 2, "g", 0, 150, layer=layer,
                               get_state=get_state, get_output=get_output)
    gnns.append(GNNgraphBased(
        net_state=MLPSpec(input_dim=in_s, units=tuple(l_s), activations="selu",
                          kernel_initializer="lecun_normal",
                          bias_initializer="lecun_normal",
                          batch_normalization=False),
        net_output=MLPSpec(input_dim=in_o, units=tuple(l_o),
                           activations=("selu", "softmax"),
                           batch_normalization=False),
        optimizer="adam", loss_function="categorical_crossentropy",
        loss_arguments={"from_logits": False}, max_iteration=5, threshold=0.01,
        state_dtype=state_dtype,
        path_writer=f"writer/mutag_lgnn_bf16/GNN{layer}/", seed=layer))

lr = ({"name": "cosine_decay",
       "kwargs": {"init_value": 1e-3, "decay_steps": EPOCHS * len(gTr),
                  "alpha": 0.05}} if COSINE else 1e-3)
lgnn = LGNN(gnns=gnns, get_state=get_state, get_output=get_output,
            optimizer={"name": "adam", "kwargs": {"learning_rate": lr}},
            loss_function="categorical_crossentropy",
            loss_arguments={"from_logits": False},
            extra_metrics={k: Metrics[k] for k in ["Acc", "Bacc", "Fs"]},
            extra_metrics_arguments={"Fs": {"average": "weighted",
                                            "zero_division": 0}},
            path_writer="writer/mutag_lgnn_bf16/")

t0 = time.perf_counter()
lgnn.train(gTr, epochs=EPOCHS, gVa=gVa, update_freq=20, max_fails=MAX_FAILS,
           observed_metric="Acc", policy="max", training_mode="parallel",
           verbose=0)
dt = time.perf_counter() - t0
res = lgnn.test(gTe)
print(f"\nMODE={MODE} ADJ={ADJ} FUSED={FUSED} COSINE={COSINE} LAYERS={LAYERS} EPOCHS={EPOCHS} "
      f"SPLIT_SEED={SPLIT_SEED} wall={dt:.0f}s "
      f"TEST={ {k: round(float(v), 4) for k, v in res.items()} }", flush=True)
