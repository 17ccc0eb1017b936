"""Serving a trained GNN: AOT-compiled, shape-bucketed inference.

Trains a small graph classifier, then serves prediction requests of varying
size through gnn_tpu.serving.Predictor: every padding bucket's forward is
compiled before traffic (warmup), so request latency is one executable
launch + host<->device transfer. Run: python examples/serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from gnn_tpu import GNNgraphBased, MLPSpec, Predictor, get_inout_dims
from gnn_tpu.graphs.batch import from_graphs_blocked
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.metrics import Metrics

rng = np.random.default_rng(0)
train_graphs = [random_graph(int(rng.integers(10, 40)), 6, 3, 2, 0.4,
                             focus="g", rng=rng) for _ in range(64)]

in_s, l_s = get_inout_dims("state", 6, 3, 2, "g", 0, None)
in_o, l_o = get_inout_dims("output", 6, 3, 2, "g", 0, None)
model = GNNgraphBased(
    net_state=MLPSpec(input_dim=in_s, units=tuple(l_s), activations="selu",
                      kernel_initializer="lecun_normal",
                      bias_initializer="lecun_normal",
                      batch_normalization=False),
    net_output=MLPSpec(input_dim=in_o, units=tuple(l_o),
                       activations="softmax", batch_normalization=False),
    optimizer={"name": "adam", "kwargs": {"learning_rate": 2e-3}},
    loss_function="categorical_crossentropy",
    loss_arguments={"from_logits": False},
    max_iteration=5, threshold=0.01,
    extra_metrics={"Acc": Metrics["Acc"]},
    path_writer="writer/serving_example/", seed=0)
gTr = from_graphs_blocked(train_graphs, block_w=128, fused_layout=True)
model.train(gTr, epochs=30, update_freq=10, verbose=1)

# --- serve -----------------------------------------------------------------
pred = Predictor(model)                       # weights snapshot, on device

# warm the buckets a traffic sample lands on (compiles happen HERE, not on
# the request path)
sample = [[random_graph(int(rng.integers(10, 40)), 6, 3, 2, 0.4, focus="g",
                        rng=rng) for _ in range(k)] for k in (1, 4, 16)]
n = pred.warmup(sample)
print(f"warmup compiled {n} bucket executables")

for k in (1, 4, 16):
    req = [random_graph(int(rng.integers(10, 40)), 6, 3, 2, 0.4, focus="g",
                        rng=rng) for _ in range(k)]
    t0 = time.perf_counter()
    outs = pred.predict(req)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"request of {k:2d} graphs -> {len(outs)} outputs "
          f"(first={np.round(outs[0][0], 3)}) in {dt:.1f} ms "
          f"(compiles so far: {pred.stats['compiles']})")

# pipelined serving: dispatch a burst without blocking on each pull — the
# per-request amortised cost approaches device-launch time instead of the
# per-request round-trip (predict_async + PendingPrediction.result)
burst = [[random_graph(int(rng.integers(10, 40)), 6, 3, 2, 0.4, focus="g",
                       rng=rng)] for _ in range(8)]
pred.warmup(burst)
t0 = time.perf_counter()
pending = [pred.predict_async(req) for req in burst]
outs = [p.result() for p in pending]
dt = (time.perf_counter() - t0) / len(burst) * 1e3
print(f"pipelined burst of {len(burst)} 1-graph requests: "
      f"{dt:.2f} ms/request amortised")
print("stats:", pred.stats)
