"""Composite (heterogeneous) GNN — per-node-type state networks.

Task: two node types whose labels depend on DIFFERENT features (type 0 on
feature 0, type 1 on feature 1). Per-type state nets separate it perfectly;
a homogeneous net cannot. (The reference only signalled composite graphs via
a dead import, GraphGenerator.py:8 — this is the shipped capability.)

Run: GNN_TPU_CPU=1 python examples/composite_heterogeneous.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from gnn_tpu import (CompositeGNNSpec, Graph, GraphBatch, MLPSpec,
                     composite_init, make_composite_eval_step,
                     make_composite_train_step)
from gnn_tpu.training.optimizers import make_optimizer, optimizer_config

rng = np.random.default_rng(0)
n, e = 600, 2400
nodes = rng.standard_normal((n, 3)).astype(np.float32)
types = rng.integers(0, 2, n).astype(np.int32)
y = np.where(types == 0, nodes[:, 0] > 0, nodes[:, 1] > 0).astype(int)
arcs = np.concatenate([rng.integers(0, n, (e, 2)),
                       rng.standard_normal((e, 1)).astype(np.float32)], axis=1)
g = Graph(arcs=arcs, nodes=nodes, targets=np.eye(2, dtype=np.float32)[y],
          focus="n", aggregation_mode="average", node_types=types)
gb = GraphBatch.from_graph(g)

ss = MLPSpec(input_dim=2 * 3 + 1, units=(16, 3), activations="tanh",
             batch_normalization=False)
os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
              batch_normalization=False)
spec = CompositeGNNSpec(focus="n", state_specs=(ss, ss), output_spec=os_,
                        max_iteration=3, threshold=0.01)
params, bn = composite_init(spec, jax.random.key(0))
cfg = optimizer_config("adam", learning_rate=5e-3)
step = make_composite_train_step(spec, "categorical_crossentropy",
                                 {"from_logits": False}, cfg)
ev = make_composite_eval_step(spec, "categorical_crossentropy",
                              {"from_logits": False})
opt_state = make_optimizer(cfg).init(params)

for i in range(300):
    params, bn, opt_state, iters = step(params, bn, opt_state, gb,
                                        jax.random.key(i))
    if i % 100 == 0:
        _, loss, out = ev(params, bn, gb, jax.random.key(999))
        acc = (np.asarray(out)[:n].argmax(1) == y).mean()
        print(f"step {i:3d}  loss {float(loss):8.2f}  acc {acc:.3f}")

_, loss, out = ev(params, bn, gb, jax.random.key(999))
pred = np.asarray(out)[:n].argmax(1)
for t in (0, 1):
    print(f"type {t} accuracy: {(pred[types == t] == y[types == t]).mean():.3f}")
