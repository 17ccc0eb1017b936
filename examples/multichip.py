"""Multi-chip training: data parallelism + edge-sharded propagation on a
device mesh. Runs on a virtual 8-device CPU mesh when no multi-chip TPU is
attached.

Run: python examples/multichip.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Demo default: virtual 8-device CPU mesh. On a real multi-chip TPU slice,
# set GNN_TPU_REAL=1 to use the attached devices instead.
if not os.environ.get("GNN_TPU_REAL"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from gnn_tpu import MLPSpec
from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.models.core import GNNSpec, gnn_init
from gnn_tpu.parallel import (make_dp_train_step, make_edge_sharded_train_step,
                              make_mesh, shard_batches, shard_edges)
from gnn_tpu.training.optimizers import make_optimizer, optimizer_config

n_dev = len(jax.devices())
print(f"devices: {n_dev}")
rng = np.random.default_rng(0)

spec = GNNSpec(
    focus="n",
    state_spec=MLPSpec(input_dim=7, units=(3,), activations="tanh",
                       batch_normalization=False),
    output_spec=MLPSpec(input_dim=3, units=(2,), activations="softmax",
                        batch_normalization=False),
    max_iteration=5, threshold=0.01, aggregation="segment")
params, bn = gnn_init(spec, jax.random.key(0))
cfg = optimizer_config("adam", learning_rate=1e-3)
opt_state = make_optimizer(cfg).init(params)

# --- data parallelism: one merged batch per device, psum gradients ---------
mesh = make_mesh({"data": n_dev})
batches = [GraphBatch.from_graph(
    random_graph(30, 3, 1, 2, 0.5, focus="n", rng=rng),
    node_pad=128, edge_pad=1024, target_pad=128) for _ in range(n_dev)]
stacked = shard_batches(batches, mesh)
dp_step = make_dp_train_step(spec, "mse", None, cfg, mesh)
params, bn, opt_state, iters = dp_step(params, bn, opt_state, stacked,
                                       jax.random.split(jax.random.key(1), n_dev))
print(f"DP step over {n_dev} replicas OK (iters={float(iters)})")

# --- edge-sharded propagation: one big graph, edges split across chips -----
mesh_g = make_mesh({"graph": n_dev})
big = random_graph(400, 3, 1, 2, 0.1, focus="n", rng=rng)
gb = GraphBatch.from_graph(big, edge_pad=-(-big.n_arcs // (128 * n_dev)) * 128 * n_dev)
gb_sharded = shard_edges(gb, mesh_g)
es_step = make_edge_sharded_train_step(spec, "mse", None, cfg, mesh_g)
params, bn, opt_state, iters = es_step(params, bn, opt_state, gb_sharded,
                                       jax.random.key(2))
print(f"edge-sharded step over {n_dev} shards OK (iters={float(iters)})")

# --- or first-class through the training engine ----------------------------
# model.train(gTr, ..., mesh=mesh) groups mesh["data"] batches per step
# (grads pmean over ICI); mesh_strategy='edge'/'node' keeps sequential
# per-batch updates with each batch's propagation sharded across chips.
from gnn_tpu import GNNnodeBased, MLPSpec

model = GNNnodeBased(
    net_state=MLPSpec(input_dim=7, units=(3,), activations="tanh",
                      batch_normalization=False),
    net_output=MLPSpec(input_dim=3, units=(2,), activations="softmax",
                       batch_normalization=False),
    loss_function="mse", max_iteration=5, threshold=0.01,
    path_writer="writer/multichip_engine/", seed=0)
gTr = [random_graph(30, 3, 1, 2, 0.5, focus="n", rng=rng)
       for _ in range(2 * n_dev)]
model.train(gTr, epochs=3, update_freq=1, verbose=0, mesh=mesh)
print(f"engine mesh training OK (loss {model.history['Loss Tr'][-1]:.3f})")
