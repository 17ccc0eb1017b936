"""Simulated multi-host run: N processes on localhost, each with its own
virtual CPU devices, driving the DP training step through the real
jax.distributed runtime (parallel/multihost.py).

This validates the multi-host code path beyond compile-checking — the same
initialize / host-local loading / global-array assembly a TPU pod slice uses,
with DCN collectives replaced by the coordination-service CPU backend.

Usage (the test tests/test_multihost.py spawns this):
    python examples/multihost_sim.py --coord localhost:PORT \
        --num_processes 2 --process_id 0 --local_devices 4 --out /tmp/p0.npz
"""

import argparse
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--coord", required=True)
parser.add_argument("--num_processes", type=int, required=True)
parser.add_argument("--process_id", type=int, required=True)
parser.add_argument("--local_devices", type=int, default=4)
parser.add_argument("--steps", type=int, default=3)
parser.add_argument("--out", required=True)
args = parser.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    f"{flags} --xla_force_host_platform_device_count={args.local_devices}").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel here

import numpy as np  # noqa: E402

from gnn_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=args.coord,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
info = multihost.process_info()
assert info["process_count"] == args.num_processes, info
assert info["global_devices"] == args.num_processes * args.local_devices, info

import jax.numpy as jnp  # noqa: E402

from gnn_tpu.graphs.batch import GraphBatch, stack_batches  # noqa: E402
from gnn_tpu.graphs.datasets import random_graph  # noqa: E402
from gnn_tpu.graphs.graph import Graph  # noqa: E402
from gnn_tpu.models.core import GNNSpec, gnn_init  # noqa: E402
from gnn_tpu.ops.mlp import MLPSpec  # noqa: E402
from gnn_tpu.parallel.data_parallel import make_dp_train_step  # noqa: E402
from gnn_tpu.parallel.mesh import make_mesh  # noqa: E402
from gnn_tpu.training.optimizers import make_optimizer, optimizer_config  # noqa: E402

N_BATCHES = info["global_devices"]

# deterministic dataset — every process derives the same graphs, then
# materialises only its host-local shard (round-robin)
rng = np.random.default_rng(0)
all_graphs = [[random_graph(12, 3, 1, 2, 0.5, focus="n", rng=rng)
               for _ in range(3)] for _ in range(N_BATCHES)]
mine = multihost.host_local_batch_indices(N_BATCHES)
local_batches = [
    GraphBatch.from_graph(Graph.merge(all_graphs[i], focus="n",
                                      aggregation_mode="average"),
                          node_pad=64, edge_pad=512, target_pad=64)
    for i in mine]

mesh = make_mesh({"data": info["global_devices"]})
stacked_local = jax.tree_util.tree_map(
    lambda *xs: np.stack(xs), *local_batches)
gb = multihost.global_batch_from_local(stacked_local, mesh)

ss = MLPSpec(input_dim=7, units=(4, 3), activations="tanh",
             batch_normalization=False)
os_ = MLPSpec(input_dim=3, units=(2,), activations="softmax",
              batch_normalization=False)
spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_, max_iteration=4,
               threshold=0.01, aggregation="segment")
params, bn = gnn_init(spec, jax.random.key(0))
cfg = optimizer_config("sgd", learning_rate=0.1)
step = make_dp_train_step(spec, "mse", None, cfg, mesh)
opt_state = make_optimizer(cfg).init(params)

sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
rk = jax.random.key(7)
lo = args.process_id * args.local_devices
for s in range(args.steps):
    rk, sub = jax.random.split(rk)
    # per-replica keys: every process derives the same global split, then
    # contributes only the rows owned by its local devices (global device
    # order is process-major, so this process owns rows [lo, lo+local))
    key_rows = np.asarray(jax.random.key_data(jax.random.split(sub, N_BATCHES)))
    raw = jax.make_array_from_process_local_data(
        sharding, key_rows[lo:lo + args.local_devices])
    rngs = jax.random.wrap_key_data(raw)
    params, bn, opt_state, iters = step(params, bn, opt_state, gb, rngs)

# params are replicated — every process can read them fully
leaves = {jax.tree_util.keystr(kp): np.asarray(v)
          for kp, v in jax.tree_util.tree_leaves_with_path(params)}
np.savez(args.out, iters=float(iters), **leaves)
print(f"process {args.process_id}: OK "
      f"(global devices {info['global_devices']}, iters {float(iters)})",
      flush=True)
