"""Multi-host validation beyond compile-checking (VERDICT r1 next-round #8):
two real processes on localhost (4 virtual CPU devices each) drive the DP
step through jax.distributed / multihost.initialize / host-local loading /
global-array assembly, and the result must equal the single-process step.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "multihost_sim.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_dp_equals_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"p{i}.npz") for i in range(2)]
    env = {**os.environ, "PYTHONUNBUFFERED": "1"}
    env.pop("XLA_FLAGS", None)  # the script sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "--coord", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--local_devices", "4", "--out", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n===\n".join(logs)

    # both processes converged to identical replicated params
    a, b = np.load(outs[0]), np.load(outs[1])
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])

    # ... equal to the single-process 8-device DP run on the same data
    from gnn_tpu.graphs.batch import GraphBatch
    from gnn_tpu.graphs.datasets import random_graph
    from gnn_tpu.graphs.graph import Graph
    from gnn_tpu.models.core import GNNSpec, gnn_init
    from gnn_tpu.ops.mlp import MLPSpec
    from gnn_tpu.parallel.data_parallel import make_dp_train_step, shard_batches
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.training.optimizers import make_optimizer, optimizer_config

    rng = np.random.default_rng(0)
    all_graphs = [[random_graph(12, 3, 1, 2, 0.5, focus="n", rng=rng)
                   for _ in range(3)] for _ in range(8)]
    # reproduce the multi-host global order: proc0's round-robin picks first
    order = [0, 2, 4, 6, 1, 3, 5, 7]
    batches = [GraphBatch.from_graph(
        Graph.merge(all_graphs[i], focus="n", aggregation_mode="average"),
        node_pad=64, edge_pad=512, target_pad=64) for i in order]
    mesh = make_mesh({"data": 8})
    gb = shard_batches(batches, mesh)
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
    rk = jax.random.key(7)
    for _ in range(3):
        rk, sub = jax.random.split(rk)
        rngs = jax.random.split(sub, 8)
        rngs = jax.device_put(rngs, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")))
        params, bn, opt_state, iters = step(params, bn, opt_state, gb, rngs)

    ref = {jax.tree_util.keystr(kp): np.asarray(v)
           for kp, v in jax.tree_util.tree_leaves_with_path(params)}
    for k, v in ref.items():
        np.testing.assert_allclose(a[k], v, atol=1e-6, err_msg=k)
    assert float(a["iters"]) == float(iters)
