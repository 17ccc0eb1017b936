"""Large-graph scale sweep: edges/s on one chip as the merged workload grows.

The reference's scaling story stops at MUTAG (131k nodes / 267k edges in one
merged graph). This sweep measures the production path (blocked fused-layout
batches, aggregation='auto' -> looped Pallas kernels) on synthetic merged
workloads up to ~8x that size, reporting forward and BN-free dropout-training
step times with bench.py's trustworthy pattern (chained state, fresh rng per
step, one real device->host pull at the end — NOTES_r1.md timing rules).

Run on the chip:  PYTHONUNBUFFERED=1 python benchmarks/scale_sweep.py
Env: SWEEP_NODES="131072,524288,1048576"  SWEEP_STEPS=50
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

SIZES = [int(s) for s in os.environ.get(
    "SWEEP_NODES", "131072,524288,1048576").split(",")]
STEPS = int(os.environ.get("SWEEP_STEPS", "50"))


def build_workload(n_target: int):
    """Merged batch of MUTAG-shaped random graphs totalling ~n_target nodes
    (graphs of 15-45 nodes, degree ~4 — the disjoint-union production shape).
    Cheap arrays, no dataset machinery: the sweep measures kernels, not IO."""
    from gnn_tpu.graphs.batch import from_graphs_blocked
    from gnn_tpu.graphs.graph import Graph

    rng = np.random.default_rng(0)
    nl, al, dt = 14, 3, 2
    gs, total = [], 0
    while total < n_target:
        n = int(rng.integers(15, 46))
        e = 4 * n
        arcs = np.concatenate(
            [rng.integers(0, n, (e, 1)), rng.integers(0, n, (e, 1)),
             rng.random((e, al)).astype(np.float32)], axis=1)
        nodes = rng.random((n, nl)).astype(np.float32)
        targ = np.zeros((1, dt), np.float32)
        targ[0, rng.integers(0, dt)] = 1
        gs.append(Graph(arcs=arcs, nodes=nodes, targets=targ, focus="g",
                        aggregation_mode="average"))
        total += n
    return from_graphs_blocked(gs, block_w=128, fused_layout=True)


def main():
    from gnn_tpu.models.core import (GNNSpec, gnn_init, make_eval_step,
                                     make_train_loop)
    from gnn_tpu.ops.mlp import MLPSpec, get_inout_dims
    from gnn_tpu.training.optimizers import make_optimizer, optimizer_config

    in_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0, None)
    in_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0, None)
    state_spec = MLPSpec(input_dim=in_s, units=tuple(layers_s),
                         activations="selu", kernel_initializer="lecun_normal",
                         bias_initializer="lecun_normal",
                         dropout_rate=(0.1,), dropout_pos=(0,),
                         alphadropout=True, batch_normalization=False)
    out_spec = MLPSpec(input_dim=in_o, units=tuple(layers_o),
                       activations="softmax", batch_normalization=False,
                       dropout_rate=(0.1,), dropout_pos=(0,))
    spec = GNNSpec(focus="g", state_spec=state_spec, output_spec=out_spec,
                   state_dim=0, max_iteration=5, threshold=0.01,
                   aggregation="auto")
    cfg = optimizer_config("adam", learning_rate=1e-3)
    opt = make_optimizer(cfg)
    train_n = make_train_loop(spec, "categorical_crossentropy",
                              {"from_logits": False}, cfg, mean=True,
                              n_steps=STEPS)
    ev = make_eval_step(spec, "categorical_crossentropy",
                        {"from_logits": False})

    def pull(x):
        return np.asarray(x)

    for n_target in SIZES:
        gb = build_workload(n_target)
        E = int(np.asarray(gb.n_real)[1])
        N = int(np.asarray(gb.n_real)[0])
        params, bn = gnn_init(spec, jax.random.key(0))
        o = opt.init(params)

        p, b, oo, iters = train_n(params, bn, o, gb, jax.random.key(1))
        pull(iters)
        it = float(np.mean(np.asarray(iters)))
        t0 = time.perf_counter()
        p, b, oo, iters = train_n(p, b, oo, gb, jax.random.key(2))
        pull(p["state"]["dense_0"]["b"])
        train_dt = (time.perf_counter() - t0) / STEPS

        out = ev(p, b, gb, jax.random.key(3))
        pull(out[1])
        t0 = time.perf_counter()
        for i in range(10):
            out = ev(p, b, gb, jax.random.key(i))
        pull(out[1])
        fwd_dt = (time.perf_counter() - t0) / 10
        it_fwd = float(out[0])  # eval's own realised count (dropout off)

        print(json.dumps({
            "nodes": N, "edges": E,
            "train_step_ms": round(train_dt * 1e3, 2),
            "train_edges_per_s": round(E * it / train_dt),
            "forward_ms": round(fwd_dt * 1e3, 2),
            "forward_edges_per_s": round(E * it_fwd / fwd_dt),
            "iters": it, "iters_fwd": it_fwd,
        }), flush=True)


if __name__ == "__main__":
    main()
