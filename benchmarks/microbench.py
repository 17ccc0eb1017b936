#!/usr/bin/env python
"""Aggregation-strategy microbenchmarks on the MUTAG merged-graph workload.

Usage:  python benchmarks/microbench.py [segment|onehot|pallas|blockdense|all]

Compares the hot op (state aggregation A^T @ S) across:
  segment    — jnp.take + jax.ops.segment_sum (XLA scatter)
  pallas     — ops/pallas_segment v1 chunk-grid kernel
  blockdense — graph-aligned [B, W, W] batched MXU matmul (+ residual)
and times the full model forward / training step on blocked batches.

Keep inputs DEVICE-RESIDENT when timing: re-uploading per call measures the
host link, not the chip (the axon tunnel moves ~33 MB/s).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

MUTAG = "/root/reference/MUTAG_raw/"


def timeit(f, x, name, n=20):
    y = f(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / n
    return dt


def main(which="all"):
    from gnn_tpu.graphs.datasets import load_mutag
    from gnn_tpu.graphs.graph import Graph

    graphs = load_mutag(MUTAG)
    merged = Graph.merge(graphs, focus="g", aggregation_mode="average")
    E = merged.n_arcs
    N = -(-merged.n_nodes // 256) * 256
    D = 14
    rng = np.random.default_rng(0)
    state = jax.device_put(jnp.asarray(rng.standard_normal((N, D)).astype(np.float32)))
    src = jnp.asarray(merged.src)
    dst = jnp.asarray(merged.dst)
    w = jnp.asarray(merged.edge_weights())

    results = {}
    if which in ("segment", "all"):
        f = jax.jit(lambda s: jax.ops.segment_sum(
            jnp.take(s, src, axis=0) * w[:, None], dst, num_segments=N))
        dt = timeit(f, state, "segment")
        results["segment"] = dt
    if which in ("pallas", "all"):
        from gnn_tpu.ops.pallas_segment import block_aggregate, build_agg_plan
        plans = build_agg_plan(np.asarray(src), np.asarray(dst), np.asarray(w), N)
        f = jax.jit(lambda s: block_aggregate(s, plans))
        results["pallas_v1"] = timeit(f, state, "pallas")
    if which in ("blockdense", "all"):
        from gnn_tpu.graphs.batch import from_graphs_blocked
        gb = from_graphs_blocked(graphs, block_w=128)
        Bb, Wb, _ = gb.adj_blocks.shape
        Np = gb.n_node_pad
        st2 = jax.device_put(jnp.asarray(
            rng.standard_normal((Np, D)).astype(np.float32)))
        f = jax.jit(lambda s: jax.lax.dot_general(
            gb.adj_blocks, s.reshape(Bb, Wb, -1), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).reshape(Np, -1))
        results["blockdense"] = timeit(f, st2, "blockdense")

    for k, dt in results.items():
        print(f"{k:12s}: {dt * 1e3:8.3f} ms  {E / dt / 1e6:8.0f} M edges/s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
