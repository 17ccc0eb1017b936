#!/usr/bin/env python
"""Measured decision: does the composite (heterogeneous) family need its own
Pallas kernels, or is the dense type-masked XLA body already the right call
at realistic type counts? (VERDICT r3 next-round #7.)

Workload: the MUTAG merge (bench.py flagship shapes, graph focus, selu state
net, K=5) with synthetic uniform node types, T in {1, 2, 4, 8} — the type
counts of real heterogeneous datasets. Each T times the scanned composite
training step (dense XLA body: every type's MLP over all rows, rows selected
by type mask — models/composite.py design note) on the chip; the homogeneous
KERNEL-path train step on the identical graph is the reference row (what a
composite kernel family could at best approach at T=1).

Prints one JSON line; run on the TPU (do NOT set platforms to cpu).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MUTAG_PATH = os.environ.get("MUTAG_PATH", "/root/reference/MUTAG_raw/")
SCAN_STEPS = int(os.environ.get("BENCH_SCAN_STEPS", "50"))
TYPE_COUNTS = tuple(int(t) for t in
                    os.environ.get("BENCH_TYPES", "1,2,4,8").split(","))


def main():
    import jax
    import jax.numpy as jnp
    from gnn_tpu.graphs.batch import from_graphs_blocked
    from gnn_tpu.graphs.datasets import load_mutag
    from gnn_tpu.models.composite import (CompositeGNNSpec, composite_forward,
                                          composite_init,
                                          composite_regularization)
    from gnn_tpu.models.core import (GNNSpec, gnn_init, make_train_loop,
                                     weighted_loss)
    from gnn_tpu.ops.mlp import MLPSpec, get_inout_dims
    from gnn_tpu.training.losses import get_loss
    from gnn_tpu.training.optimizers import make_optimizer, optimizer_config

    graphs = load_mutag(MUTAG_PATH)
    rng = np.random.default_rng(0)
    nl, al, dt = graphs[0].nodes.shape[1], graphs[0].arcs.shape[1] - 2, 2
    in_s, layers_s = get_inout_dims("state", nl, al, dt, "g", 0, None)
    in_o, layers_o = get_inout_dims("output", nl, al, dt, "g", 0, None)

    def state_spec():
        return MLPSpec(input_dim=in_s, units=tuple(layers_s),
                       activations="selu", kernel_initializer="lecun_normal",
                       bias_initializer="lecun_normal",
                       dropout_rate=(0.1,), dropout_pos=(0,),
                       alphadropout=True)

    out_spec = MLPSpec(input_dim=in_o, units=tuple(layers_o),
                       activations="softmax",
                       kernel_initializer="glorot_normal",
                       bias_initializer="glorot_normal",
                       dropout_rate=(0.1,), dropout_pos=(0,))
    cfg = optimizer_config("adam", learning_rate=1e-3)
    lf = get_loss("categorical_crossentropy")
    la = {"from_logits": False}

    def pull(x):
        return np.asarray(x)

    def time_loop(loop, p, b, o, gb, leaf):
        p2, b2, o2, it = loop(p, b, o, gb, jax.random.key(1))
        pull(it)                                     # compile + warmup
        dt = float("inf")
        for j in range(2):
            t0 = time.perf_counter()
            p2, b2, o2, it = loop(p, b, o, gb, jax.random.key(j + 2))
            pull(leaf(p2))
            dt = min(dt, (time.perf_counter() - t0) / SCAN_STEPS)
        return dt * 1e3, float(np.mean(np.asarray(it)))

    results = {}
    do_train = os.environ.get("BENCH_TRAIN", "1") != "0"
    do_eval = os.environ.get("BENCH_EVAL", "1") != "0"

    # homogeneous kernel-path reference row (identical graph, T=1 math)
    hspec = GNNSpec(focus="g", state_spec=state_spec(), output_spec=out_spec,
                    state_dim=0, max_iteration=5, threshold=0.01,
                    aggregation="auto")
    hp, hb = gnn_init(hspec, jax.random.key(0))
    gb_fused = from_graphs_blocked(graphs, block_w=128, fused_layout=True)
    if do_train:
        opt = make_optimizer(cfg)
        loop = make_train_loop(hspec, "categorical_crossentropy", la, cfg,
                               mean=True, n_steps=SCAN_STEPS)
        ms, iters = time_loop(loop, hp, hb, opt.init(hp), gb_fused,
                              lambda p: p["state"]["dense_0"]["b"])
        results["homogeneous_kernel_ms"] = round(ms, 3)
        print(f"homogeneous kernel path: {ms:.3f} ms/step (iters {iters})",
              file=sys.stderr, flush=True)

    # composite body at T types (type-masked design). Types are drawn
    # per-T from [0, T) so every node's type has a live state net — at
    # T < max(TYPE_COUNTS) a shared draw would leave out-of-range nodes
    # permanently inert, skewing iteration counts and making the T=1 row
    # not comparable to the homogeneous reference row (ADVICE r4).
    def typed_batch(T):
        rng = np.random.default_rng(7)
        typed = []
        for g in graphs:
            tg = type(g)(nodes=g.nodes, arcs=g.arcs, targets=g.targets,
                         focus=g.focus, set_mask=g.set_mask,
                         output_mask=g.output_mask, node_graph=g.NodeGraph,
                         sample_weights=g.sample_weights,
                         aggregation_mode=g.aggregation_mode,
                         node_types=rng.integers(0, T,
                                                 g.n_nodes).astype(np.int32))
            typed.append(tg)
        return from_graphs_blocked(typed, block_w=128)

    def time_eval_composite(use_kernel, cspec, cp, cb, gb_t):
        """Scanned EVAL forward: typed kernel chain vs type-masked XLA body
        (GNN_TPU_FUSED_BN=0 set through tracing — env is read at trace)."""
        if use_kernel:
            os.environ.pop("GNN_TPU_FUSED_BN", None)
        else:
            os.environ["GNN_TPU_FUSED_BN"] = "0"
        try:
            @jax.jit
            def floop(p, b, gb, key):
                def ebody(carry, k):
                    res = composite_forward(cspec, p, b, gb, k,
                                            training=False)
                    return carry, res["iters"]
                _, its = jax.lax.scan(ebody, 0,
                                      jax.random.split(key, SCAN_STEPS))
                return its
            pull(floop(cp, cb, gb_t, jax.random.key(1)))   # compile+warmup
            dt = float("inf")
            for j in range(2):
                t0 = time.perf_counter()
                its = floop(cp, cb, gb_t, jax.random.key(j + 2))
                pull(its)
                dt = min(dt, (time.perf_counter() - t0) / SCAN_STEPS)
            return dt * 1e3
        finally:
            os.environ.pop("GNN_TPU_FUSED_BN", None)

    if do_eval:
        # homogeneous EVAL reference row (eval kernels, ops/pallas_fused.py)
        from gnn_tpu.models.core import gnn_forward

        @jax.jit
        def hloop(p, b, gb, key):
            def ebody(carry, k):
                res = gnn_forward(hspec, p, b, gb, k, training=False)
                return carry, res["iters"]
            _, its = jax.lax.scan(ebody, 0, jax.random.split(key, SCAN_STEPS))
            return its
        pull(hloop(hp, hb, gb_fused, jax.random.key(1)))
        dt = float("inf")
        for j in range(2):
            t0 = time.perf_counter()
            its = hloop(hp, hb, gb_fused, jax.random.key(j + 2))
            pull(its)
            dt = min(dt, (time.perf_counter() - t0) / SCAN_STEPS)
        results["homogeneous_eval_ms"] = round(dt * 1e3, 3)
        print(f"homogeneous eval: {dt * 1e3:.3f} ms/step",
              file=sys.stderr, flush=True)

    for T in TYPE_COUNTS:
        gb_t = typed_batch(T)
        cspec = CompositeGNNSpec(
            focus="g", state_specs=tuple(state_spec() for _ in range(T)),
            output_spec=out_spec, max_iteration=5, threshold=0.01,
            aggregation="auto")
        cp, cb = composite_init(cspec, jax.random.key(0))
        if do_eval:
            ek = time_eval_composite(True, cspec, cp, cb, gb_t)
            ex = time_eval_composite(False, cspec, cp, cb, gb_t)
            results[f"composite_eval_T{T}_ms"] = round(ek, 3)
            results[f"composite_eval_xla_T{T}_ms"] = round(ex, 3)
            print(f"composite eval T={T}: typed {ek:.3f} / xla {ex:.3f} "
                  f"ms/step", file=sys.stderr, flush=True)
        if not do_train:
            continue
        opt = make_optimizer(cfg)

        def body(carry, key, cspec=cspec, opt=opt):
            p, b, o = carry

            def loss_fn(pp):
                res = composite_forward(cspec, pp, b, gb_t, key,
                                        training=True)
                loss = weighted_loss(lf, la, gb_t, res["out"])
                return (loss + composite_regularization(cspec, pp),
                        (res["iters"], res["bn"]))

            grads, (it, nb) = jax.grad(loss_fn, has_aux=True)(p)
            denom = jnp.maximum(it, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
            upd, o = opt.update(grads, o, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
            return (p, nb, o), it

        @jax.jit
        def sloop(p, b, o, gb, key):
            (p, b, o), its = jax.lax.scan(body, (p, b, o),
                                          jax.random.split(key, SCAN_STEPS))
            return p, b, o, its

        ms, iters = time_loop(sloop, cp, cb, opt.init(cp), gb_t,
                              lambda p: p["state"][0]["dense_0"]["b"])
        results[f"composite_T{T}_ms"] = round(ms, 3)
        print(f"composite T={T}: {ms:.3f} ms/step (iters {iters})",
              file=sys.stderr, flush=True)

    out = {"metric": "composite_train_ms", "unit": "ms/step",
           "scan_steps": SCAN_STEPS, **results}
    path = os.environ.get("COMPOSITE_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
