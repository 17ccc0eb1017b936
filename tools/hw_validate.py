"""Hardware validation of the fused Pallas kernels (run ON THE CHIP).

Compiles and runs every kernel family on small fused-layout workloads and
compares against the XLA body (GNN_TPU_FUSED=0 semantics) computed in the
same process on the same device. Prints one PASS/FAIL line per check and a
JSON summary. Designed to be cheap on the tunnelled runtime: tiny shapes,
one process, ~8 compiles.

Run:  PYTHONUNBUFFERED=1 timeout 560 python tools/hw_validate.py
Env:  HW_CHECKS=eval1,train1,eval2,train2 (default all)
      HW_TIMING=1 (default) — after the exactness checks, time the kernel
      path vs the XLA body on a mid-size workload (chained dispatches ending
      in a real host pull, per the bench-honesty rules in NOTES_r2.md)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses

import jax
import numpy as np

from gnn_tpu.graphs.batch import from_graphs_blocked
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.models.core import GNNSpec, evaluate_single, gnn_forward, gnn_init
from gnn_tpu.ops.mlp import MLPSpec

CHECKS = os.environ.get(
    "HW_CHECKS",
    "eval1,train1,eval2,train2,bn1,bn1_nodrop,sd_train1,sd_bn1,sd_train2,"
    "bn2,bn2_nodrop,sd_bn2,typed_bn1,typed_bn1_T8,typed_bn1_nodrop,"
    "typed_sd_bn1,typed_eval,typed_eval_T8,typed_eval_nobn"
).split(",")


def workload(rng, units, activations, dropout, bn=False, sd=0):
    gs = [random_graph(int(rng.integers(8, 30)), 5, 3, 2, 0.5, focus="g",
                       rng=rng) for _ in range(12)]
    gs.insert(3, random_graph(70, 5, 3, 2, 0.2, focus="g", rng=rng))
    gbf = from_graphs_blocked(gs, block_w=32, focus="g", fused_layout=True)
    kw = (dict(dropout_rate=(0.15,), dropout_pos=(0,), alphadropout=True)
          if dropout else {})
    ss = MLPSpec(input_dim=2 * (5 + sd) + 3, units=units,
                 activations=activations,
                 kernel_initializer="lecun_normal",
                 bias_initializer="lecun_normal", batch_normalization=bn,
                 **kw)
    os_ = MLPSpec(input_dim=5 + sd, units=(2,), activations="softmax",
                  batch_normalization=False)
    spec = GNNSpec(focus="g", state_spec=ss, output_spec=os_, state_dim=sd,
                   max_iteration=4, threshold=0.01, aggregation="auto")
    params, bnst = gnn_init(spec, jax.random.key(0))
    return gbf, spec, params, bnst


def run_check(name, rng, units, activations, dropout, training, bn=False,
              sd=0):
    gbf, spec, params, bnst = workload(rng, units, activations, dropout, bn,
                                       sd)
    key = jax.random.key(7)
    t0 = time.perf_counter()

    jx = str(jax.make_jaxpr(lambda p: gnn_forward(
        spec, p, bnst, gbf, key, training=training))(params))
    if "pallas" not in jx:
        return {"name": name, "ok": False, "why": "no kernel dispatch"}

    def loss_grads(sp):
        def f(p):
            _, l, _ = evaluate_single(sp, p, bnst, gbf, key, "mse", {},
                                      training=training)
            return l
        with jax.default_matmul_precision("highest"):
            return jax.grad(f)(params)

    # kernel path (auto) vs XLA body (aggregation='blocked' ignores the
    # fused layout and runs the block-dense XLA scan — same math).
    # Exactness checks run under HIGHEST matmul precision: on TPU, XLA's
    # DEFAULT f32 dot is single-pass bf16 (~1e-2 divergence over 4
    # iterations), so at default precision the XLA body — not the kernel —
    # is the imprecise side; the kernels' hi/lo packing is ~f32-faithful
    # regardless of this config. The timing probe below keeps the
    # production default.
    xla_spec = dataclasses.replace(spec, aggregation="blocked")
    with jax.default_matmul_precision("highest"):
        r_f = gnn_forward(spec, params, bnst, gbf, key, training=training)
        r_x = gnn_forward(xla_spec, params, bnst, gbf, key, training=training)
    s_f, s_x = np.asarray(r_f["state"]), np.asarray(r_x["state"])
    fwd_err = float(np.max(np.abs(s_f - s_x)))
    it_ok = float(r_f["iters"]) == float(r_x["iters"])

    g_f, g_x = loss_grads(spec), loss_grads(xla_spec)
    grad_err = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                   for a, b in zip(jax.tree_util.tree_leaves(g_x),
                                   jax.tree_util.tree_leaves(g_f)))
    dt = time.perf_counter() - t0
    ok = fwd_err < 1e-3 and grad_err < 1e-3 and it_ok
    res = {"name": name, "ok": bool(ok), "fwd_max_abs_err": fwd_err,
           "grad_max_abs_err": grad_err, "iters_equal": bool(it_ok),
           "wall_s": round(dt, 1)}
    print(("PASS " if ok else "FAIL ") + json.dumps(res), flush=True)
    return res


def run_typed_check(name, rng, T, dropout, training=True, sd=0, bn=True):
    """Typed (composite) kernel chains (ops/pallas_typed.py) vs the dense
    type-masked XLA body (GNN_TPU_FUSED_BN=0) on the same chip. training=True
    validates the custom-VJP BN training chain (fwd + grads); training=False
    validates the round-5 EVAL chain (stacked-weight inference kernel with
    fixed per-type affines) — forward + iteration count only, since the eval
    chain has no VJP by design (serving never differentiates)."""
    from gnn_tpu.graphs.graph import Graph
    from gnn_tpu.models.composite import (CompositeGNNSpec,
                                          composite_forward, composite_init)
    from gnn_tpu.models.core import weighted_loss
    from gnn_tpu.training.losses import get_loss
    gs = []
    for _ in range(12):
        g = random_graph(int(rng.integers(8, 30)), 5, 3, 2, 0.5, focus="g",
                         rng=rng)
        g.node_types = rng.integers(0, T, g.n_nodes).astype(np.int32)
        gs.append(g)
    big = random_graph(70, 5, 3, 2, 0.2, focus="g", rng=rng)
    big.node_types = rng.integers(0, T, big.n_nodes).astype(np.int32)
    gs.insert(3, big)
    gbf = from_graphs_blocked(gs, block_w=32, focus="g")
    kw = (dict(dropout_rate=(0.15,), dropout_pos=(0,), alphadropout=True)
          if dropout else {})
    out_w = sd if sd else 5
    sss = tuple(
        MLPSpec(input_dim=2 * (5 + sd) + 3, units=(out_w,),
                activations=("selu", "tanh", "relu")[t % 3],
                kernel_initializer="lecun_normal",
                bias_initializer="lecun_normal", batch_normalization=bn,
                **kw)
        for t in range(T))
    os_ = MLPSpec(input_dim=5 + sd, units=(2,), activations="softmax",
                  batch_normalization=False)
    spec = CompositeGNNSpec(focus="g", state_specs=sss, output_spec=os_,
                            state_dim=sd, max_iteration=4, threshold=0.01)
    params, bnst = composite_init(spec, jax.random.key(0))
    if not training and bn:
        # perturb the running stats so the EVAL chain's fixed per-type
        # affine (gamma·rsqrt(var_mv+eps), beta − mean·scale) is non-trivial
        bnst = {
            "output": bnst["output"],
            "state": tuple(
                {"mean": rng.normal(0, 0.3, b["mean"].shape).astype(np.float32),
                 "var": rng.uniform(0.5, 2.0, b["var"].shape).astype(np.float32)}
                for b in bnst["state"]),
        }
    key = jax.random.key(7)
    t0 = time.perf_counter()
    jx = str(jax.make_jaxpr(lambda p: composite_forward(
        spec, p, bnst, gbf, key, training=training))(params))
    if "pallas" not in jx:
        return {"name": name, "ok": False, "why": "no kernel dispatch"}
    lf = get_loss("mse")

    def run(kernel_on):
        if kernel_on:
            os.environ.pop("GNN_TPU_FUSED_BN", None)
        else:
            os.environ["GNN_TPU_FUSED_BN"] = "0"
        try:
            def f(p):
                r = composite_forward(spec, p, bnst, gbf, key,
                                      training=training)
                return weighted_loss(lf, {}, gbf, r["out"]), r
            with jax.default_matmul_precision("highest"):
                if training:
                    (loss, r), grads = jax.value_and_grad(
                        f, has_aux=True)(params)
                else:
                    # EVAL chain: forward only — it has no VJP by design
                    loss, r = f(params)
                    grads = None
            return r, grads
        finally:
            os.environ.pop("GNN_TPU_FUSED_BN", None)

    r_x, g_x = run(False)
    r_f, g_f = run(True)
    s_f, s_x = np.asarray(r_f["state"]), np.asarray(r_x["state"])
    fwd_err = float(np.max(np.abs(s_f - s_x)))
    it_ok = float(r_f["iters"]) == float(r_x["iters"])
    if training:
        grad_err = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                       for a, b in zip(jax.tree_util.tree_leaves(g_x),
                                       jax.tree_util.tree_leaves(g_f)))
    else:
        out_err = float(np.max(np.abs(np.asarray(r_f["out"])
                                      - np.asarray(r_x["out"]))))
        grad_err = out_err  # eval chain: readout parity stands in for grads
    dt = time.perf_counter() - t0
    ok = fwd_err < 1e-3 and grad_err < 1e-3 and it_ok
    res = {"name": name, "ok": bool(ok), "fwd_max_abs_err": fwd_err,
           ("grad_max_abs_err" if training else "out_max_abs_err"): grad_err,
           "iters_equal": bool(it_ok), "wall_s": round(dt, 1)}
    print(("PASS " if ok else "FAIL ") + json.dumps(res), flush=True)
    return res


def main():
    typed_matrix = {
        "typed_bn1": dict(T=3, dropout=True),
        "typed_bn1_T8": dict(T=8, dropout=True),
        "typed_bn1_nodrop": dict(T=2, dropout=False),
        "typed_sd_bn1": dict(T=3, dropout=True, sd=4),
        # round-5 EVAL chain (inference-only, fixed per-type affines)
        "typed_eval": dict(T=3, dropout=False, training=False),
        "typed_eval_T8": dict(T=8, dropout=False, training=False),
        "typed_eval_nobn": dict(T=2, dropout=False, training=False,
                                bn=False),
    }
    matrix = {
        "eval1": dict(units=(5,), activations="selu", dropout=False,
                      training=False),
        "train1": dict(units=(5,), activations="selu", dropout=True,
                       training=True),
        "eval2": dict(units=(16, 5), activations=("selu", "tanh"),
                      dropout=False, training=False),
        "train2": dict(units=(16, 5), activations=("selu", "tanh"),
                       dropout=True, training=True),
        # the reference-DEFAULT config: trailing BatchNormalization on the
        # state net (ops/pallas_bn.py per-iteration BN kernel chain)
        "bn1": dict(units=(5,), activations="selu", dropout=True,
                    training=True, bn=True),
        "bn1_nodrop": dict(units=(5,), activations="selu", dropout=False,
                           training=True, bn=True),
        # state_dim>0 (GNN.py:261-266): labels + constant aggregations fold
        # into the kernels' feature term
        "sd_train1": dict(units=(4,), activations="selu", dropout=True,
                          training=True, sd=4),
        "sd_bn1": dict(units=(4,), activations="selu", dropout=True,
                       training=True, bn=True, sd=4),
        "sd_train2": dict(units=(16, 4), activations=("selu", "tanh"),
                          dropout=True, training=True, sd=4),
        # 2-layer + trailing BN (round 4, ops/pallas_bn.py bn2 chain): the
        # reference default BN with a hidden-layer state net (MLP.py:29-64)
        "bn2": dict(units=(16, 5), activations=("selu", "selu"),
                    dropout=True, training=True, bn=True),
        "bn2_nodrop": dict(units=(16, 5), activations=("selu", "tanh"),
                           dropout=False, training=True, bn=True),
        "sd_bn2": dict(units=(16, 4), activations=("selu", "selu"),
                       dropout=True, training=True, bn=True, sd=4),
    }
    unknown = [c for c in CHECKS if c not in matrix and c not in typed_matrix]
    if unknown:
        raise SystemExit(f"unknown HW_CHECKS entries {unknown}; "
                         f"valid: {sorted(matrix) + sorted(typed_matrix)}")
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    results = [run_typed_check(c, rng, **typed_matrix[c])
               if c in typed_matrix else run_check(c, rng, **matrix[c])
               for c in CHECKS]
    ok = bool(results) and all(r["ok"] for r in results)
    timing = {}
    if ok and os.environ.get("HW_TIMING", "1") != "0":
        timing = timing_probe(rng)
        print("timing: " + json.dumps(timing), flush=True)
    print(json.dumps({"all_ok": ok, "checks": results, "timing": timing}),
          flush=True)
    sys.exit(0 if ok else 1)


def timing_probe(rng, reps: int = 30):
    """Kernel path vs XLA body, training step on a mid-size 2-layer dropout
    workload (the config the new kernels serve). Chained calls feeding each
    step's params forward, one real host pull at the end."""
    from gnn_tpu.models.core import make_train_step, gnn_init
    gs = [random_graph(int(rng.integers(20, 60)), 5, 3, 2, 0.3, focus="g",
                       rng=rng) for _ in range(96)]
    gbf = from_graphs_blocked(gs, block_w=128, fused_layout=True)
    ss = MLPSpec(input_dim=13, units=(32, 5), activations=("selu", "tanh"),
                 kernel_initializer="lecun_normal",
                 bias_initializer="lecun_normal", batch_normalization=False,
                 dropout_rate=(0.1,), dropout_pos=(0,), alphadropout=True)
    os_ = MLPSpec(input_dim=5, units=(2,), activations="softmax",
                  batch_normalization=False)
    out = {}
    for name, agg in (("kernel", "auto"), ("xla_body", "blocked")):
        spec = GNNSpec(focus="g", state_spec=ss, output_spec=os_,
                       max_iteration=5, threshold=0.01, aggregation=agg)
        params, bn = gnn_init(spec, jax.random.key(0))
        step = make_train_step(spec, "categorical_crossentropy",
                               {"from_logits": False},
                               {"name": "adam",
                                "kwargs": {"learning_rate": 1e-3}},
                               mean=True)
        from gnn_tpu.training.optimizers import make_optimizer
        opt_state = make_optimizer({"name": "adam",
                                    "kwargs": {"learning_rate": 1e-3}}
                                   ).init(params)
        p, b, o = params, bn, opt_state
        p, b, o, it = step(p, b, o, gbf, jax.random.key(1))
        np.asarray(it)                        # compile + real pull
        t0 = time.perf_counter()
        for i in range(reps):
            p, b, o, it = step(p, b, o, gbf, jax.random.key(i + 2))
        np.asarray(p["state"]["dense_0"]["b"])
        out[f"train_ms_{name}"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 3)
    return out


if __name__ == "__main__":
    main()
