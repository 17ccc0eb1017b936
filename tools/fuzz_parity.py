"""Differential fuzz: random model/batch configs, three independent
compute paths, assert they agree.

Per trial a random config (focus, 1/2-layer state net, activations,
dropout, BN, threshold, block width, graph mix incl. over-block graphs) is
evaluated through:

  A. 'segment' aggregation on a plain merged GraphBatch  (index-vector path)
  B. 'blocked' aggregation on a block-dense batch        (XLA bmm body)
  C. 'auto'    aggregation on a fused-layout batch       (Pallas kernels,
                                                          interpret on CPU)

Forward outputs, realised iteration counts and full-loss gradients must
agree (training mode too, where the bernoulli streams are bit-shared).
Failures print the reproducing trial seed.

Run: python tools/fuzz_parity.py            (N=40 trials by default)
Env: FUZZ_N=200  FUZZ_SEED=0
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.batch import GraphBatch, from_graphs_blocked
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.models.core import (GNNSpec, evaluate_single, gnn_forward,
                                 gnn_init)
from gnn_tpu.ops.mlp import MLPSpec

N = int(os.environ.get("FUZZ_N", "40"))
SEED = int(os.environ.get("FUZZ_SEED", "0"))
ACTS = ("tanh", "relu", "selu", "linear")


def build_trial(seed: int):
    rng = np.random.default_rng(seed)
    focus = rng.choice(["n", "a", "g"])
    nl, al, dt = int(rng.integers(2, 7)), int(rng.integers(1, 4)), 2
    n_graphs = int(rng.integers(5, 13))
    W = int(rng.choice([16, 32]))
    gs = [random_graph(int(rng.integers(6, 26)), nl, al, dt, 0.5,
                       focus=focus, rng=rng) for _ in range(n_graphs)]
    if rng.random() < 0.5:   # over-block graph -> residual/dep structure
        gs.insert(1, random_graph(int(W * 2.2), nl, al, dt, 0.25,
                                  focus=focus, rng=rng))
    two = bool(rng.random() < 0.5)
    h = int(rng.integers(5, 24))
    units = (h, nl) if two else (nl,)
    acts = tuple(rng.choice(ACTS) for _ in units)
    drop = bool(rng.random() < 0.5)
    bn = bool(rng.random() < 0.3)
    kw = (dict(dropout_rate=(float(rng.choice([0.1, 0.2])),),
               dropout_pos=(0,), alphadropout=bool(rng.random() < 0.5))
          if drop else {})
    ss = MLPSpec(input_dim=2 * nl + al, units=units, activations=acts,
                 kernel_initializer="glorot_normal",
                 bias_initializer="glorot_normal",
                 batch_normalization=bn, **kw)
    o_in = {"n": nl, "g": nl, "a": 2 * nl + al}[focus]
    os_ = MLPSpec(input_dim=o_in, units=(dt,), activations="softmax",
                  batch_normalization=False)
    spec = GNNSpec(focus=focus, state_spec=ss, output_spec=os_,
                   max_iteration=int(rng.integers(3, 6)),
                   threshold=float(rng.choice([0.0, 0.01, 0.5])),
                   aggregation="auto")
    merged = Graph.merge(gs, focus=focus,
                         aggregation_mode=str(rng.choice(
                             ["sum", "normalized", "average"])))
    gb_seg = GraphBatch.from_graph(merged)
    gb_blk = from_graphs_blocked(gs, block_w=W, focus=focus,
                                 aggregation_mode=merged.aggregation_mode)
    gb_fus = from_graphs_blocked(gs, block_w=W, focus=focus,
                                 aggregation_mode=merged.aggregation_mode,
                                 fused_layout=True)
    params, bnst = gnn_init(spec, jax.random.key(seed))
    return spec, params, bnst, gb_seg, gb_blk, gb_fus


def run_trial(seed: int, training: bool):
    spec, params, bnst, gb_seg, gb_blk, gb_fus = build_trial(seed)
    key = jax.random.key(seed + 1)
    seg_spec = dataclasses.replace(spec, aggregation="segment")
    blk_spec = dataclasses.replace(spec, aggregation="blocked")
    paths = [("segment", seg_spec, gb_seg), ("blocked", blk_spec, gb_blk),
             ("auto", spec, gb_fus)]
    if training and spec.state_spec.dropout_rate:
        # dropout masks are drawn over the padded node geometry, which
        # differs between the merged and block-packed containers — only the
        # same-geometry blocked vs fused comparison is meaningful
        paths = paths[1:]
    outs, iters, grads = {}, {}, {}
    for name, sp, gb in paths:
        r = gnn_forward(sp, params, bnst, gb, key, training=training)
        sel = np.asarray(gb.sel_mask)
        outs[name] = np.asarray(r["out"])[sel]
        iters[name] = float(r["iters"])

        def loss_of(p, sp=sp, gb=gb):
            _, l, _ = evaluate_single(sp, p, bnst, gb, key, "mse", {},
                                      training=training)
            return l

        grads[name] = jax.grad(loss_of)(params)
    ref = paths[0][0]
    for name, _, _ in paths[1:]:
        if iters[name] != iters[ref]:
            raise AssertionError(
                f"iters mismatch {name}={iters[name]} vs {ref}={iters[ref]}")
        np.testing.assert_allclose(outs[name], outs[ref], atol=2e-4,
                                   err_msg=f"outputs {name} vs {ref}")
        for a, b in zip(jax.tree_util.tree_leaves(grads[ref]),
                        jax.tree_util.tree_leaves(grads[name])):
            a, b = np.asarray(a), np.asarray(b)
            # hi/lo-emulation rounding is relative to the LEAF's scale, not
            # elementwise — near-zero entries of large-magnitude leaves pick
            # up absolute noise proportional to the leaf maximum
            scale = max(1.0, float(np.max(np.abs(a))))
            np.testing.assert_allclose(b, a, rtol=5e-3, atol=2e-4 * scale,
                                       err_msg=f"grads {name} vs {ref}")


def main():
    failures = []
    t0 = time.perf_counter()
    for i in range(N):
        seed = SEED * 100003 + i
        for training in (False, True):
            try:
                run_trial(seed, training)
            except Exception:
                failures.append((seed, training))
                print(f"FAIL seed={seed} training={training}", flush=True)
                traceback.print_exc(limit=3)
        if (i + 1) % 5 == 0:
            print(f"[{i + 1}/{N}] ok so far: {2 * (i + 1) - len(failures)}"
                  f"/{2 * (i + 1)} ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
    print(f"\n{2 * N - len(failures)}/{2 * N} trial-modes passed; "
          f"failures: {failures}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
