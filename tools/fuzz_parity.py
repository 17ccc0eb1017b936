"""Differential fuzz: random model/batch configs, three independent
compute paths, assert they agree.

Per trial a random config is evaluated through:

  A. 'segment' aggregation on a plain merged GraphBatch  (index-vector path)
  B. 'blocked' aggregation on a block-dense batch        (XLA bmm body)
  C. 'auto'    aggregation on a fused-layout batch       (Pallas kernels,
                                                          interpret on CPU)

Forward outputs, realised iteration counts and full-loss gradients must
agree (training mode too, where the bernoulli streams are bit-shared).
Failures print the reproducing trial seed.

Trial kinds (drawn per seed), covering every dispatch branch of
core.propagate plus the stacked/heterogeneous families:

  gnn        homogeneous single GNN: focus, 1/2-layer state net, random
             activations, dropout, BN (incl. the pallas_bn training loop),
             threshold, block width, over-block graphs; sub-knobs add
             state_dim>0 (GNN.py:261-266), grad_mode='ift' (implicit
             adjoint — compared IFT-vs-IFT across paths), and
             state_dtype='bfloat16' (looser tolerance: bf16 rounding is
             amplified differently by each path's op order)
  lgnn       2-3 layer stacks, serial-augmentation geometry via
             update_graph_batch, parallel/residual loss formulations
  composite  heterogeneous per-type state nets on typed graphs

Run: python tools/fuzz_parity.py            (N=40 trials by default)
Env: FUZZ_N=200  FUZZ_SEED=0  FUZZ_KINDS=gnn,lgnn,composite
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from gnn_tpu.graphs.batch import GraphBatch, from_graphs_blocked
from gnn_tpu.graphs.datasets import random_graph
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.models.core import (GNNSpec, evaluate_single, gnn_forward,
                                 gnn_init)
from gnn_tpu.ops.mlp import MLPSpec

N = int(os.environ.get("FUZZ_N", "40"))
SEED = int(os.environ.get("FUZZ_SEED", "0"))
KINDS = os.environ.get("FUZZ_KINDS", "gnn,lgnn,composite").split(",")
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
    sd = int(rng.choice([0, 0, 0, 2, 4]))        # state_dim>0: GNN.py:261-266
    drop = bool(rng.random() < 0.5)
    ift = bool(rng.random() < 0.2) and not drop
    bf16 = bool(rng.random() < 0.15)
    out_dim = sd if sd else nl
    units = (h, out_dim) if two else (out_dim,)
    acts = tuple(rng.choice(ACTS) for _ in units)
    bn = bool(rng.random() < 0.3)
    kw = (dict(dropout_rate=(float(rng.choice([0.1, 0.2])),),
               dropout_pos=(0,), alphadropout=bool(rng.random() < 0.5))
          if drop else {})
    ss = MLPSpec(input_dim=2 * (nl + sd) + al, units=units, activations=acts,
                 kernel_initializer="glorot_normal",
                 bias_initializer="glorot_normal",
                 batch_normalization=bn, **kw)
    comp = nl + sd if sd else nl
    o_in = {"n": comp, "g": comp, "a": 2 * comp + al}[focus]
    os_ = MLPSpec(input_dim=o_in, units=(dt,), activations="softmax",
                  batch_normalization=False)
    spec = GNNSpec(focus=focus, state_spec=ss, output_spec=os_,
                   state_dim=sd,
                   max_iteration=int(rng.integers(3, 6)),
                   threshold=float(rng.choice([0.0, 0.01, 0.5])),
                   aggregation="auto",
                   grad_mode="ift" if ift else "unroll",
                   state_dtype="bfloat16" if bf16 else None)
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


_DISCONTINUOUS_ACTS = ("relu", "selu")  # derivative jumps at x == 0


def _has_kink(activations) -> bool:
    acts = ((activations,) if isinstance(activations, str) else activations)
    return any(str(a) in _DISCONTINUOUS_ACTS for a in acts)


class _MarginSpy:
    """Context manager: patch the discontinuous activations to record the
    minimum |pre-activation| seen during an eagerly-executed forward. A
    margin below the compared paths' rounding scale means the derivative
    BRANCH can differ between paths — the gradient comparison is then a
    comparison of two valid subgradients at indistinguishable points, not
    a correctness check (campaign finding: lgnn seed 300015 had a relu
    pre-activation of 1.07e-6; the kernels' ~1e-5-relative forward rounding
    flipped the branch, moving one grad leaf by 0.014 while the f32 XLA
    body matched an f64 rerun to 5e-7)."""

    def __init__(self):
        self.margin = np.inf

    def __enter__(self):
        from gnn_tpu.ops import mlp as _mlp
        self._mlp = _mlp
        self._saved = {k: _mlp._ACTIVATIONS[k] for k in _DISCONTINUOUS_ACTS}

        def make(f):
            def spy(x):
                a = np.asarray(x)
                if a.size:
                    self.margin = min(self.margin, float(np.min(np.abs(a))))
                return f(x)
            return spy

        for k, f in self._saved.items():
            self._mlp._ACTIVATIONS[k] = make(f)
        self._nojit = jax.disable_jit()
        self._nojit.__enter__()
        return self

    def __exit__(self, *exc):
        self._nojit.__exit__(*exc)
        self._mlp._ACTIVATIONS.update(self._saved)
        return False


def _compare(paths, outs, iters, grads, atol, rtol, state_scale=1.0,
             branch_margin=np.inf, ift=False):
    # un-normalised random weights can blow the state fixed point up to
    # O(100s); the kernels' hi/lo rounding is RELATIVE to that scale, so the
    # output tolerance must track it (seed-6 finding: 820-magnitude states,
    # 7e-6 relative kernel rounding, tripping a fixed 2e-4 atol)
    atol_out = max(atol, 1e-5 * state_scale)
    # derivative-branch flips: if any relu/selu pre-activation sits within
    # the paths' rounding distance of its kink, grads (and, through the
    # flipped unit's downstream weights, outputs) legitimately differ by
    # that unit's full contribution. The rounding scale is bf16-class when
    # the caller passed a bf16-class atol, else the kernels' hi/lo class.
    rounding_rel = 8e-3 if atol >= 1e-2 else 1e-4
    flip_risk = branch_margin < rounding_rel * max(1.0, state_scale)
    if flip_risk:
        atol_out = max(atol_out, 5e-2 if atol >= 1e-2 else 2e-2)
    # implicit-adjoint trials: the Neumann solve (I - J^T)^-1 amplifies
    # forward rounding by 1/(1-rho); near-unit spectral radius turned the
    # kernels' 3.7e-5 forward rounding into a systematic 0.57% grad shift
    # (campaign seed 300044: grad leaves O(1e5) from O(0.6) outputs). The
    # XLA bodies still agree to ~1e-5 relative — only the kernel comparison
    # carries the amplified rounding.
    if ift:
        rtol = max(rtol, 2e-2)
    # noise floor for grads is TREE-wide, not per-leaf: leaves that are
    # mathematically zero (a dense bias feeding a trailing BN cancels
    # exactly) pick up cancellation noise proportional to their SIBLINGS'
    # magnitudes through the shared forward intermediates (campaign seeds
    # 500044/700041: ~1e-3 noise on an exact-zero bias grad while BN-param
    # grads ran O(1e4))
    tree_scale = max([1.0] + [float(np.max(np.abs(np.asarray(l))))
                              for g in grads.values()
                              for l in jax.tree_util.tree_leaves(g)
                              if np.asarray(l).size])
    ref = paths[0][0]
    for name, _, _ in paths[1:]:
        if iters[name] != iters[ref]:
            raise AssertionError(
                f"iters mismatch {name}={iters[name]} vs {ref}={iters[ref]}")
        np.testing.assert_allclose(outs[name], outs[ref], atol=atol_out,
                                   err_msg=f"outputs {name} vs {ref}")
        if flip_risk and atol >= 1e-2:
            # bf16 rounding (8e-3 relative) vs a near-kink pre-activation:
            # whole relu units take different branches per path, shifting
            # entire grad columns by the unit's downstream contribution —
            # elementwise gradient agreement is not a property that holds.
            # Outputs and iteration counts above remain the check.
            continue
        for a, b in zip(jax.tree_util.tree_leaves(grads[ref]),
                        jax.tree_util.tree_leaves(grads[name])):
            a, b = np.asarray(a), np.asarray(b)
            g_rtol, g_atol = rtol, atol * tree_scale
            if state_scale > 50.0 or flip_risk:
                # exploding (non-contractive) fixed points or near-kink
                # pre-activations: isolated grad elements legitimately
                # diverge — keep a loose sanity band instead of
                # elementwise exactness
                g_rtol = max(g_rtol, 0.1)
                g_atol = max(g_atol, 1e-3 * max(state_scale, tree_scale))
            np.testing.assert_allclose(b, a, rtol=g_rtol, atol=g_atol,
                                       err_msg=f"grads {name} vs {ref}")


def run_trial(seed: int, training: bool):
    spec, params, bnst, gb_seg, gb_blk, gb_fus = build_trial(seed)
    key = jax.random.key(seed + 1)
    seg_spec = dataclasses.replace(spec, aggregation="segment")
    blk_spec = dataclasses.replace(spec, aggregation="blocked")
    paths = [("segment", seg_spec, gb_seg), ("blocked", blk_spec, gb_blk),
             ("auto", spec, gb_fus)]
    if (training and spec.state_spec.dropout_rate) or spec.state_dim > 0:
        # dropout masks and the random state0 (state_dim>0) are drawn over
        # the padded node geometry, which differs between the merged and
        # block-packed containers — only the same-geometry blocked vs fused
        # comparison is meaningful
        paths = paths[1:]
    outs, iters, grads = {}, {}, {}
    state_scale = 1.0
    for name, sp, gb in paths:
        r = gnn_forward(sp, params, bnst, gb, key, training=training)
        sel = np.asarray(gb.sel_mask)
        outs[name] = np.asarray(r["out"])[sel]
        iters[name] = float(r["iters"])
        state_scale = max(state_scale, float(np.max(np.abs(
            np.asarray(r["state"], dtype=np.float32)))))

        def loss_of(p, sp=sp, gb=gb):
            _, l, _ = evaluate_single(sp, p, bnst, gb, key, "mse", {},
                                      training=training)
            return l

        grads[name] = jax.grad(loss_of)(params)
    # bf16 state-carry: rounding is amplified differently by each path's op
    # order — tolerance is bf16-class, not f32-class
    atol, rtol = ((2e-2, 5e-2) if spec.state_dtype == "bfloat16"
                  else (2e-4, 5e-3))
    margin = np.inf
    if _has_kink(spec.state_spec.activations):
        name0, sp0, gb0 = paths[0]
        with _MarginSpy() as spy:
            gnn_forward(sp0, params, bnst, gb0, key, training=training)
        margin = spy.margin
    _compare(paths, outs, iters, grads, atol, rtol, state_scale,
             branch_margin=margin, ift=spec.grad_mode == "ift")


def build_lgnn_trial(seed: int):
    from gnn_tpu.models.lgnn import _lgnn_loss, lgnn_forward
    rng = np.random.default_rng(seed)
    focus = rng.choice(["n", "a", "g"])
    nl, al, dt = int(rng.integers(2, 6)), int(rng.integers(1, 3)), 2
    W = int(rng.choice([16, 32]))
    gs = [random_graph(int(rng.integers(6, 22)), nl, al, dt, 0.5,
                       focus=focus, rng=rng) for _ in range(int(rng.integers(4, 9)))]
    if rng.random() < 0.5:
        gs.insert(1, random_graph(int(W * 2.2), nl, al, dt, 0.25,
                                  focus=focus, rng=rng))
    n_layers = int(rng.integers(2, 4))
    get_state = bool(rng.random() < 0.7)
    get_output = bool(rng.random() < 0.5)
    if not get_state and not get_output:
        get_state = True
    tmode = str(rng.choice(["parallel", "residual"]))
    from gnn_tpu.ops.mlp import get_inout_dims
    specs = []
    for li in range(n_layers):
        in_s, l_s = get_inout_dims("state", nl, al, dt, focus, 0,
                                   int(rng.integers(4, 12)), layer=li,
                                   get_state=get_state, get_output=get_output)
        in_o, l_o = get_inout_dims("output", nl, al, dt, focus, 0, None,
                                   layer=li, get_state=get_state,
                                   get_output=get_output)
        acts = tuple(rng.choice(ACTS) for _ in l_s[:-1]) + ("tanh",)
        ss = MLPSpec(input_dim=in_s, units=tuple(l_s), activations=acts,
                     kernel_initializer="glorot_normal",
                     bias_initializer="glorot_normal",
                     batch_normalization=False)
        os_ = MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                      batch_normalization=False)
        specs.append(GNNSpec(focus=focus, state_spec=ss, output_spec=os_,
                             max_iteration=int(rng.integers(2, 5)),
                             threshold=float(rng.choice([0.0, 0.01])),
                             aggregation="auto"))
    merged = Graph.merge(gs, focus=focus, aggregation_mode=str(
        rng.choice(["sum", "normalized", "average"])))
    gb_seg = GraphBatch.from_graph(merged)
    gb_blk = from_graphs_blocked(gs, block_w=W, focus=focus,
                                 aggregation_mode=merged.aggregation_mode)
    gb_fus = from_graphs_blocked(gs, block_w=W, focus=focus,
                                 aggregation_mode=merged.aggregation_mode,
                                 fused_layout=True)
    keys = jax.random.split(jax.random.key(seed), n_layers)
    pb = [gnn_init(sp, k) for sp, k in zip(specs, keys)]
    params = tuple(p for p, _ in pb)
    bns = tuple(b for _, b in pb)
    return (tuple(specs), params, bns, gb_seg, gb_blk, gb_fus, get_state,
            get_output, tmode, _lgnn_loss, lgnn_forward)


def run_lgnn_trial(seed: int, training: bool):
    (specs, params, bns, gb_seg, gb_blk, gb_fus, gst, gout, tmode,
     lgnn_loss, lgnn_forward) = build_lgnn_trial(seed)
    key = jax.random.key(seed + 1)
    paths = [("segment", "segment", gb_seg), ("blocked", "blocked", gb_blk),
             ("auto", "auto", gb_fus)]
    outs, iters, grads = {}, {}, {}
    state_scale = 1.0
    for name, agg, gb in paths:
        sps = tuple(dataclasses.replace(sp, aggregation=agg) for sp in specs)
        its, os_, st, _ = lgnn_forward(sps, params, bns, gb, key, training,
                                       gst, gout)
        sel = np.asarray(gb.sel_mask)
        outs[name] = np.concatenate([np.asarray(o)[sel] for o in os_])
        iters[name] = tuple(float(i) for i in its)
        state_scale = max(state_scale, float(np.max(np.abs(
            np.asarray(st, dtype=np.float32)))))

        def loss_of(p, sps=sps, gb=gb):
            _, os2, _, _ = lgnn_forward(sps, p, bns, gb, key, training,
                                        gst, gout)
            return lgnn_loss(sps, "mse", {}, gb, os2, tmode)

        grads[name] = jax.grad(loss_of)(params)
    margin = np.inf
    if any(_has_kink(sp.state_spec.activations) for sp in specs):
        name0, agg0, gb0 = paths[0]
        sps0 = tuple(dataclasses.replace(sp, aggregation=agg0) for sp in specs)
        with _MarginSpy() as spy:
            lgnn_forward(sps0, params, bns, gb0, key, training, gst, gout)
        margin = spy.margin
    _compare(paths, outs, iters, grads, 2e-4, 5e-3, state_scale,
             branch_margin=margin)


def build_composite_trial(seed: int):
    from gnn_tpu.models.composite import (CompositeGNNSpec, composite_forward,
                                          composite_init)
    rng = np.random.default_rng(seed)
    focus = rng.choice(["n", "a", "g"])
    nl, al, dt = int(rng.integers(2, 6)), int(rng.integers(1, 3)), 2
    n_types = int(rng.integers(2, 4))
    W = int(rng.choice([16, 32]))
    gs = []
    for _ in range(int(rng.integers(4, 9))):
        g = random_graph(int(rng.integers(6, 22)), nl, al, dt, 0.5,
                         focus=focus, rng=rng)
        g.node_types = rng.integers(0, n_types, g.n_nodes).astype(np.int32)
        gs.append(g)
    sss = tuple(
        MLPSpec(input_dim=2 * nl + al, units=(nl,),
                activations=str(rng.choice(ACTS)),
                kernel_initializer="glorot_normal",
                bias_initializer="glorot_normal", batch_normalization=False)
        for _ in range(n_types))
    o_in = {"n": nl, "g": nl, "a": 2 * nl + al}[focus]
    os_ = MLPSpec(input_dim=o_in, units=(dt,), activations="softmax",
                  batch_normalization=False)
    spec = CompositeGNNSpec(focus=focus, state_specs=sss, output_spec=os_,
                            max_iteration=int(rng.integers(2, 5)),
                            threshold=float(rng.choice([0.0, 0.01])),
                            aggregation="auto")
    merged = Graph.merge(gs, focus=focus, aggregation_mode=str(
        rng.choice(["sum", "normalized", "average"])))
    gb_seg = GraphBatch.from_graph(merged)
    gb_blk = from_graphs_blocked(gs, block_w=W, focus=focus,
                                 aggregation_mode=merged.aggregation_mode)
    params, bnst = composite_init(spec, jax.random.key(seed))
    return spec, params, bnst, gb_seg, gb_blk, composite_forward


def run_composite_trial(seed: int, training: bool):
    from gnn_tpu.models.core import weighted_loss
    from gnn_tpu.training.losses import get_loss
    spec, params, bnst, gb_seg, gb_blk, cfwd = build_composite_trial(seed)
    key = jax.random.key(seed + 1)
    paths = [("segment", dataclasses.replace(spec, aggregation="segment"),
              gb_seg),
             ("blocked", dataclasses.replace(spec, aggregation="blocked"),
              gb_blk)]
    outs, iters, grads = {}, {}, {}
    state_scale = 1.0
    for name, sp, gb in paths:
        r = cfwd(sp, params, bnst, gb, key, training=training)
        sel = np.asarray(gb.sel_mask)
        outs[name] = np.asarray(r["out"])[sel]
        iters[name] = float(r["iters"])
        state_scale = max(state_scale, float(np.max(np.abs(
            np.asarray(r["state"], dtype=np.float32)))))

        def loss_of(p, sp=sp, gb=gb):
            r2 = cfwd(sp, p, bnst, gb, key, training=training)
            return weighted_loss(get_loss("mse"), {}, gb, r2["out"])

        grads[name] = jax.grad(loss_of)(params)
    margin = np.inf
    if any(_has_kink(ss.activations) for ss in spec.state_specs):
        name0, sp0, gb0 = paths[0]
        with _MarginSpy() as spy:
            cfwd(sp0, params, bnst, gb0, key, training=training)
        margin = spy.margin
    _compare(paths, outs, iters, grads, 2e-4, 5e-3, state_scale,
             branch_margin=margin)


RUNNERS = {"gnn": run_trial, "lgnn": run_lgnn_trial,
           "composite": run_composite_trial}
# gnn gets the lion's share: it covers every propagate dispatch branch
WEIGHTS = {"gnn": 0.6, "lgnn": 0.25, "composite": 0.15}


def main():
    failures = []
    t0 = time.perf_counter()
    kinds = [k for k in KINDS if k in RUNNERS]
    probs = np.array([WEIGHTS[k] for k in kinds], dtype=np.float64)
    probs = probs / probs.sum()
    pick = np.random.default_rng(SEED + 7)
    for i in range(N):
        seed = SEED * 100003 + i
        kind = str(pick.choice(kinds, p=probs))
        for training in (False, True):
            try:
                RUNNERS[kind](seed, training)
            except Exception:
                failures.append((kind, seed, training))
                print(f"FAIL kind={kind} seed={seed} training={training}",
                      flush=True)
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
