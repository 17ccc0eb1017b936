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
  shard      (round 4) single-GNN SHARDED training steps on the virtual
             8-device mesh: edge- and node-sharded optimizer steps vs the
             single-device step (parallel/edge_shard.py, node_shard.py) —
             randomized focus/activations/BN/state_dim/threshold
  lgnn_shard (round 4) LGNN stacks through the edge-/node-sharded
             whole-stack steps vs the single-device _lgnn_train_impl
  dp         (round 4) data-parallel step vs the mean-of-per-batch-grads
             single-device equivalent

Strict-regime policy (round 4): 80% of gnn/lgnn trials rescale their drawn
state-net weights until the fixed-point map is observed-contractive
(max |state| <= 20 on a dry forward), so the strict tolerances apply; the
rest keep raw draws to deliberately cover the exploding regime. The summary
line reports the strict/loose split and the loose reasons.

Round 5 additions:
  composite_bn  the typed composite BN training kernel chain
                (ops/pallas_typed.py) vs the dense type-masked XLA body on
                the SAME blocked batch (bit-shared bernoulli streams, so
                dropout configs compare exactly)
  f64 shadow    sampled flip_risk trials (f32-class, reference geometry)
                get a REAL oracle again: an f64 eager replica of the
                segment path; each f32 path's grads must match it at the
                strict band OR be reproduced by flipping the derivative
                branch of at-risk units (|pre-act| within f32 rounding of a
                kink) — the automated seed-4100151 adjudication. Budget
                FUZZ_SHADOW=6 per run; stats printed in the summary.
  flip-risk bound  the campaign FAILS if flip_risk exceeds
                FUZZ_MAX_FLIP_RISK (default 0.35) of checked trials, so a
                regression inflating flip_risk cannot mask grad bugs.

Run: python tools/fuzz_parity.py            (N=40 trials by default)
Env: FUZZ_N=200  FUZZ_SEED=0  FUZZ_SHADOW=6  FUZZ_MAX_FLIP_RISK=0.35
     FUZZ_KINDS=gnn,lgnn,composite,composite_bn,shard,lgnn_shard,dp
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)   # sharded kinds need a mesh

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
KINDS = os.environ.get(
    "FUZZ_KINDS",
    "gnn,lgnn,composite,composite_bn,shard,lgnn_shard,dp").split(",")
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
    params = _normalize_weights(rng, spec, params, bnst, gb_seg)
    return spec, params, bnst, gb_seg, gb_blk, gb_fus


def _normalize_weights(rng, spec, params, bnst, gb, key_name="state"):
    """Strict-regime weight normalization (round 4, VERDICT r3 weak #2):
    unnormalized glorot draws make non-contractive state maps COMMON (sum
    aggregation multiplies by in-degree), pushing most trials into the
    loose tolerance bands where a real VJP bug could hide behind a 10%
    sanity check. 80% of trials halve the state-net weights until a dry
    eval forward observes max|state| <= 20 (strict territory); the other
    20% keep the raw draw so the exploding regime stays covered."""
    if rng.random() >= 0.8:
        return params
    sp = dataclasses.replace(spec, aggregation="segment")
    for _ in range(6):
        r = gnn_forward(sp, params, bnst, gb, jax.random.key(0),
                        training=False)
        scale = float(np.max(np.abs(np.asarray(r["state"],
                                               dtype=np.float32))))
        if not np.isfinite(scale) or scale > 20.0:
            params = dict(params)
            params[key_name] = jax.tree_util.tree_map(
                lambda x: x * 0.5, params[key_name])
        else:
            break
    return params


_DISCONTINUOUS_ACTS = ("relu", "selu")  # derivative jumps at x == 0

# f64-shadow budget per campaign run (VERDICT r4 weak #5 / next #6): sampled
# flip_risk trials get a REAL oracle instead of a skipped grad check —
# an f64 replica of the reference path, with every residual discrepancy
# required to be explained by derivative-branch flips at sub-rounding
# pre-activations (the automated form of the seed-4100151 adjudication).
_SHADOW_LEFT = [int(os.environ.get("FUZZ_SHADOW", "6"))]
_SHADOW_STATS = {"checked": 0, "explained_clean": 0, "explained_flips": 0}


class _KinkPatch:
    """Patch the discontinuous activations to (a) RECORD each call's
    pre-activation array (eager forward only), and/or (b) FLIP the
    derivative branch at selected (call_idx, element) positions — the
    flipped value differs by O(|x|) <= the rounding distance at the
    at-risk elements, while the derivative takes the OTHER (equally valid)
    subgradient branch. Call order is deterministic under disable_jit
    (lax.scan unrolls to per-iteration eager calls)."""

    def __init__(self, flips=None, record=False):
        self.calls = []
        self.flips = flips or {}
        self.record = record
        self._n = [0]

    def __enter__(self):
        from gnn_tpu.ops import mlp as _mlp
        self._mlp = _mlp
        self._saved = {k: _mlp._ACTIVATIONS[k] for k in _DISCONTINUOUS_ACTS}

        def make(name, f):
            def wrapped(x):
                idx = self._n[0]
                self._n[0] += 1
                if self.record:
                    self.calls.append((name, np.asarray(x, dtype=np.float64)))
                m = self.flips.get(idx)
                if m is None:
                    return f(x)
                import jax.numpy as jnp
                mj = jnp.asarray(m.reshape(x.shape))
                lam, alpha = 1.0507009873554805, 1.6732632423543772
                if name == "relu":
                    other = jnp.where(x > 0, jnp.zeros_like(x), x)
                else:
                    other = jnp.where(
                        x > 0,
                        lam * alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0),
                        lam * x)
                return jnp.where(mj, other, f(x))
            return wrapped

        for k, f in self._saved.items():
            self._mlp._ACTIVATIONS[k] = make(k, f)
        return self

    def __exit__(self, *exc):
        self._mlp._ACTIVATIONS.update(self._saved)
        return False


def _f64_shadow(sp0, gb0, params, bnst, grads, key, training, state_scale):
    """The automated flip adjudication: an f64 eager replica of the
    reference (segment, pure-XLA) path is the gradient ORACLE. Every f32
    path's gradients must either match the oracle at the strict f32 band,
    or be reproduced by flipping the derivative branch of a small set of
    at-risk units (f64 |pre-activation| within the f32 rounding distance of
    a kink) in the oracle — flip deltas are computed per unit and combined
    by binarized least squares. Raises AssertionError when no flip
    assignment explains a path's grads (a REAL find)."""
    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        # jax 0.9 removed jax.experimental.enable_x64; the config flag is
        # the supported toggle (fuzz runs are single-threaded)
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    def to64(t):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(np.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, t)

    thr = 1e-4 * max(1.0, state_scale)     # f32-class rounding distance
    flat = lambda g: np.concatenate(       # noqa: E731
        [np.asarray(l, np.float64).ravel()
         for l in jax.tree_util.tree_leaves(g)])
    with enable_x64(), jax.disable_jit():
        p64, b64, g64 = to64(params), to64(bnst), to64(gb0)

        def fwd():
            return evaluate_single(sp0, p64, b64, g64, key, "mse", {},
                                   training=training)

        rec = _KinkPatch(record=True)
        with rec:
            fwd()

        def grad_with(flips):
            patch = _KinkPatch(flips=flips)
            with patch:
                return jax.grad(lambda p: evaluate_single(
                    sp0, p, b64, g64, key, "mse", {},
                    training=training)[1])(p64)

        oracle = flat(grad_with(None))
        tree_scale = max(1.0, float(np.max(np.abs(oracle))))
        band = 2e-4 * tree_scale + 5e-3 * np.abs(oracle)

        # at-risk units: (call_idx, flat element) with |h| < thr, smallest
        # first, capped — each contributes one candidate flip delta
        cands = []
        for ci, (name, arr) in enumerate(rec.calls):
            fa = arr.ravel()
            for j in np.argsort(np.abs(fa))[:4]:
                if abs(fa[j]) < thr:
                    cands.append((abs(fa[j]), ci, int(j), arr.shape))
        cands = sorted(cands)[:10]

        deltas = []
        for _, ci, j, shape in cands:
            m = np.zeros(int(np.prod(shape)), bool)
            m[j] = True
            deltas.append(flat(grad_with({ci: m})) - oracle)

        _SHADOW_STATS["checked"] += 1
        any_flips_needed = False
        for name, g32 in grads.items():
            r = flat(g32) - oracle
            if np.all(np.abs(r) <= band):
                continue
            any_flips_needed = True
            if not deltas:
                raise AssertionError(
                    f"f64 shadow: path {name} off-oracle with NO at-risk "
                    f"units (max |r| {np.max(np.abs(r)):.3g})")
            A = np.stack(deltas, axis=1)               # [P, C]
            combos = [np.zeros(A.shape[1], bool),
                      np.ones(A.shape[1], bool)]
            for c in range(A.shape[1]):
                m = np.zeros(A.shape[1], bool)
                m[c] = True
                combos.append(m)
            coef, *_ = np.linalg.lstsq(A, r, rcond=None)
            combos.append(coef > 0.5)
            ok = any(np.all(np.abs(r - A @ cb.astype(np.float64)) <= band)
                     for cb in combos)
            if not ok:
                raise AssertionError(
                    f"f64 shadow: path {name} grads not explained by any of "
                    f"{len(combos)} flip assignments over {A.shape[1]} "
                    f"at-risk units (max |r| {np.max(np.abs(r)):.3g}, "
                    f"band floor {2e-4 * tree_scale:.3g})")
        if any_flips_needed:
            _SHADOW_STATS["explained_flips"] += 1
        else:
            _SHADOW_STATS["explained_clean"] += 1


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
    # bf16 state-carry rounding COMPOUNDS per iteration: campaign seed
    # 4400148 (selu, K=5, bf16) had EVERY path — including the pure-XLA
    # segment body — 0.054-0.070 from an f64 oracle (~1.4e-2/iteration),
    # so two paths can legitimately sit ~2x that apart. Scale the mutual
    # output band with the realized iteration count.
    it0 = iters[paths[0][0]]                   # LGNN: per-layer tuple — the
    if isinstance(it0, (tuple, list)):         # state accumulates rounding
        it0 = sum(float(v) for v in it0)       # through every layer's loop
    n_it = max(1.0, float(it0))
    if atol >= 1e-2:
        atol_out = max(atol_out, 1.5e-2 * n_it, 8e-3 * state_scale)
    # derivative-branch flips: if any relu/selu pre-activation sits within
    # the paths' rounding distance of its kink, grads (and, through the
    # flipped unit's downstream weights, outputs) legitimately differ by
    # that unit's full contribution. The rounding scale is bf16-class when
    # the caller passed a bf16-class atol, else the kernels' hi/lo class.
    rounding_rel = 8e-3 if atol >= 1e-2 else 1e-4
    flip_risk = branch_margin < rounding_rel * max(1.0, state_scale)
    if flip_risk:
        atol_out = max(atol_out, 5e-2 if atol >= 1e-2 else 2e-2)
    # regime bookkeeping (round 4): which trials were STRICTLY checked —
    # reported per campaign so loosened bands are visible, not silent
    loose_reasons = []
    if flip_risk:
        loose_reasons.append("flip_risk")
    if state_scale > 50.0:
        loose_reasons.append("exploding")
    if ift:
        loose_reasons.append("ift")
    if atol >= 1e-2:
        loose_reasons.append("bf16")
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
        if flip_risk:
            # A pre-activation within the paths' rounding distance of a
            # relu/selu kink: the paths legitimately take DIFFERENT
            # (both valid) subgradient branches there, and one flipped
            # unit shifts grads by its full downstream contribution —
            # elementwise gradient agreement is not a property that
            # holds, at ANY fixed band. f64-adjudicated case: campaign
            # seed 4100151 (bn2 chain, selu, K=3) had ONE hidden unit at
            # |h0| = 3.6e-6 (kernel recompute rounding 4.9e-5); flipping
            # exactly that unit's derivative branch in an f64 replica
            # reproduced the kernel grads to 1e-5 while the unflipped
            # replica differed by 6e-2 — and single grad elements moved
            # 52%, through any sanity band. Outputs and iteration counts
            # above remain the check; the trial is counted loose
            # ("flip_risk") in the campaign report.
            continue
        for a, b in zip(jax.tree_util.tree_leaves(grads[ref]),
                        jax.tree_util.tree_leaves(grads[name])):
            a, b = np.asarray(a), np.asarray(b)
            g_rtol, g_atol = rtol, atol * tree_scale
            if atol >= 1e-2:
                # bf16 state-carry rounding compounds per iteration in the
                # GRADS too (campaign seed 5100160: two pure-XLA bodies,
                # tanh/linear — no flips possible — diverged 3.7e-2 rel at
                # K=4 while the identical f32 trial agreed to 1.3e-6; the
                # BN backward's 1/sigma amplifies the per-iteration drift).
                # Same per-iteration scaling the r4 output band got.
                g_atol = max(g_atol, 1.5e-2 * n_it * tree_scale)
            if state_scale > 50.0:
                # exploding (non-contractive) fixed points: isolated grad
                # elements legitimately diverge — keep a loose sanity band
                # instead of elementwise exactness
                g_rtol = max(g_rtol, 0.1)
                g_atol = max(g_atol, 1e-3 * max(state_scale, tree_scale))
            np.testing.assert_allclose(b, a, rtol=g_rtol, atol=g_atol,
                                       err_msg=f"grads {name} vs {ref}")
    return loose_reasons


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
    reasons = _compare(paths, outs, iters, grads, atol, rtol, state_scale,
                       branch_margin=margin, ift=spec.grad_mode == "ift")
    # f64 shadow on sampled flip_risk draws (f32-class, reference geometry:
    # no dropout/state_dim — their jax.random streams change under x64)
    if ("flip_risk" in reasons and "bf16" not in reasons
            and "ift" not in reasons and "exploding" not in reasons
            and not (training and spec.state_spec.dropout_rate)
            and spec.state_dim == 0 and spec.state_dtype is None
            and _SHADOW_LEFT[0] > 0):
        _SHADOW_LEFT[0] -= 1
        sp_seg = dataclasses.replace(spec, aggregation="segment")
        _f64_shadow(sp_seg, gb_seg, params, bnst, grads, key, training,
                    state_scale)
        reasons.append("shadow_checked")
    return reasons


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
    # strict-regime normalization for the stack: explosion compounds across
    # layers — halve every layer's state net until the full stack's state
    # is observed-contractive (same 80/20 policy as _normalize_weights)
    if rng.random() < 0.8:
        sps = tuple(dataclasses.replace(sp, aggregation="segment")
                    for sp in specs)
        for _ in range(6):
            _, _, st, _ = lgnn_forward(sps, params, bns, gb_seg,
                                       jax.random.key(0), False,
                                       get_state, get_output)
            scale = float(np.max(np.abs(np.asarray(st, dtype=np.float32))))
            if not np.isfinite(scale) or scale > 20.0:
                params = tuple(
                    {**p, "state": jax.tree_util.tree_map(
                        lambda x: x * 0.5, p["state"])} for p in params)
            else:
                break
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
    return _compare(paths, outs, iters, grads, 2e-4, 5e-3, state_scale,
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
    return _compare(paths, outs, iters, grads, 2e-4, 5e-3, state_scale,
                    branch_margin=margin)


def run_composite_bn_trial(seed: int, training: bool):
    """Typed composite BN TRAINING kernel chain (ops/pallas_typed.py) vs the
    dense type-masked XLA body on the SAME blocked batch — geometry and
    bernoulli streams are bit-shared, so dropout configs compare exactly.
    The `training` flag is repurposed as the dropout axis (the typed chain
    is a training-mode kernel): False -> dropout off, True -> dropout on."""
    from gnn_tpu.models.composite import (CompositeGNNSpec, composite_forward,
                                          composite_init)
    from gnn_tpu.models.core import weighted_loss
    from gnn_tpu.training.losses import get_loss
    rng = np.random.default_rng(seed)
    focus = rng.choice(["n", "a", "g"])
    nl, al, dt = int(rng.integers(2, 6)), int(rng.integers(1, 3)), 2
    n_types = int(rng.integers(1, 5))
    W = int(rng.choice([16, 32]))
    sd = int(rng.choice([0, 0, 3]))
    gs = []
    for _ in range(int(rng.integers(4, 9))):
        g = random_graph(int(rng.integers(6, 22)), nl, al, dt, 0.5,
                         focus=focus, rng=rng)
        g.node_types = rng.integers(0, n_types, g.n_nodes).astype(np.int32)
        gs.append(g)
    if rng.random() < 0.5:   # over-block graph -> residual edges
        g = random_graph(int(W * 2.2), nl, al, dt, 0.25, focus=focus, rng=rng)
        g.node_types = rng.integers(0, n_types, g.n_nodes).astype(np.int32)
        gs.insert(1, g)
    out_dim = sd if sd else nl
    kw = (dict(dropout_rate=(float(rng.choice([0.1, 0.2])),),
               dropout_pos=(0,), alphadropout=bool(rng.random() < 0.5))
          if training else {})
    fus_acts = ("tanh", "relu", "selu", "linear")
    sss = tuple(
        MLPSpec(input_dim=2 * (nl + sd) + al, units=(out_dim,),
                activations=str(rng.choice(fus_acts)),
                kernel_initializer="glorot_normal",
                bias_initializer="glorot_normal",
                batch_normalization=True, **kw)
        for _ in range(n_types))
    comp = nl + sd if sd else nl
    o_in = {"n": comp, "g": comp, "a": 2 * comp + al}[focus]
    os_ = MLPSpec(input_dim=o_in, units=(dt,), activations="softmax",
                  batch_normalization=False)
    spec = CompositeGNNSpec(focus=focus, state_specs=sss, output_spec=os_,
                            state_dim=sd, max_iteration=int(rng.integers(2, 5)),
                            threshold=float(rng.choice([0.0, 0.01])),
                            aggregation="auto")
    gb = from_graphs_blocked(gs, block_w=W, focus=focus,
                             aggregation_mode=str(rng.choice(
                                 ["sum", "normalized", "average"])))
    params, bnst = composite_init(spec, jax.random.key(seed))
    key = jax.random.key(seed + 1)
    lf = get_loss("mse")

    def run(kernel_on):
        if kernel_on:
            os.environ.pop("GNN_TPU_FUSED_BN", None)
        else:
            os.environ["GNN_TPU_FUSED_BN"] = "0"
        try:
            def loss_of(p):
                r2 = composite_forward(spec, p, bnst, gb, key, training=True)
                return weighted_loss(lf, {}, gb, r2["out"])
            r = composite_forward(spec, params, bnst, gb, key, training=True)
            return r, jax.grad(loss_of)(params)
        finally:
            os.environ.pop("GNN_TPU_FUSED_BN", None)

    outs, iters, grads = {}, {}, {}
    state_scale = 1.0
    for name, on in (("xla_body", False), ("kernel", True)):
        r, g = run(on)
        sel = np.asarray(gb.sel_mask)
        outs[name] = np.asarray(r["out"])[sel]
        iters[name] = float(r["iters"])
        grads[name] = g
        state_scale = max(state_scale, float(np.max(np.abs(
            np.asarray(r["state"], dtype=np.float32)))))
    margin = np.inf
    if any(_has_kink(ss.activations) for ss in spec.state_specs):
        os.environ["GNN_TPU_FUSED_BN"] = "0"
        try:
            with _MarginSpy() as spy:
                composite_forward(spec, params, bnst, gb, key, training=True)
            margin = spy.margin
        finally:
            os.environ.pop("GNN_TPU_FUSED_BN", None)
    paths = [("xla_body", None, gb), ("kernel", None, gb)]
    return _compare(paths, outs, iters, grads, 2e-4, 5e-3, state_scale,
                    branch_margin=margin)


_MESHES = {}


def _mesh8(axis):
    if axis not in _MESHES:
        from gnn_tpu.parallel import make_mesh
        _MESHES[axis] = make_mesh({axis: 8})
    return _MESHES[axis]


def _tree_assert_close(a, b, label, atol_rel=1e-4):
    scale = max([1.0] + [float(np.max(np.abs(np.asarray(l))))
                         for l in jax.tree_util.tree_leaves(a)
                         if np.asarray(l).size])
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=atol_rel * scale,
                                   err_msg=label)


def build_shard_trial(seed: int):
    """Randomized single-GNN config for the SHARDED training-step kinds:
    no dropout (mask streams are deliberately decorrelated across shards —
    parallel/node_shard.py fold_in), everything else drawn like build_trial:
    focus, 1/2-layer nets, activations, BN, state_dim, threshold."""
    rng = np.random.default_rng(seed)
    focus = rng.choice(["n", "a", "g"])
    nl, al, dt = int(rng.integers(2, 6)), int(rng.integers(1, 3)), 2
    gs = [random_graph(int(rng.integers(8, 24)), nl, al, dt, 0.4,
                       focus=focus, rng=rng)
          for _ in range(int(rng.integers(4, 9)))]
    two = bool(rng.random() < 0.4)
    sd = int(rng.choice([0, 0, 2]))
    bn = bool(rng.random() < 0.3)
    out_dim = sd if sd else nl
    units = (int(rng.integers(5, 16)), out_dim) if two else (out_dim,)
    acts = tuple(rng.choice(ACTS) for _ in units)
    ss = MLPSpec(input_dim=2 * (nl + sd) + al, units=units,
                 activations=acts, kernel_initializer="glorot_normal",
                 bias_initializer="glorot_normal", batch_normalization=bn)
    comp = nl + sd if sd else nl
    o_in = {"n": comp, "g": comp, "a": 2 * comp + al}[focus]
    os_ = MLPSpec(input_dim=o_in, units=(dt,), activations="softmax",
                  batch_normalization=False)
    spec = GNNSpec(focus=focus, state_spec=ss, output_spec=os_,
                   state_dim=sd, max_iteration=int(rng.integers(3, 6)),
                   threshold=float(rng.choice([0.0, 0.01, 0.5])),
                   aggregation="segment")
    merged = Graph.merge(gs, focus=focus, aggregation_mode=str(
        rng.choice(["sum", "normalized", "average"])))
    tp = 4096 if focus == "a" else 256
    gb = GraphBatch.from_graph(merged, node_pad=256, edge_pad=4096,
                               target_pad=tp)
    params, bnst = gnn_init(spec, jax.random.key(seed))
    params = _normalize_weights(rng, spec, params, bnst, gb)
    return spec, params, bnst, gb


def run_shard_trial(seed: int, training: bool):
    """training=False -> edge-sharded step, training=True -> node-sharded
    step (the flag repurposed as the strategy axis: sharded steps are
    always training-mode). Exact vs the single-device optimizer step."""
    from gnn_tpu.models.core import make_train_step
    from gnn_tpu.training.optimizers import make_optimizer, optimizer_config
    strategy = "node" if training else "edge"
    spec, params, bnst, gb = build_shard_trial(seed)
    mesh = _mesh8("graph")
    sgd = optimizer_config("sgd", learning_rate=1.0)
    o0 = make_optimizer(sgd).init(params)
    rk = jax.random.key(seed + 2)
    if strategy == "edge":
        from gnn_tpu.parallel.edge_shard import (make_edge_sharded_train_step,
                                                 shard_edges)
        step = make_edge_sharded_train_step(spec, "mse", None, sgd, mesh,
                                            mean=True)
        sh = shard_edges(gb, mesh)
    else:
        from gnn_tpu.parallel.node_shard import (make_node_sharded_train_step,
                                                 shard_nodes)
        step = make_node_sharded_train_step(spec, "mse", None, sgd, mesh,
                                            mean=True)
        sh = shard_nodes(gb, mesh)
    p_s, bn_s, _, it_s = step(params, bnst, o0, sh, rk)
    ref = make_train_step(spec, "mse", None, sgd, mean=True)
    p_r, bn_r, _, it_r = ref(params, bnst, o0, gb, rk)
    if float(np.asarray(it_s)) != float(np.asarray(it_r)):
        raise AssertionError(
            f"iters mismatch {strategy}={float(np.asarray(it_s))} "
            f"vs single={float(np.asarray(it_r))}")
    _tree_assert_close(p_r, p_s, f"params {strategy}-sharded vs single")
    _tree_assert_close(bn_r, bn_s, f"bn state {strategy}-sharded vs single")
    return []


def run_lgnn_shard_trial(seed: int, training: bool):
    """LGNN stacks through the whole-stack sharded steps (training=False ->
    edge, True -> node) vs the single-device _lgnn_train_impl."""
    from gnn_tpu.models.lgnn import (_lgnn_train_impl,
                                     make_lgnn_edge_sharded_train_step)
    from gnn_tpu.parallel.node_shard import (
        make_lgnn_node_sharded_train_step, shard_nodes)
    from gnn_tpu.parallel.edge_shard import shard_edges
    from gnn_tpu.training.optimizers import (freeze_config, make_optimizer,
                                             optimizer_config)
    strategy = "node" if training else "edge"
    (specs, params, bns, gb_seg, _, _, gst, gout, tmode,
     _, _) = build_lgnn_trial(seed)
    specs = tuple(dataclasses.replace(sp, aggregation="segment")
                  for sp in specs)
    mesh = _mesh8("graph")
    sgd = optimizer_config("sgd", learning_rate=1.0)
    o0 = make_optimizer(sgd).init(params)
    rk = jax.random.key(seed + 2)
    if strategy == "edge":
        step = make_lgnn_edge_sharded_train_step(
            specs, "mse", None, sgd, mesh, mean=True, get_state=gst,
            get_output=gout, training_mode=tmode)
        sh = shard_edges(gb_seg, mesh)
    else:
        step = make_lgnn_node_sharded_train_step(
            specs, "mse", None, sgd, mesh, mean=True, get_state=gst,
            get_output=gout, training_mode=tmode)
        sh = shard_nodes(gb_seg, mesh)
    p_s, _, _, it_s = step(params, bns, o0, sh, rk)
    p_r, _, _, it_r = _lgnn_train_impl(
        specs, params, bns, o0, gb_seg, rk, loss_name="mse", loss_args_t=(),
        optimizer=freeze_config(sgd), mean=True, get_state=gst,
        get_output=gout, training_mode=tmode)
    if list(np.asarray(it_s).ravel()) != list(np.asarray(
            jax.numpy.stack(it_r) if isinstance(it_r, (list, tuple))
            else it_r).ravel()):
        raise AssertionError(f"iters mismatch {strategy} vs single")
    _tree_assert_close(p_r, p_s, f"lgnn params {strategy}-sharded vs single")
    return []


def run_dp_trial(seed: int, training: bool):
    """Data-parallel step over 8 equal-shape batches == the optimizer step
    on the MEAN of per-batch gradients (with SGD lr=1: the mean of the
    per-batch single-step params). training repurposed: False -> single
    GNN, True -> also exercises BN batches."""
    from gnn_tpu.models.core import make_train_step
    from gnn_tpu.parallel import make_dp_train_step, shard_batches
    from gnn_tpu.training.optimizers import make_optimizer, optimizer_config
    rng = np.random.default_rng(seed)
    nl, al, dt = int(rng.integers(2, 5)), int(rng.integers(1, 3)), 2
    bn = bool(training and rng.random() < 0.5)
    acts = str(rng.choice(ACTS))
    ss = MLPSpec(input_dim=2 * nl + al, units=(nl,), activations=acts,
                 kernel_initializer="glorot_normal",
                 bias_initializer="glorot_normal", batch_normalization=bn)
    os_ = MLPSpec(input_dim=nl, units=(dt,), activations="softmax",
                  batch_normalization=False)
    spec = GNNSpec(focus="n", state_spec=ss, output_spec=os_,
                   max_iteration=int(rng.integers(3, 6)),
                   threshold=float(rng.choice([0.0, 0.01])),
                   aggregation="segment")
    gs = [random_graph(int(rng.integers(10, 24)), nl, al, dt, 0.5,
                       focus="n", rng=rng) for _ in range(8)]
    batches = [GraphBatch.from_graph(g, node_pad=64, edge_pad=1024,
                                     target_pad=64) for g in gs]
    params, bnst = gnn_init(spec, jax.random.key(seed))
    params = _normalize_weights(rng, spec, params, bnst, batches[0])
    mesh = _mesh8("data")
    sgd = optimizer_config("sgd", learning_rate=1.0)
    dp = make_dp_train_step(spec, "mse", None, sgd, mesh, "data", mean=True)
    o0 = make_optimizer(sgd).init(params)
    rngs = jax.random.split(jax.random.key(seed + 2), 8)
    stacked = shard_batches(batches, mesh, "data")
    p_dp, _, _, _ = dp(params, bnst, o0, stacked, rngs)
    ref = make_train_step(spec, "mse", None, sgd, mean=True)
    per = [ref(params, bnst, o0, b, k)[0] for b, k in zip(batches, rngs)]
    p_mean = jax.tree_util.tree_map(
        lambda *xs: sum(np.asarray(x) for x in xs) / len(xs), *per)
    _tree_assert_close(p_mean, p_dp, "dp params vs mean of per-batch steps")
    return []


RUNNERS = {"gnn": run_trial, "lgnn": run_lgnn_trial,
           "composite": run_composite_trial,
           "composite_bn": run_composite_bn_trial,
           "shard": run_shard_trial, "lgnn_shard": run_lgnn_shard_trial,
           "dp": run_dp_trial}
# gnn gets the lion's share: it covers every propagate dispatch branch
WEIGHTS = {"gnn": 0.38, "lgnn": 0.16, "composite": 0.08,
           "composite_bn": 0.1, "shard": 0.14, "lgnn_shard": 0.09,
           "dp": 0.05}


def main():
    failures = []
    strict = 0
    loose = 0
    loose_reasons = {}
    t0 = time.perf_counter()
    kinds = [k for k in KINDS if k in RUNNERS]
    probs = np.array([WEIGHTS[k] for k in kinds], dtype=np.float64)
    probs = probs / probs.sum()
    pick = np.random.default_rng(SEED + 7)
    start = int(os.environ.get("FUZZ_START", "0"))
    for i in range(N):
        seed = SEED * 100003 + i
        kind = str(pick.choice(kinds, p=probs))
        if i < start:        # resume a crashed campaign (FUZZ_START=<i>);
            continue         # the kind stream stays aligned via `pick`
        if i % 10 == 0:
            # every trial draws fresh shapes, so the jit cache grows without
            # bound — a 130-trial campaign exhausts vm.max_map_count (65530)
            # near trial ~70 and LLVM dies with ENOMEM despite free RAM
            jax.clear_caches()
        for training in (False, True):
            try:
                reasons = RUNNERS[kind](seed, training)
                if reasons:
                    loose += 1
                    for r in reasons:
                        loose_reasons[r] = loose_reasons.get(r, 0) + 1
                else:
                    strict += 1
            except Exception:
                failures.append((kind, seed, training))
                print(f"FAIL kind={kind} seed={seed} training={training}",
                      flush=True)
                traceback.print_exc(limit=3)
        if (i + 1) % 5 == 0:
            print(f"[{i + 1}/{N}] ok so far: {2 * (i + 1) - len(failures)}"
                  f"/{2 * (i + 1)} ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
    checked = max(strict + loose, 1)
    print(f"\n{2 * N - len(failures)}/{2 * N} trial-modes passed; "
          f"failures: {failures}", flush=True)
    print(f"regimes: strict {strict}/{checked} "
          f"({100.0 * strict / checked:.0f}%), loose {loose} "
          f"(reasons: {loose_reasons})", flush=True)
    print(f"f64 shadow: {_SHADOW_STATS}", flush=True)
    # ADVICE r4: bound the flip_risk rate so a regression that inflates it
    # cannot silently mask grad bugs behind the loosened oracle
    flip_rate = loose_reasons.get("flip_risk", 0) / checked
    max_flip = float(os.environ.get("FUZZ_MAX_FLIP_RISK", "0.35"))
    if flip_rate > max_flip:
        print(f"FLIP-RISK RATE {flip_rate:.2f} exceeds bound {max_flip} — "
              f"treat as a campaign failure (a regression inflating "
              f"flip_risk would otherwise hide grad bugs)", flush=True)
        sys.exit(1)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
