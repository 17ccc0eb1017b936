"""Pod-slice communication-volume measurement + scaling prediction
(VERDICT r4 next #7): multi-chip hardware is not available, but the
communication the sharded training steps would put on ICI is KNOWABLE
today — it is written into the compiled HLO. This harness compiles the
node- and edge-sharded training steps on 2/4/8-device CPU meshes, parses
the compiled module text for collective ops (all-gather / all-reduce /
reduce-scatter / collective-permute) with their shapes, and reports:

  * measured per-step collective inventory (op kind, shape, count),
  * per-chip WIRE bytes under ring algorithms
      (all-gather and reduce-scatter move (n-1)/n of the full buffer per
       chip; all-reduce 2(n-1)/n; collective-permute its operand),
  * an analytic cross-check (K iterations x [Np, D] state exchange + the
    documented per-step extras),
  * predicted scaling efficiency on a v5e slice, with the assumptions
    explicit and env-overridable:
      DEVICE_EDGES_PER_S  single-chip device propagation rate used to derive
                       each workload's single-chip step (default 454e6 =
                       BENCH_r04 train_device_ms on the MUTAG flagship)
      ICI_GBPS         effective per-chip ICI bandwidth for ring collectives
                       (default 90 GB/s: one v5e ICI link pair at 45 GB/s
                       per direction, both directions streaming)

  efficiency bounds per chip count: serial = (T1/n)/((T1/n)+Tcomm)
  (no overlap), overlapped = (T1/n)/max(T1/n, Tcomm) (perfect overlap).

Run on CPU: python benchmarks/comm_sweep.py
Env: COMM_OUT=path.json  NODES_1M=1 (add the 1M-node synthetic shape)
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.models.core import GNNSpec, gnn_init
from gnn_tpu.ops.mlp import MLPSpec, get_inout_dims
from gnn_tpu.parallel import make_mesh

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}
_COLL = re.compile(
    r"(all-gather|all-reduce|reduce-scatter|collective-permute)"
    r"(?:-start)?(?:\.\d+)?\s*=?\s*"
    r"((?:\(?\s*(?:f64|f32|bf16|f16|s64|s32|u64|u32|s8|u8|pred)"
    r"\[[0-9,]*\][^)]*\)?))", re.IGNORECASE)
_SHAPE = re.compile(r"(f64|f32|bf16|f16|s64|s32|u64|u32|s8|u8|pred)\[([0-9,]*)\]")


def collective_inventory(hlo_text: str, loop_trips: int = 1):
    """[(kind, dtype, shape, bytes)] for every collective EXECUTION in the
    module: ops inside while-loop bodies (the propagation scan fwd/bwd)
    count loop_trips times — static op counts undercount by K otherwise."""
    # map each line to its computation; mark while-body computations
    bodies = set(re.findall(r"body=%?([\w.\-]+)", hlo_text))
    out = []
    cur = None
    for line in hlo_text.splitlines():
        s = line.strip()
        if s.rstrip().endswith("{") and "->" in s:
            cur = s.split()[0].lstrip("%").replace("ENTRY", "").strip()
            continue
        m = re.match(r"%?(\S+)\s*=\s*(.*)", s)
        if not m:
            continue
        body = m.group(2)
        mult = loop_trips if cur in bodies else 1
        kind = None
        for k in ("all-gather-start", "all-reduce-start",
                  "reduce-scatter", "collective-permute-start",
                  "all-gather", "all-reduce", "collective-permute"):
            if body.startswith(k + "(") or re.match(
                    rf"(\(.*\)\s*|\S+\s+)?{re.escape(k)}\(", body):
                kind = k.replace("-start", "")
                break
        if kind is None:
            continue
        if "-done" in body.split("(")[0]:
            continue
        # output shape: the tuple/shape immediately left of the op name
        head = s.split("=", 1)[1]
        shapes = _SHAPE.findall(head.split("(", 1)[0])
        total = 0
        dts = []
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
            dts.append(f"{dt}[{dims}]")
        if total:
            for _ in range(mult):
                out.append((kind, ";".join(dts), total))
    return out


def wire_bytes_per_chip(inventory, n: int) -> float:
    """Ring-algorithm per-chip wire bytes for one execution of the module."""
    total = 0.0
    for kind, _, b in inventory:
        if kind == "all-gather":
            total += b * (n - 1) / n         # b = FULL gathered buffer
        elif kind == "all-reduce":
            total += 2.0 * b * (n - 1) / n
        elif kind == "reduce-scatter":
            total += b * (n - 1) / n
        else:                                 # collective-permute
            total += b
    return total


def mutag_workload():
    from gnn_tpu.graphs.datasets import load_mutag
    graphs = load_mutag(os.environ.get("MUTAG_PATH",
                                       "/root/reference/MUTAG_raw/"))
    merged = Graph.merge(graphs, focus="g", aggregation_mode="average")
    gb = GraphBatch.from_graph(merged)
    return "mutag_merge", merged, gb


def synth_1m_workload():
    rng = np.random.default_rng(0)
    n, e, nl, al, dt = 1_000_000, 4_000_000, 8, 3, 2
    nodes = rng.standard_normal((n, nl)).astype(np.float32)
    arcs = np.concatenate(
        [rng.integers(0, n, (e, 2)).astype(np.int64),
         rng.standard_normal((e, al)).astype(np.float32)], axis=1)
    targets = np.eye(dt, dtype=np.float32)[rng.integers(0, dt, n)]
    g = Graph(arcs=arcs, nodes=nodes, targets=targets, focus="n",
              aggregation_mode="average")
    return "synthetic_1m", g, GraphBatch.from_graph(g)


def spec_for(g):
    nl, al, dt = g.DIM_NODE_LABEL, g.DIM_ARC_LABEL, g.DIM_TARGET
    in_s, l_s = get_inout_dims("state", nl, al, dt, g.focus, 0, None)
    in_o, l_o = get_inout_dims("output", nl, al, dt, g.focus, 0, None)
    ss = MLPSpec(input_dim=in_s, units=tuple(l_s), activations="selu",
                 kernel_initializer="lecun_normal",
                 bias_initializer="lecun_normal", batch_normalization=False)
    os_ = MLPSpec(input_dim=in_o, units=tuple(l_o), activations="softmax",
                  batch_normalization=False)
    return GNNSpec(focus=g.focus, state_spec=ss, output_spec=os_,
                   max_iteration=5, threshold=0.01, aggregation="segment")


def compiled_text(step, args):
    return jax.jit(step).lower(*args).compile().as_text()


def analyze(name, merged, gb, strategies=("node", "edge")):
    from gnn_tpu.parallel.edge_shard import (make_edge_sharded_train_step,
                                             shard_edges)
    from gnn_tpu.parallel.node_shard import (make_node_sharded_train_step,
                                             shard_nodes)
    from gnn_tpu.training.optimizers import make_optimizer, optimizer_config
    spec = spec_for(merged)
    params, bnst = gnn_init(spec, jax.random.key(0))
    sgd = optimizer_config("sgd", learning_rate=0.01)
    o0 = make_optimizer(sgd).init(params)
    rk = jax.random.key(1)
    Np, D = gb.nodes.shape[0], spec.state_spec.units[-1]
    K = spec.max_iteration
    out = {}
    for strat in strategies:
        for n in (2, 4, 8):
            mesh = make_mesh({"graph": n})
            if strat == "node":
                step = make_node_sharded_train_step(spec, "mse", None, sgd,
                                                    mesh, mean=True)
                sh = shard_nodes(gb, mesh)
            else:
                step = make_edge_sharded_train_step(spec, "mse", None, sgd,
                                                    mesh, mean=True)
                sh = shard_edges(gb, mesh)
            txt = compiled_text(lambda p, b, o, s, k: step(p, b, o, s, k),
                                (params, bnst, o0, sh, rk))
            inv = collective_inventory(txt, loop_trips=K)
            wire = wire_bytes_per_chip(inv, n)
            agg = {}
            for kind, shp, b in inv:
                key = f"{kind} {shp}"
                agg[key] = agg.get(key, 0) + 1
            # analytic: K iterations of [Np, D] state exchange in fwd AND
            # bwd (all_gather fwd <-> reduce-scatter/psum bwd), f32
            analytic_full = 2 * K * Np * D * 4
            out[f"{strat}_{n}dev"] = {
                "collectives": agg,
                "wire_bytes_per_chip": round(wire),
                "analytic_state_exchange_bytes_full": analytic_full,
                "analytic_wire_per_chip": round(
                    analytic_full * (n - 1) / n),
            }
    return {"workload": name, "n_nodes": int(merged.n_nodes),
            "n_arcs": int(merged.n_arcs), "state_dim": D, "K": K,
            "per_mesh": out}


def predict(res, device_edges_per_s, ici_gbps):
    """Scaling-efficiency bounds per strategy/chip count. The single-chip
    step for each workload is derived from the measured DEVICE propagation
    rate (BENCH train_device_ms on the MUTAG flagship) applied to this
    workload's edge x iteration volume."""
    single_chip_ms = (res["n_arcs"] * res["K"] / device_edges_per_s) * 1e3
    pred = {"single_chip_ms_est": round(single_chip_ms, 3)}
    for key, row in res["per_mesh"].items():
        n = int(key.rsplit("_", 1)[1].replace("dev", ""))
        comm_ms = row["wire_bytes_per_chip"] / (ici_gbps * 1e6)
        comp_ms = single_chip_ms / n
        pred[key] = {
            "comm_ms": round(comm_ms, 3),
            "compute_ms_ideal": round(comp_ms, 3),
            "eff_serial": round(comp_ms / (comp_ms + comm_ms), 3),
            "eff_overlapped": round(
                comp_ms / max(comp_ms, comm_ms), 3),
        }
    return pred


def main():
    # 454e6 = the flagship's DEVICE propagation rate: 266,894 edges x 5
    # iterations / 2.938 ms (BENCH_r04 train_device_ms)
    eps = float(os.environ.get("DEVICE_EDGES_PER_S", "454e6"))
    ici_gbps = float(os.environ.get("ICI_GBPS", "90"))
    works = [mutag_workload()]
    if os.environ.get("NODES_1M"):
        works.append(synth_1m_workload())
    results = []
    for name, merged, gb in works:
        res = analyze(name, merged, gb)
        res["prediction"] = predict(res, eps, ici_gbps)
        res["assumptions"] = {
            "device_edges_per_s": eps,
            "ici_effective_gbps": ici_gbps,
            "algorithm": "ring collectives; wire factors (n-1)/n "
                         "(gather/scatter), 2(n-1)/n (all-reduce)",
        }
        results.append(res)
        print(json.dumps(res), flush=True)
    path = os.environ.get("COMM_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
