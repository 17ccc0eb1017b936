"""Serving latency/throughput benchmark (gnn_tpu/serving.py) on MUTAG.

Measures, per request size, the END-TO-END request path a deployment pays:
host Graph list -> bucket pack -> H2D -> compiled executable -> D2H of the
target rows. Separately reports device-only time amortised over REPS
back-to-back executable launches (the chained host-pull rule from
NOTES_r2.md: each timing window ends in a real np.asarray pull).

Run on the chip:  PYTHONUNBUFFERED=1 python benchmarks/serving_bench.py
Env: GNN_TPU_CPU=1 (CPU), SIZES="1,8,64,512", REPS=20, HIDDEN=0|150
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GNN_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from gnn_tpu import GNNgraphBased, MLPSpec, Predictor, get_inout_dims
from gnn_tpu.graphs.datasets import load_mutag

SIZES = [int(s) for s in os.environ.get("SIZES", "1,8,64,512").split(",")]
REPS = int(os.environ.get("REPS", "20"))
HIDDEN = int(os.environ.get("HIDDEN", "0")) or None
MUTAG = os.environ.get("MUTAG_PATH", "/root/reference/MUTAG_raw/")

graphs = load_mutag(MUTAG)
rng = np.random.default_rng(0)

in_s, l_s = get_inout_dims("state", 14, 3, 2, "g", 0, HIDDEN)
in_o, l_o = get_inout_dims("output", 14, 3, 2, "g", 0, HIDDEN)
model = GNNgraphBased(
    net_state=MLPSpec(input_dim=in_s, units=tuple(l_s), activations="selu",
                      kernel_initializer="lecun_normal",
                      bias_initializer="lecun_normal",
                      batch_normalization=False),
    net_output=MLPSpec(input_dim=in_o, units=tuple(l_o),
                       activations="softmax", batch_normalization=False),
    optimizer={"name": "adam", "kwargs": {"learning_rate": 1e-3}},
    loss_function="categorical_crossentropy",
    loss_arguments={"from_logits": False},
    max_iteration=5, threshold=0.01,
    path_writer="writer/serving_bench/", seed=0)

pred = Predictor(model)


def request(k):
    idx = rng.integers(0, len(graphs), k)
    return [graphs[i] for i in idx]


# absorb the tunnel's one-time device->host relay handshake (~minutes) BEFORE
# any timed loop — without this it lands in the first request's latency and
# poisons the p99 column (the 301 s size-1 outlier in the first r4 run)
from gnn_tpu.config import warmup_transfers  # noqa: E402

warmup_transfers()

# the runtime's floor for ANY synchronous dispatch+pull: a trivial jitted
# x+1 through the same link. On the tunnelled chip this is ~28-30 ms of pure
# round-trip — it bounds every blocking predict() below regardless of model
# cost, and is the number to subtract when projecting to locally-attached
# TPU serving (where the same floor is <1 ms)
_f = jax.jit(lambda x: x + 1.0)
_x = jax.device_put(np.ones((8,), np.float32))
np.asarray(_f(_x))
_fl = []
for _ in range(15):
    t0 = time.perf_counter()
    np.asarray(_f(_x))
    _fl.append((time.perf_counter() - t0) * 1e3)
tunnel_floor_ms = round(sorted(_fl)[len(_fl) // 2], 2)
print(f"tunnel_floor_ms (trivial dispatch+pull median): {tunnel_floor_ms}",
      flush=True)

results = {}
for k in SIZES:
    reqs = [request(k) for _ in range(REPS)]
    t0 = time.perf_counter()
    n_compiled = pred.warmup(reqs)      # cover EVERY timed request's bucket
    warm_s = time.perf_counter() - t0

    # end-to-end request latency (fresh request objects each call: includes
    # bucket pack + H2D + launch + D2H of the selected rows). Warmup covered
    # all buckets, so a nonzero compile delta here flags a contaminated run.
    compiles_before = pred.stats["compiles"]
    lat = []
    import gc
    attrib = []          # per-request (ms, pack_ms, gc_gen2_delta)
    for req in reqs:
        g2_before = gc.get_stats()[2]["collections"]
        t0 = time.perf_counter()
        outs = pred.predict(req, split=False)
        assert outs.shape[0] == k
        ms = (time.perf_counter() - t0) * 1e3
        attrib.append((ms, pred.stats["last_pack_ms"],
                       gc.get_stats()[2]["collections"] - g2_before))
        lat.append(ms / 1e3)
    lat_ms = sorted(x * 1e3 for x in lat)
    timed_compiles = pred.stats["compiles"] - compiles_before
    edges = sum(g.n_arcs for g in reqs[-1])

    # WARM pass: the SAME request objects again — the packed-batch LRU
    # (serving.py) serves the device-resident batch, skipping the host pack
    # and the per-leaf H2D transfers that dominate small requests
    warm_lat = []
    for req in reqs:
        t0 = time.perf_counter()
        outs = pred.predict(req, split=False)
        warm_lat.append((time.perf_counter() - t0) * 1e3)
    warm_ms = sorted(warm_lat)
    # p99 attribution: did the tail requests coincide with a gen-2 GC pass?
    worst = max(attrib, key=lambda a: a[0])

    # PIPELINED warm pass (predict_async): all requests dispatched before
    # any result() pull — the deployment pattern that amortises the tunnel
    # round-trip across in-flight requests. Per-request amortised cost
    # should approach device time + host split, not the RTT floor.
    pends = [pred.predict_async(req, split=False) for req in reqs]
    [p.result() for p in pends]           # absorb any first-wave stall
    t0 = time.perf_counter()
    pends = [pred.predict_async(req, split=False) for req in reqs]
    outs = [p.result() for p in pends]
    pipelined_ms = (time.perf_counter() - t0) / len(reqs) * 1e3
    assert all(o.shape[0] == k for o in outs)

    # device-only path: same packed batch launched REPS times back-to-back,
    # ONE real host pull at the end amortised over the chain
    gb = pred.build_batch(reqs[-1])
    exe = pred._executable(gb)
    out = exe(pred._params, pred._bn, gb)
    np.asarray(out)                       # sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = exe(pred._params, pred._bn, gb)
    np.asarray(out)
    dev_ms = (time.perf_counter() - t0) / REPS * 1e3

    results[k] = {
        "p50_ms": round(lat_ms[len(lat_ms) // 2], 2),
        "p90_ms": round(lat_ms[int(len(lat_ms) * 0.9)], 2),
        "p99_ms": round(lat_ms[min(len(lat_ms) - 1,
                                   int(len(lat_ms) * 0.99))], 2),
        "warm_p50_ms": round(warm_ms[len(warm_ms) // 2], 2),
        "warm_p99_ms": round(warm_ms[min(len(warm_ms) - 1,
                                         int(len(warm_ms) * 0.99))], 2),
        "warm_pipelined_ms": round(pipelined_ms, 2),
        "launch_ms": round(dev_ms, 2),
        "edges_last_req": int(edges),
        "graphs_per_s_p50": round(k / (lat_ms[len(lat_ms) // 2] / 1e3)),
        "compiles": n_compiled,
        "compiles_in_timed_loop": timed_compiles,   # must be 0 for a clean run
        "warmup_s": round(warm_s, 2),
        "worst_req_ms": round(worst[0], 2),
        "worst_req_pack_ms": round(worst[1] or 0.0, 2),
        "worst_req_gc_gen2": int(worst[2]),
    }
    print(f"size {k:4d}: {json.dumps(results[k])}", flush=True)

summary = {"metric": "serving_request_p50_ms", "by_size": results,
           "tunnel_floor_ms": tunnel_floor_ms,
           "hidden": HIDDEN, "device": str(jax.devices()[0])}
print(json.dumps(summary), flush=True)
out_path = os.environ.get("SERVING_OUT")
if out_path:
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
