"""Real-TF2 reference baselines, measured by EXECUTING /root/reference.

Two subcommands (the reference code is run as an oracle, never copied):

  python tools/tf_baseline.py time
      Time the reference's per-batch training step — GradientTape over
      evaluate_single_graph(training=True), tape.gradient, gradient/iters
      averaging, optimizer.apply_gradients (GNN_BaseClass.py:231-247; the
      closure is replicated here through the reference's public methods) —
      on the bench flagship workload: ALL 4,337 Mutagenicity graphs merged
      into one disjoint-union GraphTensor (load_MUTAG.py scale), graph
      focus, selu state net + trailing BN (MLP.py defaults), softmax output
      net, Adam 1e-3, categorical CE, max_iteration=5, threshold=0.01.
      Writes tf_ref_edges_per_s into BENCH_BASELINE.json, which bench.py
      then uses as the vs_baseline denominator.

  python tools/tf_baseline.py train
      Reduced-budget accuracy run of the reference itself: its own loader
      (load_MUTAG.py), 0.7/0.1/0.2 split, 32-graph merged batches
      (GNN_utils.getbatches semantics), hidden-150 selu BN-free config —
      the same recipe benchmarks/mutag_single.py runs on gnn_tpu — with
      Acc-max early stopping. Env: TF_EPOCHS (default 150), SPLIT_SEED (7),
      TF_SEED (0). Writes TF_ACCURACY.json.

Both the split indices and the graph arrays are taken from gnn_tpu's loader
so the two frameworks consume byte-identical data and identical Tr/Va/Te
membership (the reference's own load_MUTAG has a documented edge-label
misalignment, BASELINE.md; feeding both sides the corrected arrays keeps the
comparison about the *framework*, not the loader defect).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REF = os.environ.get("REF_PATH", "/root/reference")
if REF not in sys.path:
    sys.path.insert(0, REF)

import numpy as np
import tensorflow as tf

from GNN.GNN import GNNgraphBased
from GNN.MLP import MLP as RefMLP
from GNN.graph_class import GraphObject

from gnn_tpu.graphs import utils
from gnn_tpu.graphs.datasets import load_mutag
from gnn_tpu.graphs.graph import Graph

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_CACHE = os.path.join(HERE, "BENCH_BASELINE.json")
MUTAG = os.environ.get("MUTAG_PATH", os.path.join(REF, "MUTAG_raw/"))


def ref_graph(g: Graph) -> GraphObject:
    """Reference GraphObject from a gnn_tpu Graph's arrays (identical data)."""
    return GraphObject(arcs=g.getArcs(), nodes=g.getNodes(),
                       targets=g.getTargets(), problem_based=g.focus,
                       set_mask=g.getSetMask(), output_mask=g.getOutputMask(),
                       sample_weights=g.getSampleWeights(),
                       NodeGraph=g.getNodeGraph(),
                       aggregation_mode=g.aggregation_mode)


def build_ref_gnn(nl, al, dt, *, hidden=None, state_bn=True, dropout=0.1,
                  lr=1e-3, seed=0):
    from GNN.MLP import get_inout_dims as ref_dims
    tf.keras.utils.set_random_seed(seed)
    in_s, l_s = ref_dims("state", nl, al, dt, "g", 0, hidden)
    in_o, l_o = ref_dims("output", nl, al, dt, "g", 0, hidden)
    # ref_dims returns (input, layers) with layers possibly a nested list
    l_s, l_o = list(np.ravel(l_s)), list(np.ravel(l_o))
    dkw = (dict(dropout_rate=dropout, dropout_pos=0, alphadropout=True)
           if dropout else {})
    net_state = RefMLP(input_dim=int(in_s), layers=[int(x) for x in l_s],
                       activations="selu", kernel_initializer="lecun_normal",
                       bias_initializer="lecun_normal",
                       batch_normalization=state_bn, **dkw)
    acts = ["selu"] * (len(l_o) - 1) + ["softmax"]
    net_out = RefMLP(input_dim=int(in_o), layers=[int(x) for x in l_o],
                     activations=acts, kernel_initializer="glorot_normal",
                     bias_initializer="glorot_normal",
                     batch_normalization=False, **dkw)
    return GNNgraphBased(
        net_state, net_out, optimizer=tf.keras.optimizers.Adam(lr),
        loss_function=tf.keras.losses.CategoricalCrossentropy(reduction="none"),
        loss_arguments=None, state_vect_dim=0, max_iteration=5,
        threshold=0.01, addressed_problem="c",
        path_writer="/tmp/tf_ref_writer/")


def training_step(gnn, gT, mean=True):
    """The reference training_step body (GNN_BaseClass.py:231-247), invoked
    through the reference's public surface (the original is a closure)."""
    with tf.GradientTape() as tape:
        it, loss, *_ = gnn.evaluate_single_graph(gT, training=True)
    wS, wO = gnn.trainable_variables()
    dwbS, dwbO = tape.gradient(loss, [wS, wO])
    if not isinstance(it, list):
        it = [it]
    if mean:
        dwbS = [[elem / i for elem in layer] for i, layer in zip(it, dwbS)]
    dW = [i for j in dwbS + dwbO for i in j]
    W = [i for j in wS + wO for i in j]
    gnn.optimizer.apply_gradients(zip(dW, W))
    return it


def cmd_time():
    graphs = load_mutag(MUTAG)
    merged = Graph.merge(graphs, focus="g", aggregation_mode="average")
    E = merged.n_arcs
    gO = ref_graph(merged)
    gT = gnn_checktype(gO)
    gnn = build_ref_gnn(merged.DIM_NODE_LABEL, merged.DIM_ARC_LABEL,
                        merged.DIM_TARGET)
    # warmup (TF function tracing + one apply)
    it = training_step(gnn, gT)
    reps = int(os.environ.get("TF_TIME_REPS", "5"))
    t0 = time.perf_counter()
    iters = []
    for _ in range(reps):
        iters.append(float(np.asarray(training_step(gnn, gT)[0])))
    dt = (time.perf_counter() - t0) / reps
    eps = E * float(np.mean(iters)) / dt
    out = {"tf_ref_train_step_ms": round(dt * 1e3, 1),
           "tf_ref_edges_per_s": round(eps),
           "tf_ref_iters": float(np.mean(iters)),
           "edges": E, "nodes": merged.n_nodes,
           "tf_version": tf.__version__, "threads": os.cpu_count(),
           "note": "actual TF2 reference training_step "
                   "(GNN_BaseClass.py:231-247) on host CPU, merged MUTAG"}
    print(json.dumps(out), flush=True)
    base = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            base = json.load(f)
    base.update(out)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(base, f)


def gnn_checktype(gO):
    from GNN.graph_class import GraphTensor
    return GraphTensor.fromGraphObject(gO)


def cmd_train():
    epochs = int(os.environ.get("TF_EPOCHS", "150"))
    split_seed = int(os.environ.get("SPLIT_SEED", "7"))
    seed = int(os.environ.get("TF_SEED", "0"))
    graphs = load_mutag(MUTAG)
    iTr, iTe, iVa = utils.getindices(len(graphs), 0.7, 0.1, seed=split_seed)
    tr = [ref_graph(graphs[i]) for i in iTr]
    va = [ref_graph(graphs[i]) for i in iVa]
    te = [ref_graph(graphs[i]) for i in iTe]
    gTr = [GraphObject.merge(tr[i:i + 32], problem_based="g",
                             aggregation_mode="average")
           for i in range(0, len(tr), 32)]
    gVa = GraphObject.merge(va, problem_based="g", aggregation_mode="average")
    gTe = GraphObject.merge(te, problem_based="g", aggregation_mode="average")

    # hidden-150 BN-free dropout-free recipe (benchmarks/mutag_single.py)
    gnn = build_ref_gnn(14, 3, 2, hidden=150, state_bn=False, dropout=0.0,
                        seed=seed)
    from GNN.GNN_metrics import Metrics
    gnn.extra_metrics = {"Acc": Metrics["Acc"], "Bacc": Metrics["Bacc"],
                         "Fs": Metrics["Fs"]}
    gnn.mt_args = {"Fs": {"average": "weighted", "zero_division": 0}}
    t0 = time.perf_counter()
    gnn.train(gTr, epochs, gVa, update_freq=10, max_fails=20,
              observed_metric="Acc", policy="max", verbose=2)
    wall = time.perf_counter() - t0
    res = gnn.test(gTe)
    out = {"tf_ref_test": {k: (float(v) if np.isscalar(v) else None)
                           for k, v in res.items()},
           "epochs_budget": epochs, "split_seed": split_seed, "seed": seed,
           "wall_s": round(wall, 1), "tf_version": tf.__version__,
           "config": "hidden-150 selu, BN-free, no dropout, Adam 1e-3 flat, "
                     "batch=32 merged, Acc-max early stop uf=10 mf=20",
           "note": "reference executed as-is on corrected loader arrays; "
                   "same split/config/budget as gnn_tpu matched run"}
    print(json.dumps(out), flush=True)
    name = ("TF_ACCURACY.json" if split_seed == 7
            else f"TF_ACCURACY_s{split_seed}.json")
    with open(os.path.join(HERE, name), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    {"time": cmd_time, "train": cmd_train}[sys.argv[1]]()
