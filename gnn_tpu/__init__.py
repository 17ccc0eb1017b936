"""gnn_tpu — a TPU-native (JAX/XLA/Pallas) framework for the Scarselli GNN / LGNN family.

Re-designed from scratch with the capabilities of the reference framework
sailab-code/GNN_tf_2.x (see /root/reference): fixed-point "state propagation until
convergence" Graph Neural Networks (Scarselli et al., 2009) and Layered GNNs
(Bandinelli et al., 2010), with node / edge / graph problem focuses, three
aggregation modes, early-stopped training, metrics/ROC/PR reporting, LKO
cross-validation, merge-based graph batching, dataset I/O and model save/load —
plus TPU-first additions the reference lacks: static-shape padded device batches,
`lax.scan` convergence loops with exact reverse-mode gradients, Pallas
segment-aggregation kernels, and `shard_map`-based data / edge parallelism over a
`jax.sharding.Mesh`.

Layer map (mirrors reference layers, see SURVEY.md §1):
  graphs/   — host `Graph` + device `GraphBatch`    (ref: GNN/graph_class.py)
  ops/      — aggregation kernels + pure MLP        (ref: TF sparse ops, GNN/MLP.py)
  models/   — GNN / LGNN + training engine          (ref: GNN/GNN.py, LGNN.py, GNN_BaseClass.py)
  metrics   — metric registry, ROC / PR curves      (ref: GNN/GNN_metrics.py)
  parallel/ — mesh, DP, edge-sharded propagation    (ref: none — new, TPU-native)
"""

__version__ = "0.1.0"

from gnn_tpu.config import floatx, set_floatx
from gnn_tpu.graphs.graph import Graph, GraphObject
from gnn_tpu.graphs.batch import GraphBatch
from gnn_tpu.graphs.generator import GraphDataGenerator, SingleGraphDataGenerator
from gnn_tpu.models.gnn import (GNNnodeBased, GNNedgeBased, GNNgraphBased,
                                CompositeGNNnodeBased, CompositeGNNedgeBased,
                                CompositeGNNgraphBased)
from gnn_tpu.models.lgnn import LGNN
from gnn_tpu.graphs.typed import (composite_get_inout_dims, pack_typed_labels,
                                  typed_label_offsets)
from gnn_tpu.models.composite import (CompositeGNNSpec, composite_forward,
                                      composite_init, make_composite_train_step,
                                      make_composite_eval_step,
                                      make_composite_dp_train_step,
                                      make_composite_edge_sharded_train_step)
from gnn_tpu.ops.mlp import MLPSpec, get_inout_dims
from gnn_tpu.serving import BigGraphPredictor, Predictor, ShardedPredictor

__all__ = [
    "Predictor", "ShardedPredictor", "BigGraphPredictor",
    "Graph", "GraphObject", "GraphBatch", "GraphDataGenerator",
    "SingleGraphDataGenerator", "GNNnodeBased", "GNNedgeBased", "GNNgraphBased",
    "LGNN", "MLPSpec", "get_inout_dims", "floatx", "set_floatx",
    "CompositeGNNSpec", "composite_init", "composite_forward",
    "pack_typed_labels", "typed_label_offsets", "composite_get_inout_dims",
    "make_composite_train_step", "make_composite_eval_step",
    "CompositeGNNnodeBased", "CompositeGNNedgeBased", "CompositeGNNgraphBased",
    "make_composite_dp_train_step", "make_composite_edge_sharded_train_step",
]
