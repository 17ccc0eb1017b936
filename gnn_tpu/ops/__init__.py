from gnn_tpu.ops.aggregate import aggregate_to_nodes, pool_graphs, scatter_src
from gnn_tpu.ops.mlp import MLPSpec, mlp_init, mlp_apply, get_inout_dims

__all__ = [
    "aggregate_to_nodes", "pool_graphs", "scatter_src",
    "MLPSpec", "mlp_init", "mlp_apply", "get_inout_dims",
]
