from gnn_tpu.parallel.mesh import make_mesh
from gnn_tpu.parallel.data_parallel import make_dp_train_step, shard_batches
from gnn_tpu.parallel.edge_shard import make_edge_sharded_train_step, shard_edges
from gnn_tpu.parallel.node_shard import (make_node_sharded_forward,
                                         make_node_sharded_train_step, shard_nodes)

__all__ = ["make_mesh", "make_dp_train_step", "shard_batches",
           "make_edge_sharded_train_step", "shard_edges",
           "make_node_sharded_train_step", "make_node_sharded_forward",
           "shard_nodes"]
