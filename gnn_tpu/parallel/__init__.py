from gnn_tpu.parallel.mesh import make_mesh
from gnn_tpu.parallel.data_parallel import make_dp_train_step, shard_batches
from gnn_tpu.parallel.edge_shard import make_edge_sharded_train_step, shard_edges

__all__ = ["make_mesh", "make_dp_train_step", "shard_batches",
           "make_edge_sharded_train_step", "shard_edges"]
