from gnn_tpu.models.core import GNNSpec, gnn_forward, make_train_step
from gnn_tpu.models.gnn import GNNnodeBased, GNNedgeBased, GNNgraphBased
from gnn_tpu.models.lgnn import LGNN

__all__ = ["GNNSpec", "gnn_forward", "make_train_step",
           "GNNnodeBased", "GNNedgeBased", "GNNgraphBased", "LGNN"]
