from gnn_tpu.graphs.graph import Graph
from gnn_tpu.graphs.batch import GraphBatch

__all__ = ["Graph", "GraphBatch"]
