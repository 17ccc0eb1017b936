# placeholder — real implementation lands in the engine milestone
GNNnodeBased = GNNedgeBased = GNNgraphBased = None
