"""Multi-host runtime helpers (DCN scale-out).

The reference is single-process (SURVEY.md §2.3). On a multi-host TPU slice,
call `initialize()` once per process before any jax usage; collectives in the
data/graph meshes then span hosts automatically (XLA routes intra-slice
traffic over ICI and cross-slice over DCN).

Typical layout: each host loads its own shard of merged-graph batches
(host_local_batch_indices), the global mesh spans all devices, and the
DP/hybrid training steps from this package work unchanged — jax's
global-array model assembles per-host shards into the global batch.
"""

from __future__ import annotations

from typing import List, Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper (no-op when already initialised or
    single-process)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialised


def process_info() -> dict:
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}


def host_local_batch_indices(n_batches: int) -> List[int]:
    """Round-robin assignment of batch indices to this host (host-local data
    loading: each process materialises only its shard)."""
    return list(range(jax.process_index(), n_batches, jax.process_count()))


def global_batch_from_local(local_stacked, mesh, axis: str = "data"):
    """Assemble the global stacked GraphBatch from THIS process's local shard.

    Each process stacks only its own batches (graphs/batch.stack_batches over
    host_local_batch_indices picks) with leading dim = its local device count;
    the returned pytree is a global jax.Array sharded P(axis) over the global
    mesh — a drop-in input for make_dp_train_step. Single-process: equivalent
    to data_parallel.shard_batches."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def assemble(x):
        import numpy as np
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(assemble, local_stacked)
