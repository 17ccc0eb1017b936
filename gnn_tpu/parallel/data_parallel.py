"""Synchronous data parallelism over a named mesh axis.

One merged-graph batch per device; each replica computes its gradients (with
the reference's per-batch state-grad/iterations division, GNN_BaseClass.py:
239-241, applied per replica), gradients are `psum`-averaged over ICI, and the
replicated optimizer applies one update. Batch-norm states are `pmean`-ed —
the synchronous-large-batch analogue of the reference's sequential updates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_tpu.graphs.batch import GraphBatch, stack_batches
from gnn_tpu.models.core import GNNSpec, evaluate_single, regularization
from gnn_tpu.training.optimizers import make_optimizer


def shard_batches(batches, mesh: Mesh, axis: str = "data") -> GraphBatch:
    """Stack equal-shape GraphBatches and place them sharded over mesh[axis]
    (leading device dimension)."""
    n = mesh.shape[axis]
    if len(batches) != n:
        raise ValueError(f"need exactly {n} batches for axis {axis!r}, got {len(batches)}")
    stacked = stack_batches(batches)
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), stacked)


def make_dp_train_step(spec: GNNSpec, loss_name: str, loss_args: Optional[dict],
                       optimizer_cfg: dict, mesh: Mesh, axis: str = "data",
                       mean: bool = True):
    """Build a jitted data-parallel training step.

    step(params, bn, opt_state, stacked_gb, rngs) -> (params, bn, opt_state, iters)
      stacked_gb: GraphBatch with leading device axis (see shard_batches)
      rngs:       jax.random.split(key, n_devices)
    """
    loss_args = dict(loss_args or {})
    opt = make_optimizer(optimizer_cfg)
    n_dev = mesh.shape[axis]

    def per_replica(params, bn, gb, rng):
        # shard_map hands each replica its slice with leading dim 1
        gb = jax.tree_util.tree_map(lambda x: x[0], gb)
        rng = rng[0]

        def loss_fn(p):
            iters, loss, res = evaluate_single(spec, p, bn, gb, rng, loss_name,
                                               loss_args, training=True)
            return loss + regularization(spec, p), (iters, res["bn"])

        grads, (iters, new_bn) = jax.grad(loss_fn, has_aux=True)(params)
        if mean:
            denom = jnp.maximum(iters, 1.0)
            grads = {**grads, "state": jax.tree_util.tree_map(
                lambda g: g / denom, grads["state"])}
        # allreduce over ICI: average gradients and BN states across replicas
        grads = jax.lax.pmean(grads, axis)
        new_bn = jax.lax.pmean(new_bn, axis)
        iters = jax.lax.pmean(iters, axis)
        return grads, new_bn, iters

    mapped = jax.shard_map(
        per_replica, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(params, bn, opt_state, stacked_gb, rngs):
        grads, new_bn, iters = mapped(params, bn, stacked_gb, rngs)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_bn, opt_state, iters

    return step
