"""Pallas TPU kernel: fused gather + weighted segment-sum aggregation as
block-sparse one-hot matmuls on the MXU.

The hot op of the framework (reference SpMMs GNN.py:234,259,263) is

    agg[n] = Σ_{e: dst_e = n} w_e * state[src_e]          (A^T @ S)

XLA lowers the gather and the scatter-add serially on TPU (~40M edges/s
measured — 100x off HBM speed-of-light). This kernel reformulates both sides
as dense one-hot matmuls over adjacency *tiles*:

  * Edges are grouped by (dst_block, src_block) tiles of a W x W node
    blocking and padded to C-edge chunks (host-side plan, build_agg_plan).
  * Per chunk: gather  = G @ state_block   with G[e,i] = (src_local_e == i)
               scatter = S @ messages      with S[i,e] = w_e·(dst_local_e == i)
    Both land on the MXU; FLOPs per edge = 2·W·D (W=256, D~16 -> ~8 KFLOP,
    trivially amortised by the systolic array).
  * Chunks arrive sorted by dst_block, so the output block is revisited
    consecutively and accumulated in VMEM, zero-initialised on first visit.

The op is linear in `state`; its VJP is the same kernel with src/dst roles
swapped (the transpose plan), so gradients flow through `lax.scan` exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_INTERPRET_PLATFORMS = ("cpu",)


@struct.dataclass
class AggPlan:
    """Chunked block-sparse execution plan (one direction)."""
    src_local: jnp.ndarray      # [n_chunks, C] int32 — src id within src block
    dst_local: jnp.ndarray      # [n_chunks, C] int32 — dst id within dst block
    w: jnp.ndarray              # [n_chunks, C] float — edge weight (0 = pad)
    chunk_src_blk: jnp.ndarray  # [n_chunks] int32
    chunk_dst_blk: jnp.ndarray  # [n_chunks] int32
    block_w: int = struct.field(pytree_node=False, default=256)
    chunk_c: int = struct.field(pytree_node=False, default=256)


@struct.dataclass
class AggPlanPair:
    fwd: AggPlan
    bwd: AggPlan  # transpose (src/dst swapped) for the VJP


def _build_one(src, dst, w, num_nodes: int, W: int, C: int) -> AggPlan:
    # fully vectorised chunking: order edges by (dst_block, src_block) tile,
    # pad each tile's edge list to a multiple of C, scatter into [K, C] slots
    sb = src // W
    db = dst // W
    order = np.lexsort((sb, db))
    src_o, dst_o, w_o = src[order], dst[order], w[order]
    sb_o, db_o = sb[order], db[order]

    tile_key = db_o.astype(np.int64) * (num_nodes // W + 1) + sb_o
    _, tile_ids, counts = np.unique(tile_key, return_inverse=True, return_counts=True)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(src_o)) - starts[tile_ids]       # rank within tile

    k_per_tile = -(-counts // C)                          # chunks per tile
    chunk_base = np.concatenate([[0], np.cumsum(k_per_tile)[:-1]])
    K = int(k_per_tile.sum())
    chunk_idx = chunk_base[tile_ids] + pos // C
    slot = pos % C

    src_local = np.zeros((K, C), np.int32)
    dst_local = np.zeros((K, C), np.int32)
    ww = np.zeros((K, C), w_o.dtype)
    src_local[chunk_idx, slot] = (src_o % W).astype(np.int32)
    dst_local[chunk_idx, slot] = (dst_o % W).astype(np.int32)
    ww[chunk_idx, slot] = w_o

    tile_first = starts                                   # first edge per tile
    csb = np.repeat(sb_o[tile_first], k_per_tile).astype(np.int32)
    cdb = np.repeat(db_o[tile_first], k_per_tile).astype(np.int32)
    return _pad_plan(src_local, dst_local, ww, csb, cdb, W, C, num_nodes)


def _pad_plan(src_local, dst_local, ww, csb, cdb, W, C, num_nodes=None) -> AggPlan:
    """Finalize a chunk plan:

    1. Coverage: every destination node block must be visited at least once so
       its output rows get zero-initialised on hardware (unvisited pallas
       output blocks are undefined memory). Missing blocks get one zero-weight
       chunk, merged in dst-block order.
    2. Alignment: pad chunk count to a multiple of 8 (chunk rows are loaded in
       8-row groups). Padding chunks are no-ops (weight 0, repeat last ids).
    """
    K = src_local.shape[0]
    if num_nodes is not None:
        n_blocks = num_nodes // W
        missing = np.setdiff1d(np.arange(n_blocks, dtype=np.int32),
                               np.unique(cdb), assume_unique=True)
        if len(missing):
            m = len(missing)
            src_local = np.concatenate([src_local, np.zeros((m, C), np.int32)])
            dst_local = np.concatenate([dst_local, np.zeros((m, C), np.int32)])
            ww = np.concatenate([ww, np.zeros((m, C), ww.dtype)])
            csb = np.concatenate([csb, missing])  # any valid src block id
            cdb = np.concatenate([cdb, missing])
            order = np.argsort(cdb, kind="stable")
            src_local, dst_local = src_local[order], dst_local[order]
            ww, csb, cdb = ww[order], csb[order], cdb[order]
            K = src_local.shape[0]
    K8 = max(-(-K // 8) * 8, 8)
    if K8 != K:
        pad = K8 - K
        src_local = np.concatenate([src_local, np.zeros((pad, C), np.int32)])
        dst_local = np.concatenate([dst_local, np.zeros((pad, C), np.int32)])
        ww = np.concatenate([ww, np.zeros((pad, C), ww.dtype)])
        last_s = csb[-1] if K else 0
        last_d = cdb[-1] if K else 0
        csb = np.concatenate([csb, np.full(pad, last_s, np.int32)])
        cdb = np.concatenate([cdb, np.full(pad, last_d, np.int32)])
    return AggPlan(
        src_local=jnp.asarray(src_local), dst_local=jnp.asarray(dst_local),
        w=jnp.asarray(ww), chunk_src_blk=jnp.asarray(csb),
        chunk_dst_blk=jnp.asarray(cdb), block_w=W, chunk_c=C)


def build_agg_plan(src, dst, weights, num_nodes: int, *, block_w: int = 256,
                   chunk_c: int = 256) -> AggPlanPair:
    """Build forward + transpose execution plans (host side, once per batch).

    :param src/dst: int arrays [E] (padded edges allowed if their weight is 0).
    :param weights: [E] aggregation weights.
    :param num_nodes: padded node count; must be a multiple of block_w
        (block_w is halved automatically until it divides).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(weights)
    W = block_w
    while num_nodes % W and W > 8:
        W //= 2
    if num_nodes % W:
        raise ValueError(f"num_nodes {num_nodes} not divisible by any block size")

    # native C++ chunker when available (gnn_tpu/native, ~100x the numpy path)
    try:
        from gnn_tpu import native
        if native.available():
            def build(a, b):
                res = native.plan_chunks(a, b, w, W, chunk_c)
                return _pad_plan(*res, W, chunk_c, num_nodes)
            return AggPlanPair(fwd=build(src, dst), bwd=build(dst, src))
    except Exception:
        pass
    fwd = _build_one(src, dst, w, num_nodes, W, chunk_c)
    bwd = _build_one(dst, src, w, num_nodes, W, chunk_c)  # transpose
    return AggPlanPair(fwd=fwd, bwd=bwd)


# ---------------------------------------------------------------- the kernel
def _agg_kernel(csb_ref, cdb_ref, state_ref, src_ref, dst_ref, w_ref, out_ref,
                *, C: int, W: int):
    c = pl.program_id(0)
    prev = jnp.maximum(c - 1, 0)
    is_first = (c == 0) | (cdb_ref[c] != cdb_ref[prev])

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r = c % 8                                     # row within the 8-row group
    src_local = src_ref[r, :]                     # [C] int32 in [0, W)
    dst_local = dst_ref[r, :]
    w = w_ref[r, :]

    # matmul precision: one-hot entries are exact in bf16, but f32 state
    # must not be rounded — HIGHEST keeps f32 accuracy on the MXU (3-pass);
    # bf16 state uses the fast path naturally.
    prec = (jax.lax.Precision.HIGHEST if state_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # gather as one-hot matmul: G[e, i] = (src_local_e == i)  -> [C, W]
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    G = (src_local[:, None] == iota_cw).astype(state_ref.dtype)
    msgs = jnp.dot(G, state_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)

    # weighted scatter as one-hot matmul: S[i, e] = w_e·(dst_local_e == i)
    S = (dst_local[None, :] == jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)) \
        .astype(state_ref.dtype) * w[None, :]
    out_ref[:] += jnp.dot(S, msgs.astype(state_ref.dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec).astype(out_ref.dtype)


try:  # import guarded so CPU-only environments still import the module
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _run_plan(state: jnp.ndarray, plan: AggPlan, interpret: bool) -> jnp.ndarray:
    N, D = state.shape
    W, C = plan.block_w, plan.chunk_c
    n_chunks = plan.src_local.shape[0]
    kernel = functools.partial(_agg_kernel, C=C, W=W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk_src_blk, chunk_dst_blk
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((W, D), lambda c, csb, cdb: (csb[c], 0)),   # state
            # chunk rows travel in 8-row groups (Mosaic block alignment);
            # the kernel picks row c % 8
            pl.BlockSpec((8, C), lambda c, csb, cdb: (c // 8, 0)),   # src_local
            pl.BlockSpec((8, C), lambda c, csb, cdb: (c // 8, 0)),   # dst_local
            pl.BlockSpec((8, C), lambda c, csb, cdb: (c // 8, 0)),   # w
        ],
        out_specs=pl.BlockSpec((W, D), lambda c, csb, cdb: (cdb[c], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, D), state.dtype),
        interpret=interpret,
    )(plan.chunk_src_blk, plan.chunk_dst_blk, state,
      plan.src_local, plan.dst_local, plan.w.astype(state.dtype))


def _zero_ct(x):
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


def _should_interpret() -> bool:
    return jax.default_backend() in _INTERPRET_PLATFORMS


def _plan_to_leaves(plan: AggPlan):
    return (plan.src_local, plan.dst_local, plan.w,
            plan.chunk_src_blk, plan.chunk_dst_blk)


def _leaves_to_plan(leaves, statics) -> AggPlan:
    W, C = statics
    return AggPlan(src_local=leaves[0], dst_local=leaves[1], w=leaves[2],
                   chunk_src_blk=leaves[3], chunk_dst_blk=leaves[4],
                   block_w=W, chunk_c=C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _block_aggregate(statics, state, fwd_leaves, bwd_leaves):
    plan = _leaves_to_plan(fwd_leaves, statics)
    return _run_plan(state, plan, _should_interpret())


def _ba_fwd(statics, state, fwd_leaves, bwd_leaves):
    out = _block_aggregate(statics, state, fwd_leaves, bwd_leaves)
    return out, (fwd_leaves, bwd_leaves)


def _ba_bwd(statics, res, ct):
    fwd_leaves, bwd_leaves = res
    plan_t = _leaves_to_plan(bwd_leaves, statics)
    d_state = _run_plan(ct, plan_t, _should_interpret())
    return (d_state,
            tuple(_zero_ct(x) for x in fwd_leaves),
            tuple(_zero_ct(x) for x in bwd_leaves))


_block_aggregate.defvjp(_ba_fwd, _ba_bwd)


def block_aggregate(state: jnp.ndarray, plans: AggPlanPair) -> jnp.ndarray:
    """Fused gather + weighted segment aggregation: agg = A^T_w @ state.

    Differentiable (exact linear transpose via the swapped-role plan)."""
    statics = (plans.fwd.block_w, plans.fwd.chunk_c)
    return _block_aggregate(statics, state, _plan_to_leaves(plans.fwd),
                            _plan_to_leaves(plans.bwd))
