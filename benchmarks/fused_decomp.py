"""Decompose the fused-kernel forward cost on the chip.

One MODE per fresh process (axon timing discipline — NOTES_r1.md):

  kernel5       scan of 5 fused_propagation_step calls, nothing else
  kernel5_res   + per-iteration residual (from3 -> segment_sum -> to3)
  kernel5_conv  + convergence norms/wheres (the full fused loop body)
  xla5          the XLA node-major equivalent body (bmm HIGHEST + concat
                + dense + selu + BN affine), no convergence
  xla5_conv     xla5 + convergence norms/wheres

Usage: PYTHONUNBUFFERED=1 python benchmarks/fused_decomp.py <mode>
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MODE = sys.argv[1] if len(sys.argv) > 1 else "kernel5"
STEPS = int(os.environ.get("BENCH_STEPS", "10"))

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.batch import from_graphs_blocked
from gnn_tpu.graphs.datasets import load_mutag
from gnn_tpu.ops.pallas_fused import (bn_inference_affine, from_blocks_fm,
                                      fused_propagation_step, pack_adjacency,
                                      pick_group, to_blocks_fm)

graphs = load_mutag(os.environ.get("MUTAG_PATH", "/root/reference/MUTAG_raw/"))
gb = from_graphs_blocked(graphs, block_w=128)

Bb, Wb, _ = gb.adj_blocks.shape
Np = gb.n_node_pad
D = gb.nodes.shape[1]
H = D
In = 2 * D + gb.arc_labels.shape[1]
group = pick_group(Bb)
print(f"blocks={Bb} group={group} grid={Bb // group} res_edges={gb.res_src.shape[0]}",
      file=sys.stderr)

rng = np.random.default_rng(0)
w1 = jnp.asarray(rng.standard_normal((In, H)), jnp.float32) * 0.1
b1 = jnp.zeros((H,), jnp.float32)
affine = bn_inference_affine(jnp.ones((H,)), jnp.zeros((H,)),
                             jnp.zeros((H,)), jnp.ones((H,)))
adjT = jnp.swapaxes(gb.adj_blocks, 1, 2)
adj_pack = pack_adjacency(adjT)
thr = jnp.float32(0.01)
nm3 = gb.node_mask.reshape(Bb, Wb)


def to3(x):
    return to_blocks_fm(x, Wb)


from3 = from_blocks_fm


featsT3 = to3(gb.agg_arcs_cache.astype(jnp.float32))
s0 = to3(gb.nodes.astype(jnp.float32))


w1T = w1.T
Wa = w1T[:, D:2 * D]
w2 = jnp.concatenate([w1T[:, :D], Wa], axis=0)
fT3H = jnp.einsum("hf,bfw->bhw", w1T[:, 2 * D:], featsT3,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST) + b1[None, :, None]


def fused_step(sT3, with_res):
    if with_res:
        flat = from3(sT3)
        vals = jnp.take(flat, gb.res_src, axis=0) * gb.res_w[:, None]
        resH = jax.ops.segment_sum(
            jnp.einsum("ed,hd->eh", vals.astype(jnp.float32), Wa),
            gb.res_dst, num_segments=Np).astype(sT3.dtype)
        rT3H = to3(resH)
    else:
        rT3H = None
    return fused_propagation_step(adj_pack, sT3, rT3H, fT3H, w2,
                                  affine, activation="selu", group=group)


if MODE in ("kernel5", "kernel5_res"):
    with_res = MODE == "kernel5_res"

    @jax.jit
    def run(s):
        def body(c, _):
            return fused_step(c, with_res), None
        out, _ = jax.lax.scan(body, s, None, length=5)
        return out

elif MODE == "kernel5_conv":

    @jax.jit
    def run(s):
        def body(carry, _):
            k, sT3, sT3_old, active = carry
            diff = (sT3 - sT3_old).astype(jnp.float32)
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))
            norm = jnp.sqrt(jnp.sum(jnp.square(sT3_old.astype(jnp.float32)),
                                    axis=1))
            moving = (dist > thr * norm) & nm3
            active = active & jnp.any(moving)
            new3 = fused_step(sT3, True)
            sT3_next = jnp.where(active, new3.astype(sT3.dtype), sT3)
            sT3_old_next = jnp.where(active, sT3, sT3_old)
            return (k + active.astype(jnp.float32), sT3_next, sT3_old_next,
                    active), None
        carry0 = (jnp.float32(0.0), s, jnp.ones_like(s), jnp.bool_(True))
        (k, out, _, _), _ = jax.lax.scan(body, carry0, None, length=5)
        return out

elif MODE in ("xla5", "xla5_conv"):
    prec = jax.lax.Precision.HIGHEST
    feats = gb.agg_arcs_cache.astype(jnp.float32)
    nm = gb.node_mask

    def xla_step(state):
        agg = jax.lax.dot_general(
            gb.adj_blocks, state.reshape(Bb, Wb, D),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec).reshape(Np, D)
        res = jax.ops.segment_sum(
            jnp.take(state, gb.res_src, axis=0) * gb.res_w[:, None],
            gb.res_dst, num_segments=Np)
        inp = jnp.concatenate([state, agg + res, feats], axis=1)
        h = jnp.dot(inp, w1, preferred_element_type=jnp.float32,
                    precision=prec) + b1
        y = 1.0507009873554805 * jnp.where(
            h > 0, h, 1.6732632423543772 * (jnp.exp(h) - 1.0))
        return y * affine[0] + affine[1]

    if MODE == "xla5":

        @jax.jit
        def run(s):
            def body(c, _):
                return xla_step(c), None
            out, _ = jax.lax.scan(body, s, None, length=5)
            return out
    else:

        @jax.jit
        def run(s):
            def body(carry, _):
                k, state, state_old, active = carry
                diff = (state - state_old).astype(jnp.float32)
                dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))
                norm = jnp.sqrt(jnp.sum(jnp.square(state_old), axis=1))
                moving = (dist > thr * norm) & nm
                active = active & jnp.any(moving)
                new = xla_step(state)
                s_next = jnp.where(active, new, state)
                s_old_next = jnp.where(active, state, state_old)
                return (k + active.astype(jnp.float32), s_next, s_old_next,
                        active), None
            carry0 = (jnp.float32(0.0), s, jnp.ones_like(s), jnp.bool_(True))
            (k, out, _, _), _ = jax.lax.scan(body, carry0, None, length=5)
            return out

    s0 = gb.nodes.astype(jnp.float32)
else:
    raise SystemExit(f"unknown mode {MODE}")

s = run(s0)
jax.block_until_ready(s)
# tanh-squash to keep the chained state finite across timed steps
squash = jax.jit(jnp.tanh)
dt = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s = run(squash(s))
    jax.block_until_ready(s)
    dt = min(dt, (time.perf_counter() - t0) / STEPS)
print(f'{{"mode": "{MODE}", "ms": {dt * 1e3:.3f}}}')
