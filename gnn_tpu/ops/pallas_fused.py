"""Fused block-dense propagation step (Pallas TPU kernel).

One kernel evaluates a full state-transition iteration for a group of
128-node blocks without leaving VMEM (reference hot loop GNN.py:223-242):

    agg_b   = adj_b @ state_b                  (MXU, block-diagonal adjacency)
    inp_b   = [state_b | agg_b | feats_b]      (VMEM concat — never in HBM)
    state'_b = act(inp_b @ W1 + b1)            (MXU + VPU)

The XLA path materialises agg and inp in HBM between fused groups
(NOTES_r1.md roadmap #8); here each block group is streamed HBM→VMEM once,
the adjacency is read exactly once per iteration, and only state' returns to
HBM. pallas_call's BlockSpec pipeline double-buffers the streams.

Scope (the flagship bench shape): single-dense-layer state nets with
labels-are-the-state semantics (get_inout_dims(hidden=None) — MLP.py:103-105).
Batch-norm in INFERENCE mode is supported by folding the affine transform
into (W1, b1) before the call (models/core.py does this); training-mode BN
and dropout take the XLA path. Cross-block (residual) aggregation terms are
added via the feats operand.

Gradients: fused_propagation_step carries a custom VJP whose backward is
expressed in XLA dot_generals (adjacency-transpose bmm + dense transposes) —
exact, and cheap relative to re-materialising the forward intermediates.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "linear": lambda x: x,
    "tanh": jnp.tanh,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "selu": lambda x: 1.0507009873554805 * jnp.where(
        x > 0, x, 1.6732632423543772 * (jnp.exp(x) - 1.0)),
}
FUSABLE_ACTIVATIONS = tuple(_ACTS)


def _step_kernel(adj_ref, s_ref, r_ref, f_ref, w_ref, b_ref, aff_ref,
                 out_ref, *, activation: str, precision):
    g, wb, _ = adj_ref.shape
    d = s_ref.shape[1]
    s = s_ref[:]
    agg = jax.lax.dot_general(
        adj_ref[:], s.reshape(g, wb, d),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision).reshape(g * wb, d).astype(s.dtype)
    # cross-block residual aggregation, computed per iteration by the caller
    agg = agg + r_ref[:]
    inp = jnp.concatenate([s, agg, f_ref[:]], axis=1)
    h = jnp.dot(inp, w_ref[:], preferred_element_type=jnp.float32,
                precision=precision) + b_ref[0].astype(jnp.float32)
    y = _ACTS[activation](h)
    # post-activation affine: inference-mode BatchNorm (the reference puts BN
    # after the last dense+activation, MLP.py:63) — identity when absent
    out_ref[:] = (y * aff_ref[0].astype(jnp.float32)
                  + aff_ref[1].astype(jnp.float32)).astype(out_ref.dtype)


def _fused_fwd_impl(adj_blocks, state, res_agg, feats, w1, b1, affine=None, *,
                    activation: str, group: int, precision, interpret: bool):
    if affine is None:
        affine = jnp.stack([jnp.ones_like(b1), jnp.zeros_like(b1)])
    B, Wb, _ = adj_blocks.shape
    Np, D = state.shape
    F = feats.shape[1]
    H = w1.shape[1]
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        # auto: compiled on TPU, interpreter on CPU (tests / virtual meshes)
        interpret = jax.default_backend() != "tpu"
    grid = (B // group,)
    kernel = functools.partial(_step_kernel, activation=activation,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, Wb, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * Wb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * Wb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * Wb, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[0], H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group * Wb, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, H), state.dtype),
        interpret=interpret,
    )(adj_blocks, state, res_agg, feats, w1, b1.reshape(1, H), affine)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_propagation_step(adj_blocks, state, res_agg, feats, w1, b1,
                           affine=None, activation: str = "tanh",
                           group: int = 8,
                           precision=jax.lax.Precision.HIGHEST,
                           interpret: Optional[bool] = None):
    """(act([state | adj@state | feats] @ W1 + b1)) · scale + shift — one
    fused propagation iteration.

    :param adj_blocks: [B, Wb, Wb] block-diagonal adjacency (graphs/batch.py).
    :param state: [B·Wb, D] node states.
    :param res_agg: [B·Wb, D] cross-block residual aggregation for the
        CURRENT state (zeros when the batch has no block-crossing edges) —
        added to the in-block aggregation before the concat.
    :param feats: [B·Wb, F] per-node loop-constant features (Σ incoming arc
        labels).
    :param w1/b1: the single dense layer of the state net.
    :param affine: optional [2, H] (scale; shift) applied AFTER the
        activation — the inference-mode BatchNorm affine. None = identity.
    :param activation: one of FUSABLE_ACTIVATIONS.
    :param group: blocks per grid step (VMEM budget knob; 8 → ~0.5 MB/buffer).
    """
    return _fused_fwd_impl(adj_blocks, state, res_agg, feats, w1, b1, affine,
                           activation=activation, group=group,
                           precision=precision, interpret=interpret)


def _fused_fwd_rule(adj_blocks, state, res_agg, feats, w1, b1, affine,
                    activation, group, precision, interpret):
    out = _fused_fwd_impl(adj_blocks, state, res_agg, feats, w1, b1, affine,
                          activation=activation, group=group,
                          precision=precision, interpret=interpret)
    return out, (adj_blocks, state, res_agg, feats, w1, b1, affine)


def _fused_bwd_rule(activation, group, precision, interpret, res, g):
    """XLA backward: recompute the (cheap) pre-activation, then standard
    dense + adjacency-transpose backprop. adj is treated as a constant
    (aggregation weights are data, not parameters)."""
    adj_blocks, state, res_agg, feats, w1, b1, affine = res
    if affine is not None:
        scale = affine[0].astype(jnp.float32)
        daffine_scale_pre = g.astype(jnp.float32)   # needs y; computed below
        g = g * affine[0]
    else:
        scale = None
    B, Wb, _ = adj_blocks.shape
    Np, D = state.shape

    agg = jax.lax.dot_general(
        adj_blocks, state.reshape(B, Wb, D),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision).reshape(Np, D).astype(state.dtype) + res_agg
    inp = jnp.concatenate([state, agg, feats], axis=1)
    h = jnp.dot(inp, w1, preferred_element_type=jnp.float32,
                precision=precision) + b1.astype(jnp.float32)

    if activation == "linear":
        dh = g.astype(jnp.float32)
    elif activation == "tanh":
        t = jnp.tanh(h)
        dh = g.astype(jnp.float32) * (1.0 - t * t)
    elif activation == "relu":
        dh = g.astype(jnp.float32) * (h > 0)
    elif activation == "selu":
        dh = g.astype(jnp.float32) * jnp.where(
            h > 0, 1.0507009873554805,
            1.0507009873554805 * 1.6732632423543772 * jnp.exp(h))
    else:  # pragma: no cover
        raise ValueError(activation)

    dw1 = jnp.dot(inp.astype(jnp.float32).T, dh,
                  preferred_element_type=jnp.float32, precision=precision)
    db1 = jnp.sum(dh, axis=0)
    dinp = jnp.dot(dh, w1.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32, precision=precision)
    F = feats.shape[1]
    ds_direct = dinp[:, :D]
    dagg = dinp[:, D:2 * D]
    dfeats = dinp[:, 2 * D:2 * D + F].astype(feats.dtype)
    # d/dstate of adj@state: adj^T bmm (block transpose, same block layout)
    ds_agg = jax.lax.dot_general(
        adj_blocks, dagg.reshape(B, Wb, D),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision).reshape(Np, D)
    dstate = (ds_direct + ds_agg).astype(state.dtype)
    dres = dagg.astype(res_agg.dtype)   # res_agg enters agg additively
    if scale is not None:
        y = _ACTS[activation](h)
        daff = jnp.stack([jnp.sum(daffine_scale_pre * y, axis=0),
                          jnp.sum(daffine_scale_pre, axis=0)]).astype(affine.dtype)
    else:
        daff = None
    return (None, dstate, dres, dfeats, dw1.astype(w1.dtype),
            db1.astype(b1.dtype), daff)


fused_propagation_step.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def bn_inference_affine(gamma, beta, mean, var, eps: float = 1e-3):
    """[2, H] (scale; shift) for the post-activation inference BatchNorm:
    y = act(h)·scale + shift with scale = γ·rsqrt(σ²+ε), shift = β - μ·scale
    (ops/mlp.py::_batchnorm eval branch; the reference puts BN after the last
    dense+activation, MLP.py:63)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return jnp.stack([scale, beta - mean * scale])


def supports_fused(state_spec, training: bool) -> bool:
    """Static eligibility of the fused kernel for a state MLPSpec."""
    if state_spec.num_layers != 1:
        return False
    if state_spec.activations[0] not in FUSABLE_ACTIVATIONS:
        return False
    if training and (state_spec.dropout_rate or state_spec.batch_normalization):
        return False
    return True
