"""Fused block-dense propagation step (Pallas TPU kernel, feature-major).

One kernel evaluates a full state-transition iteration for a group of
128-node blocks without leaving VMEM (reference hot loop GNN.py:223-242):

    aggT_b   = stateT_b @ adjT_b                (MXU, block-diagonal adjacency)
    inpT_b   = [stateT_b ; aggT_b ; featsT_b]   (VMEM concat — never in HBM)
    stateT'_b = act(W1ᵀ @ inpT_b + b1) · scale + shift

Layout is the whole trick: everything is TRANSPOSED (feature-major,
[D, nodes]) so the 128 nodes of a block fill the 128 lanes and the small
feature dims (D=14 on MUTAG) sit on sublanes. In node-major layout every
[128, D] operand pads D→128 lanes (9× VMEM and vector work — measured 6.9 ms
vs XLA's 3.7 ms in round 2); feature-major drops per-block VMEM from ~1.3 MB
to ~90 KB and makes every MXU pass lane-full. The propagation scan carries
the transposed state; only loop entry/exit transpose (2 relayouts per
forward, not per iteration).

The adjacency operand is adjT_blocks[b, src, dst] (graphs/batch.py builds it
with transposed_adj=True) so stateT @ adjT is the natural MXU orientation.
Mosaic ignores the dot precision attribute, so f32 exactness vs the XLA
HIGHEST path is kept by a manual 3-pass bf16 split (hi/lo) matmul; bf16
operands take the single-pass path.

Gradients: custom VJP with the backward expressed in XLA dot_generals —
exact, used by training configs without dropout/batch-stat BN.
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


def _split16(x):
    """bf16 hi/lo decomposition: x ≈ hi + lo with ~16 mantissa bits kept."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _step_kernel_T(adjT_ref, sT_ref, rT_ref, fT_ref, wT_ref, b_ref, aff_ref,
                   out_ref, *, activation: str, group: int, block_w: int):
    """One grouped fused iteration, fully batched over the g blocks.

    adjT_ref is [n, g, Wb, Wb]: n == 2 ⇒ high-precision mode — the f32
    adjacency arrives pre-split into bf16 hi/lo halves (same HBM bytes as one
    f32 copy) and every matmul runs as a 4-pass bf16 hi/lo product, matching
    XLA's f32 accuracy on the bf16 MXU; n == 1 ⇒ single-pass bf16 mode.
    """
    hp = adjT_ref.shape[0] == 2
    bd = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)
    sT3 = sT_ref[:]                                   # [g, D, Wb]
    if hp:
        s_hi, s_lo = _split16(sT3.astype(jnp.float32))
        a_hi, a_lo = adjT_ref[0], adjT_ref[1]
        agg = (bd(s_hi, a_hi) + bd(s_hi, a_lo)) \
            + (bd(s_lo, a_hi) + bd(s_lo, a_lo))
    else:
        agg = bd(sT3, adjT_ref[0])
    agg = agg + rT_ref[:].astype(jnp.float32)
    inpT = jnp.concatenate(
        [sT3.astype(jnp.float32), agg, fT_ref[:].astype(jnp.float32)],
        axis=1)                                       # [g, In, Wb]
    wT3 = jnp.broadcast_to(wT_ref[:][None], (group,) + wT_ref.shape)
    if hp:
        w_hi, w_lo = _split16(wT3.astype(jnp.float32))
        i_hi, i_lo = _split16(inpT)
        hT = (bd(w_hi, i_hi) + bd(w_hi, i_lo)) \
            + (bd(w_lo, i_hi) + bd(w_lo, i_lo))
    else:
        hT = bd(wT3.astype(sT3.dtype), inpT.astype(sT3.dtype))
    hT = hT + b_ref[:].astype(jnp.float32)            # [g, H, Wb] + [1, H, 1]
    out_ref[:] = (_ACTS[activation](hT) * aff_ref[0:1].astype(jnp.float32)
                  + aff_ref[1:2].astype(jnp.float32)).astype(out_ref.dtype)


def _fused_fwd_impl(adjT_op, stateT3, res_aggT3, featsT3, w1T, b1,
                    affine, *, activation: str, group: int, interpret):
    n, B, Wb, _ = adjT_op.shape
    _, D, _ = stateT3.shape
    F = featsT3.shape[1]
    H = w1T.shape[0]
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_step_kernel_T, activation=activation,
                               group=group, block_w=Wb)
    return pl.pallas_call(
        kernel,
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((n, group, Wb, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, F, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, w1T.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, H, Wb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Wb), stateT3.dtype),
        interpret=interpret,
    )(adjT_op, stateT3, res_aggT3, featsT3, w1T, b1.reshape(1, H, 1),
      affine.reshape(2, H, 1))


def split_adjacency(adjT_blocks):
    """Stack the adjacency for the kernel: f32 → [2, B, Wb, Wb] bf16 hi/lo
    halves (high-precision mode, same total bytes); bf16 → [1, B, Wb, Wb]."""
    if adjT_blocks.dtype == jnp.float32:
        hi, lo = _split16(adjT_blocks)
        return jnp.stack([hi, lo])
    return adjT_blocks[None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_propagation_step(adjT_op, stateT3, res_aggT3, featsT3, w1T, b1,
                           affine=None, activation: str = "tanh",
                           group: int = 9,
                           interpret: Optional[bool] = None):
    """One fused propagation iteration, feature-major blocked layout.

    :param adjT_op: [n, B, Wb, Wb] TRANSPOSED block adjacency stacked by
        split_adjacency — n=2 bf16 hi/lo halves (f32-faithful mode) or n=1
        (bf16 mode). adjT[b, src, dst] = w.
    :param stateT3: [B, D, Wb] node states (block, feature, node-in-block).
    :param res_aggT3: [B, D, Wb] cross-block residual aggregation for the
        current state (zeros when no block-crossing edges).
    :param featsT3: [B, F, Wb] loop-constant features (Σ incoming arc labels).
    :param w1T: [H, 2D+F] TRANSPOSED dense weights; b1: [H].
    :param affine: optional [2, H] (scale; shift) applied after the
        activation — the inference-mode BatchNorm affine. None = identity.
    Returns new stateT3 [B, H, Wb].
    """
    aff = (jnp.stack([jnp.ones_like(b1), jnp.zeros_like(b1)])
           if affine is None else affine)
    return _fused_fwd_impl(adjT_op, stateT3, res_aggT3, featsT3, w1T, b1,
                           aff, activation=activation, group=group,
                           interpret=interpret)


def _fused_fwd_rule(adjT_op, stateT3, res_aggT3, featsT3, w1T, b1, affine,
                    activation, group, interpret):
    aff = (jnp.stack([jnp.ones_like(b1), jnp.zeros_like(b1)])
           if affine is None else affine)
    out = _fused_fwd_impl(adjT_op, stateT3, res_aggT3, featsT3, w1T, b1,
                          aff, activation=activation, group=group,
                          interpret=interpret)
    return out, (adjT_op, stateT3, res_aggT3, featsT3, w1T, b1, affine)


def _act_grad(activation, h):
    if activation == "linear":
        return jnp.ones_like(h)
    if activation == "tanh":
        t = jnp.tanh(h)
        return 1.0 - t * t
    if activation == "relu":
        return (h > 0).astype(h.dtype)
    if activation == "selu":
        return jnp.where(h > 0, 1.0507009873554805,
                         1.0507009873554805 * 1.6732632423543772 * jnp.exp(h))
    raise ValueError(activation)  # pragma: no cover


def _fused_bwd_rule(activation, group, interpret, res, g):
    """XLA backward: recompute the pre-activation, then dense + adjacency
    backprop (adj is data, not a parameter — no cotangent)."""
    adjT_op, sT3, rT3, fT3, w1T, b1, affine = res
    f32 = jnp.float32
    adjT = (adjT_op[0].astype(f32) + adjT_op[1].astype(f32)
            if adjT_op.shape[0] == 2 else adjT_op[0].astype(f32))
    had_affine = affine is not None
    D = sT3.shape[1]
    ein = functools.partial(jnp.einsum, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)

    s3 = sT3.astype(f32)
    aggT = ein("bdj,bjw->bdw", s3, adjT) + rT3.astype(f32)
    inpT = jnp.concatenate([s3, aggT, fT3.astype(f32)], axis=1)  # [B, In, Wb]
    hT = ein("hi,biw->bhw", w1T.astype(f32), inpT) \
        + b1.astype(f32)[None, :, None]

    gy = g.astype(f32)
    if had_affine:
        gy = gy * affine[0].astype(f32)[None, :, None]
    dhT = gy * _act_grad(activation, hT)                         # [B, H, Wb]

    dw1T = ein("bhw,biw->hi", dhT, inpT)
    db1 = jnp.sum(dhT, axis=(0, 2))
    dinpT = ein("hi,bhw->biw", w1T.astype(f32), dhT)             # [B, In, Wb]
    ds_direct = dinpT[:, :D]
    daggT = dinpT[:, D:2 * D]
    dfT3 = dinpT[:, 2 * D:].astype(fT3.dtype)
    # d/dstateT of sT3 @ adjT (contract src): contract daggT's dst with adjT's
    ds_agg = ein("bdw,bjw->bdj", daggT, adjT)
    dsT3 = (ds_direct + ds_agg).astype(sT3.dtype)
    if had_affine:
        y = _ACTS[activation](hT)
        daff = jnp.stack([jnp.sum(g.astype(f32) * y, axis=(0, 2)),
                          jnp.sum(g.astype(f32), axis=(0, 2))]
                         ).astype(affine.dtype)
    else:
        daff = None
    return (None, dsT3, daggT.astype(rT3.dtype), dfT3,
            dw1T.astype(w1T.dtype), db1.astype(b1.dtype), daff)


fused_propagation_step.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def bn_inference_affine(gamma, beta, mean, var, eps: float = 1e-3):
    """[2, H] (scale; shift) for the post-activation inference BatchNorm:
    y = act(h)·scale + shift with scale = γ·rsqrt(σ²+ε), shift = β − μ·scale
    (ops/mlp.py::_batchnorm eval branch; the reference puts BN after the last
    dense+activation, MLP.py:63)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return jnp.stack([scale, beta - mean * scale])


def pick_group(n_blocks: int, cap: int = 45) -> int:
    """Largest divisor of n_blocks within the VMEM budget (feature-major
    blocks cost ~90 KB double-buffered; 45 blocks ≈ 8 MB of the 16 MB limit)."""
    return max(d for d in range(1, cap + 1) if n_blocks % d == 0)


def supports_fused(state_spec, training: bool) -> bool:
    """Static eligibility of the fused kernel for a state MLPSpec."""
    if state_spec.num_layers != 1:
        return False
    if state_spec.activations[0] not in FUSABLE_ACTIVATIONS:
        return False
    if training and (state_spec.dropout_rate or state_spec.batch_normalization):
        return False
    return True
