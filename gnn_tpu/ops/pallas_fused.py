"""Fused block-dense propagation step (Pallas TPU kernel, feature-major).

One kernel evaluates a full state-transition iteration for a group of
128-node blocks without leaving VMEM (reference hot loop GNN.py:223-242).
The dense layer is REASSOCIATED through the aggregation so the loop body
collapses to two MXU issues per block:

    W1T @ [s ; agg ; feats] + b
      = Ws@s + Wa@(s@adjT + res) + (Wf@feats + b)
      = [Ws;Wa]@s  ->  U            (issue 1)
        U[H:] @ adjT -> A           (issue 2)
        act(U[:H] + A + rT' + fT') * scale + shift

with fT' = Wf@feats + b hoisted out of the scan (loop-invariant) and
rT' = Wa@res folded into the residual-edge segment sum by the caller
(both linear, so the reassociation is exact in real arithmetic).

Layout is feature-major ([D, nodes] per block): the 128 nodes of a block
fill the 128 lanes and the small feature dims sit on sublanes. Mosaic
ignores the dot precision attribute, so f32 exactness class is kept by
bf16 hi/lo emulation — and the hi/lo passes are PACKED into the two
issues instead of multiplying them:

  * issue 1 stacks [W2_hi; W2_lo] on rows and [s_hi | s_lo] on columns:
    one [4H, D] @ [D, 2Wb] product whose four H x Wb quadrants sum to
    the exact 4-pass result.
  * issue 2 stacks [Ua_hi; Ua_lo] on rows against the PRE-PACKED
    adjacency [a_hi | a_lo] ([Wb, 2Wb], same HBM bytes as one f32 copy).

This matters because the per-block products are tiny (D ~ 5-20 rows):
the cost of the old 8-issue body was MXU issue latency, not FLOPs or
HBM — measured 4.2 ms for a 5-iteration MUTAG scan vs ~0.5 ms of
adjacency traffic at HBM speed.

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

from gnn_tpu.ops.mlp import _ALPHA_P

_ACTS = {
    "linear": lambda x: x,
    "tanh": jnp.tanh,
    "relu": lambda x: jnp.maximum(x, 0.0),
    # the exp argument is clamped to <= 0 so reverse-mode through the XLA
    # uses of this table (dep-block bodies, kernel VJP rules) never computes
    # cotangent * exp(large) = 0 * inf = NaN (found by fuzz_parity). Uses
    # exp(x) - 1 rather than jax.nn.selu's expm1 because Mosaic has no
    # expm1 lowering (hw_validate round-2 regression); the difference is
    # <= ~1e-7 absolute for x <= 0, far below kernel-vs-XLA tolerances.
    "selu": lambda x: 1.0507009873554805 * jnp.where(
        x > 0, x,
        1.6732632423543772 * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0)),
}
FUSABLE_ACTIVATIONS = tuple(_ACTS)


def _split16(x):
    """bf16 hi/lo decomposition: x ≈ hi + lo with ~16 mantissa bits kept."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# Kernel-interior dots pin DEFAULT precision explicitly: these run inside
# Mosaic, where bf16 operands are single-pass MXU issues no matter what, and
# an ambient jax.default_matmul_precision("highest") context (e.g. around an
# exactness check) would otherwise tag them fp32-contract — which Mosaic
# rejects for bf16 lhs ("Bad lhs type"). f32 faithfulness inside the kernels
# comes from the hi/lo packing, not from a precision attribute.
_BD = functools.partial(jax.lax.dot_general,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)

# batched contraction over the LAST axis of both operands (x · adjᵀ-style)
_BDT = functools.partial(jax.lax.dot_general,
                         dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)

# f32 × f32 contraction for the backward kernels' dw accumulators: at
# DEFAULT precision Mosaic lowers an f32 matmul as a single bf16 pass,
# which costs ~1e-3 absolute in the weight gradients on hardware
# (hw_validate round-2 finding); HIGHEST forces the 3-pass f32 emulation.
# The dw products are tiny ([g, R, C] with R, C <= ~2H) so the extra
# passes are noise next to the adjacency stream.
_BDT_HI = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


def _contract_dst(x, adj, *, hp: bool):
    """x @ adjTᵀ contracting the (possibly hi/lo-PACKED) dst axis of adjT.
    Full hi/lo product needs the cross terms, so stack
    [x_hi|x_lo ; x_lo|x_hi] on rows against the packed [a_hi | a_lo]
    columns and sum the halves (exact 4-pass). x [g, R, Wb] f32."""
    if not hp:
        return _BDT(x.astype(adj.dtype), adj)
    Wb = adj.shape[1]
    x_hi, x_lo = _split16(x)
    top = jnp.concatenate([x_hi, x_lo], axis=2)
    bot = jnp.concatenate([x_lo, x_hi], axis=2)
    xb = jnp.concatenate([top, bot], axis=1)              # [g, 2R, 2Wb]
    r = _BDT(xb, adj)                                     # [g, 2R, Wb]
    R = x.shape[1]
    return r[:, :R] + r[:, R:]


def _mm_packed(wT_bcast, x, rows, *, hp: bool, Wb: int, cdt=jnp.bfloat16):
    """wᵀ @ x for feature-major blocks with hi/lo-packed columns in hp mode:
    wT_bcast is the pre-broadcast [g, 2R, C] (hp: stacked [wT_hi; wT_lo]) or
    [g, R, C] weight, x [g, C, Wb] f32; returns [g, rows, Wb] f32."""
    if hp:
        x_hi, x_lo = _split16(x)
        xp = jnp.concatenate([x_hi, x_lo], axis=2)        # [g, C, 2Wb]
        v4 = _BD(wT_bcast, xp)                            # [g, 2R, 2Wb]
        return ((v4[:, :rows, :Wb] + v4[:, :rows, Wb:])
                + (v4[:, rows:, :Wb] + v4[:, rows:, Wb:]))
    return _BD(wT_bcast, x.astype(cdt))


def _drop_coeffs(alpha_drop: bool, rate: float):
    """(a, b) such that dropout(x, m) = a·where(m, x, α') + b (alpha mode)
    or a·where(m, x, 0) (standard mode, b = 0) — ops/mlp.py::_dropout."""
    if alpha_drop:
        a = ((1.0 - rate) * (1.0 + rate * _ALPHA_P ** 2)) ** -0.5
        return a, -a * _ALPHA_P * rate
    return 1.0 / (1.0 - rate), 0.0


def _keep(m):
    """Keep-mask predicate, dtype-robust: masks arrive as int8 in blocked
    layout (4x less HBM/relayout traffic than f32 — the round-3 flagship
    profile showed ~0.4 ms/step of f32 mask movement) or as f32/bool from
    older call sites. Integer masks are widened to f32 BEFORE the compare:
    Mosaic cannot lower cmpi on packed (8,128,4) int8 vectors."""
    if jnp.issubdtype(m.dtype, jnp.integer):
        return m.astype(jnp.float32) > 0.5
    return m > 0.5


def _make_drop(alpha_drop: bool, rate: float):
    """(drop, dmask) closures for the training kernels' in-VMEM pos-0
    dropout (identity when rate <= 0) — the one place the semantics live."""
    if rate <= 0.0:
        return (lambda x, m: x), (lambda m: jnp.float32(1.0))
    a_c, b_c = _drop_coeffs(alpha_drop, rate)
    if alpha_drop:
        def drop(x, m):
            return a_c * jnp.where(_keep(m), x, _ALPHA_P) + b_c
    else:
        def drop(x, m):
            return jnp.where(_keep(m), a_c * x, 0.0)

    def dmask(m):
        return a_c * _keep(m).astype(jnp.float32)

    return drop, dmask


def _agg_packed(s, adj, *, hp: bool):
    """agg = s @ adjT for feature-major blocks against the (possibly hi/lo
    PACKED) adjacency — one MXU issue; in hp mode the 4 bf16 passes ride as
    stacked rows against the packed columns (exact quadrant sums)."""
    if not hp:
        return _BD(s.astype(adj.dtype), adj)
    Wb = adj.shape[1]
    D = s.shape[1]
    s_hi, s_lo = _split16(s.astype(jnp.float32))
    s2 = jnp.concatenate([s_hi, s_lo], axis=1)            # [g, 2D, Wb]
    r4 = _BD(s2, adj)                                     # [g, 2D, 2Wb]
    return ((r4[:, :D, :Wb] + r4[:, :D, Wb:])
            + (r4[:, D:, :Wb] + r4[:, D:, Wb:]))          # [g, D, Wb] f32


def _iter_core(adj, sT3, w2v, *, hp: bool, group: int, Wb: int):
    """Us + A for one iteration: U = [Ws;Wa]@s, A = U[H:]@adjT.

    Two batched MXU issues per block. In hp mode the 4 bf16 hi/lo passes
    of each product ride inside ONE issue as stacked rows/columns whose
    four H x Wb quadrants sum to the exact 4-pass result."""
    H2 = w2v.shape[0]
    H = H2 // 2
    if hp:
        # issue 1: [4H, D] @ [D, 2Wb]
        w_hi, w_lo = _split16(w2v)
        w4 = jnp.concatenate([w_hi, w_lo], axis=0)        # [4H, D]
        w4 = jnp.broadcast_to(w4[None], (group,) + w4.shape)
        s_hi, s_lo = _split16(sT3.astype(jnp.float32))
        s2 = jnp.concatenate([s_hi, s_lo], axis=2)        # [g, D, 2Wb]
        u4 = _BD(w4, s2)                                  # [g, 4H, 2Wb] f32
        u = ((u4[:, :H2, :Wb] + u4[:, :H2, Wb:])
             + (u4[:, H2:, :Wb] + u4[:, H2:, Wb:]))       # [g, 2H, Wb]
        # issue 2: [2H, Wb] @ [Wb, 2Wb] against pre-packed [a_hi | a_lo]
        ua_hi, ua_lo = _split16(u[:, H:])
        ua2 = jnp.concatenate([ua_hi, ua_lo], axis=1)     # [g, 2H, Wb]
        a4 = _BD(ua2, adj)                                # [g, 2H, 2Wb] f32
        a = ((a4[:, :H, :Wb] + a4[:, :H, Wb:])
             + (a4[:, H:, :Wb] + a4[:, H:, Wb:]))         # [g, H, Wb]
        return u[:, :H] + a
    cdt = adj.dtype
    w2b = jnp.broadcast_to(w2v.astype(cdt)[None], (group,) + w2v.shape)
    u = _BD(w2b, sT3.astype(cdt))                         # [g, 2H, Wb] f32
    return u[:, :H] + _BD(u[:, H:].astype(cdt), adj)


def _step_kernel_T(refs, *, activation: str, hp: bool, has_res: bool,
                   group: int, block_w: int):
    """One grouped fused iteration, two batched MXU issues per block."""
    if has_res:
        adj_ref, sT_ref, rT_ref, fT_ref, w2_ref, aff_ref, out_ref = refs
    else:
        adj_ref, sT_ref, fT_ref, w2_ref, aff_ref, out_ref = refs
        rT_ref = None
    h = (_iter_core(adj_ref[:], sT_ref[:], w2_ref[:].astype(jnp.float32),
                    hp=hp, group=group, Wb=block_w)
         + fT_ref[:].astype(jnp.float32))
    if has_res:
        h = h + rT_ref[:].astype(jnp.float32)
    out_ref[:] = (_ACTS[activation](h) * aff_ref[0:1].astype(jnp.float32)
                  + aff_ref[1:2].astype(jnp.float32)).astype(out_ref.dtype)


def _loop_kernel_T(refs, *, activation: str, hp: bool, K: int, thr: float,
                   group: int, block_w: int):
    """The WHOLE K-iteration propagation loop for a group of residual-free
    blocks: the adjacency is DMA'd into VMEM once and all K state updates
    run on it (reference loop GNN.py:202-242). Emits the state snapshot
    after every iteration plus the per-node pre-update convergence flags, so
    the caller can reproduce the reference's global early-stop semantics
    exactly (select snapshot k*, count realised iterations) without the
    kernel needing cross-block communication."""
    adj_ref, s_ref, fT_ref, w2_ref, aff_ref, nm_ref, traj_ref, marg_ref = refs
    adj = adj_ref[:]
    w2v = w2_ref[:].astype(jnp.float32)
    fT = fT_ref[:].astype(jnp.float32)
    aff0 = aff_ref[0:1].astype(jnp.float32)
    aff1 = aff_ref[1:2].astype(jnp.float32)
    nm = nm_ref[:]                                        # [g, Wb] f32 1/0
    thrf = jnp.float32(thr)
    s = s_ref[:]
    s_old = jnp.ones_like(s)
    for k in range(K):
        diff = (s - s_old).astype(jnp.float32)
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))     # [g, Wb]
        norm = jnp.sqrt(jnp.sum(jnp.square(s_old.astype(jnp.float32)),
                                axis=1))
        marg_ref[k] = jnp.where(dist > thrf * norm, 1.0, 0.0) * nm
        h = _iter_core(adj, s, w2v, hp=hp, group=group, Wb=block_w) + fT
        y = _ACTS[activation](h) * aff0 + aff1
        s_old = s
        s = y.astype(s.dtype)
        traj_ref[k] = s


def _fused_fwd_impl(adj_pack, stateT3, resT3H, featsT3H, w2, aff, *,
                    activation: str, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = stateT3.shape[1]
    H = w2.shape[0] // 2
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_res = resT3H is not None
    kernel = functools.partial(_step_kernel_T, activation=activation, hp=hp,
                               has_res=has_res, group=group, block_w=Wb)
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H, Wb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, H, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, stateT3, featsT3H, w2, aff.reshape(2, H, 1)]
    if has_res:
        in_specs.insert(2, pl.BlockSpec((group, H, Wb), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(2, resT3H)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    return pl.pallas_call(
        wrapped,
        grid=(B // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, H, Wb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Wb), stateT3.dtype),
        interpret=interpret,
    )(*operands)


def to_blocks_fm(x, block_w: int):
    """[Np, K] node-major -> [B, K, Wb] feature-major blocks (the kernels'
    layout: a block's 128 nodes fill the lanes, features sit on sublanes)."""
    B = x.shape[0] // block_w
    return x.T.reshape(-1, B, block_w).transpose(1, 0, 2)


def from_blocks_fm(x3):
    """[B, K, Wb] feature-major blocks -> [Np, K] node-major."""
    return x3.transpose(1, 0, 2).reshape(x3.shape[1], -1).T


def pack_adjacency(adjT_blocks):
    """Pack the transposed block adjacency for the kernel: f32 →
    [B, Wb, 2Wb] bf16 [hi | lo] columns (high-precision mode, same total
    bytes as the f32 original); bf16 → [B, Wb, Wb] unchanged."""
    if adjT_blocks.dtype == jnp.float32:
        hi, lo = _split16(adjT_blocks)
        return jnp.concatenate([hi, lo], axis=2)
    return adjT_blocks


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_propagation_step(adj_pack, stateT3, resT3H, featsT3H, w2,
                           affine=None, activation: str = "tanh",
                           group: int = 9,
                           interpret: Optional[bool] = None):
    """One fused propagation iteration, feature-major blocked layout.

    :param adj_pack: pack_adjacency output — [B, Wb, 2Wb] bf16 hi/lo
        (f32-faithful mode) or [B, Wb, Wb] bf16. adjT[b, src, dst] = w.
    :param stateT3: [B, D, Wb] node states (block, feature, node-in-block).
    :param resT3H: [B, H, Wb] cross-block residual term ALREADY passed
        through Wa (= Wa @ res_agg), or None when no block-crossing edges.
    :param featsT3H: [B, H, Wb] hoisted loop-invariant term Wf@feats + b.
    :param w2: [2H, D] stacked dense rows [Ws; Wa] (w1T column split).
    :param affine: optional [2, H] (scale; shift) applied after the
        activation — the inference-mode BatchNorm affine. None = identity.
    Returns new stateT3 [B, H, Wb].
    """
    H = w2.shape[0] // 2
    aff = (jnp.stack([jnp.ones((H,), w2.dtype), jnp.zeros((H,), w2.dtype)])
           if affine is None else affine)
    return _fused_fwd_impl(adj_pack, stateT3, resT3H, featsT3H, w2, aff,
                           activation=activation, group=group,
                           interpret=interpret)


def _fused_fwd_rule(adj_pack, stateT3, resT3H, featsT3H, w2, affine,
                    activation, group, interpret):
    H = w2.shape[0] // 2
    aff = (jnp.stack([jnp.ones((H,), w2.dtype), jnp.zeros((H,), w2.dtype)])
           if affine is None else affine)
    out = _fused_fwd_impl(adj_pack, stateT3, resT3H, featsT3H, w2, aff,
                          activation=activation, group=group,
                          interpret=interpret)
    return out, (adj_pack, stateT3, resT3H, featsT3H, w2, affine)


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
                         1.0507009873554805 * 1.6732632423543772
                         * jnp.exp(jnp.where(h > 0, 0.0, h)))
    raise ValueError(activation)  # pragma: no cover


def _fused_bwd_rule(activation, group, interpret, res, g):
    """XLA backward: recompute the pre-activation with the same
    reassociated algebra, then dense + adjacency backprop (adj is data,
    not a parameter — no cotangent)."""
    adj_pack, sT3, rT3H, fT3H, w2, affine = res
    f32 = jnp.float32
    Wb = adj_pack.shape[1]
    hp = adj_pack.shape[2] == 2 * Wb
    adjT = (adj_pack[..., :Wb].astype(f32) + adj_pack[..., Wb:].astype(f32)
            if hp else adj_pack.astype(f32))
    had_affine = affine is not None
    has_res = rT3H is not None
    H = w2.shape[0] // 2
    ein = functools.partial(jnp.einsum, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)

    s3 = sT3.astype(f32)
    u = ein("kd,bdw->bkw", w2.astype(f32), s3)            # [B, 2H, Wb]
    a = ein("bhs,bsd->bhd", u[:, H:], adjT)               # [B, H, Wb]
    h = u[:, :H] + a + fT3H.astype(f32)
    if has_res:
        h = h + rT3H.astype(f32)

    gy = g.astype(f32)
    if had_affine:
        gy = gy * affine[0].astype(f32)[None, :, None]
    dhT = gy * _act_grad(activation, h)                   # [B, H, Wb]

    dua = ein("bhd,bsd->bhs", dhT, adjT)                  # contract dst
    du = jnp.concatenate([dhT, dua], axis=1)              # [B, 2H, Wb]
    dw2 = ein("bkw,bdw->kd", du, s3).astype(w2.dtype)
    dsT3 = ein("kd,bkw->bdw", w2.astype(f32), du).astype(sT3.dtype)
    dfT3H = dhT.astype(fT3H.dtype)
    drT3H = dhT.astype(rT3H.dtype) if has_res else None
    if had_affine:
        y = _ACTS[activation](h)
        daff = jnp.stack([jnp.sum(g.astype(f32) * y, axis=(0, 2)),
                          jnp.sum(g.astype(f32), axis=(0, 2))]
                         ).astype(affine.dtype)
    else:
        daff = None
    return (None, dsT3, drT3H, dfT3H, dw2, daff)


fused_propagation_step.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def _ident_affine(H, dtype):
    return jnp.stack([jnp.ones((H,), dtype), jnp.zeros((H,), dtype)])


def _fused_loop_impl(adj_pack, s0, fT3H, w2, aff, nmf, *, K: int,
                     threshold: float, activation: str, group: int,
                     interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    H = w2.shape[0] // 2
    if H != D:
        raise ValueError(f"loop kernel needs state width H == D ({H} != {D})")
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop_kernel_T, activation=activation, hp=hp,
                               K=K, thr=threshold, group=group, block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    return pl.pallas_call(
        wrapped,
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, H, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, Wb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, group, H, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, Wb), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, B, H, Wb), s0.dtype),
            jax.ShapeDtypeStruct((K, B, Wb), jnp.float32),
        ],
        interpret=interpret,
    )(adj_pack, s0, fT3H, w2, aff.reshape(2, H, 1), nmf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_propagation_loop(adj_pack, s0, fT3H, w2, affine, nmf, K: int,
                           threshold: float, activation: str = "tanh",
                           group: int = 9,
                           interpret: Optional[bool] = None):
    """The full K-iteration propagation loop over residual-free blocks,
    adjacency streamed from HBM once (not once per iteration).

    :param adj_pack: pack_adjacency output for the loop blocks.
    :param s0: [B, D, Wb] initial states (feature-major blocks).
    :param fT3H: [B, H, Wb] hoisted loop-invariant term Wf@feats + b.
    :param w2: [2H, D] stacked dense rows [Ws; Wa]; needs H == D.
    :param affine: optional [2, H] post-activation (scale; shift).
    :param nmf: [B, Wb] float node mask (1 real / 0 pad) for the
        convergence flags.
    Returns (traj [K, B, H, Wb], margins [K, B, Wb]) where margins[k] is
    1.0 where node moved (pre-update check of iteration k), else 0.
    """
    H = w2.shape[0] // 2
    aff = _ident_affine(H, w2.dtype) if affine is None else affine
    return _fused_loop_impl(adj_pack, s0, fT3H, w2, aff, nmf, K=K,
                            threshold=threshold, activation=activation,
                            group=group, interpret=interpret)


def _fused_loop_fwd(adj_pack, s0, fT3H, w2, affine, nmf, K, threshold,
                    activation, group, interpret):
    H = w2.shape[0] // 2
    aff = _ident_affine(H, w2.dtype) if affine is None else affine
    traj, margins = _fused_loop_impl(adj_pack, s0, fT3H, w2, aff, nmf, K=K,
                                     threshold=threshold,
                                     activation=activation, group=group,
                                     interpret=interpret)
    return (traj, margins), (adj_pack, s0, fT3H, w2, affine, traj)


def _loop_bwd_kernel(refs, *, activation: str, hp: bool, K: int, group: int,
                     block_w: int, has_affine: bool):
    """ALL K reverse iterations of the eval-loop backward for a group of
    blocks in one kernel (reassociated algebra of _fused_bwd_rule): the
    adjacency is DMA'd to VMEM once; each reverse step recomputes the
    pre-activation (u = w2@s, a = u[H:]@adjT — FLOPs are free next to the HBM
    stream) then runs dh, the dua/gs chains and the dw2/daff accumulations in
    VMEM. Per-group dw2/daff partials are summed by the caller."""
    Wb = block_w
    if has_affine:
        (adj_ref, s0_ref, traj_ref, fT_ref, w_ref, aff_ref, gt_ref,
         gs_ref, dw_ref, dfT_ref, daff_ref) = refs
        aff0 = aff_ref[0:1].astype(jnp.float32)           # [1, H, 1]
    else:
        (adj_ref, s0_ref, traj_ref, fT_ref, w_ref, gt_ref,
         gs_ref, dw_ref, dfT_ref) = refs
    adj = adj_ref[:]
    w2v = w_ref[:].astype(jnp.float32)                    # [2H, D]
    H2 = w2v.shape[0]
    H = H2 // 2
    D = s0_ref.shape[1]
    fT = fT_ref[:].astype(jnp.float32)

    if hp:
        wT_hi, wT_lo = _split16(w2v.T)                    # [D, 2H]
        wT4 = jnp.broadcast_to(jnp.concatenate([wT_hi, wT_lo], axis=0)[None],
                               (group, 2 * D, H2))
    else:
        wT_b = jnp.broadcast_to(w2v.T.astype(adj.dtype)[None],
                                (group, D, H2))

    gs = jnp.zeros((group, D, Wb), jnp.float32)
    dw2 = jnp.zeros((H2, D), jnp.float32)
    dfT = jnp.zeros((group, H, Wb), jnp.float32)
    if has_affine:
        daff_s = jnp.zeros((1, H, 1), jnp.float32)
        daff_b = jnp.zeros((1, H, 1), jnp.float32)

    for k in reversed(range(K)):
        s_in = (traj_ref[k - 1] if k else s0_ref[:])
        # recompute the pre-activation with the forward's exact packed
        # algebra (_iter_core returns u[:H] + u[H:]@adjT)
        h = _iter_core(adj, s_in, w2v, hp=hp, group=group, Wb=Wb) + fT
        gy_raw = gt_ref[k].astype(jnp.float32) + gs
        if has_affine:
            daff_s = daff_s + jnp.sum(gy_raw * _ACTS[activation](h),
                                      axis=(0, 2))[None, :, None]
            daff_b = daff_b + jnp.sum(gy_raw, axis=(0, 2))[None, :, None]
            gy = gy_raw * aff0
        else:
            gy = gy_raw
        dh = gy * _act_grad(activation, h)                # [g, H, Wb]
        dfT = dfT + dh
        dua = _contract_dst(dh, adj, hp=hp)               # [g, H, Wb]
        du = jnp.concatenate([dh, dua], axis=1)           # [g, 2H, Wb]
        dw2 = dw2 + jnp.sum(_BDT_HI(du, s_in.astype(jnp.float32)),
                            axis=0)                       # [2H, D]
        # gs = w2ᵀ @ du (hi/lo packed columns)
        gs = _mm_packed(wT4 if hp else wT_b, du, D, hp=hp, Wb=Wb,
                        cdt=adj.dtype)
    gs_ref[:] = gs.astype(gs_ref.dtype)
    dw_ref[0] = dw2.astype(dw_ref.dtype)
    dfT_ref[:] = dfT.astype(dfT_ref.dtype)
    if has_affine:
        daff_ref[0] = jnp.concatenate([daff_s, daff_b], axis=0).astype(
            daff_ref.dtype)


def _loop_bwd_impl(adj_pack, s0, traj, fT3H, w2, aff, g_traj, *, K: int,
                   activation: str, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    H = w2.shape[0] // 2
    has_affine = aff is not None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop_bwd_kernel, activation=activation,
                               hp=hp, K=K, group=group, block_w=Wb,
                               has_affine=has_affine)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    G = B // group
    b3 = lambda i: (i, 0, 0)        # noqa: E731
    b4 = lambda i: (0, i, 0, 0)     # noqa: E731
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((K, group, H, Wb), b4, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, group, H, Wb), b4, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * H, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H, Wb), b3, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D, Wb), s0.dtype),
        jax.ShapeDtypeStruct((G, 2 * H, D), jnp.float32),
        jax.ShapeDtypeStruct((B, H, Wb), fT3H.dtype),
    ]
    operands = [adj_pack, s0, traj, fT3H, w2, g_traj]
    if has_affine:
        in_specs.insert(5, pl.BlockSpec((2, H, 1), lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(5, aff.reshape(2, H, 1))
        out_specs.append(pl.BlockSpec((1, 2, H, 1), lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((G, 2, H, 1), jnp.float32))
    res = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    gs, dw_part, dfT = res[0], res[1], res[2]
    daff = jnp.sum(res[3], axis=0) if has_affine else None
    return gs, jnp.sum(dw_part, axis=0), dfT, daff


def _fused_loop_bwd(K, threshold, activation, group, interpret, res, g):
    """Fused backward: all K reverse iterations in one kernel per block group
    (adjacency streamed once; pre-activations recomputed in VMEM from the
    stored snapshots with the forward's exact packed algebra)."""
    g_traj, _ = g                                         # margins: non-diff
    adj_pack, s0, fT3H, w2, affine, traj = res
    gs, dw2, dfT, daff_p = _loop_bwd_impl(
        adj_pack, s0, traj, fT3H, w2, affine, g_traj.astype(fT3H.dtype),
        K=K, activation=activation, group=group, interpret=interpret)
    # per-block fT sum: the forward broadcast one loop-invariant fT, so its
    # cotangent is the k-sum (already accumulated in-kernel per block)
    daff = (daff_p[:, :, 0].astype(affine.dtype)
            if affine is not None else None)
    return (None, gs.astype(s0.dtype), dfT.astype(fT3H.dtype),
            dw2.astype(w2.dtype), daff, None)


fused_propagation_loop.defvjp(_fused_loop_fwd, _fused_loop_bwd)


# --------------------------------------------------------------- training step
def _train_kernel_T(refs, *, activation: str, hp: bool, has_res: bool,
                    alpha_drop: bool, rate: float, group: int, block_w: int):
    """One TRAINING propagation iteration for a group of blocks: adjacency
    bmm + residual + dropout-on-the-aggregation + dense + activation, two MXU
    issues per block. Dropout masks are generated OUTSIDE (bit-identical to
    the XLA body's jax.random stream); the state/feature halves of the input
    arrive pre-dropped (sdT3 / the fT3H term), only the aggregated half —
    which is computed in-kernel — gets its mask applied here. BatchNorm (the
    trailing layer, MLP.py:63) runs outside in XLA: its training-mode moments
    are a global cross-block reduction."""
    Wb = block_w
    if has_res:
        adj_ref, s_ref, sd_ref, m_ref, r_ref, f_ref, w_ref, y_ref, agg_ref = refs
    else:
        adj_ref, s_ref, sd_ref, m_ref, f_ref, w_ref, y_ref, agg_ref = refs
        r_ref = None
    adj = adj_ref[:]
    s = s_ref[:]
    D = s.shape[1]
    # issue 1: agg = s @ adjT (bf16 hi/lo rows when the adjacency is packed)
    agg = _agg_packed(s, adj, hp=hp)
    if has_res:
        agg = agg + r_ref[:].astype(jnp.float32)
    agg_ref[:] = agg.astype(agg_ref.dtype)
    drop, _ = _make_drop(alpha_drop, rate)
    d_agg = drop(agg, m_ref[:]) if rate > 0.0 else agg
    x2 = jnp.concatenate([sd_ref[:].astype(jnp.float32), d_agg], axis=1)
    w = w_ref[:].astype(jnp.float32)                       # [H, 2D]
    H = w.shape[0]
    # issue 2: h = [Ws | Wa] @ [s_dropped ; agg_dropped] (+ hoisted feats term)
    if hp:
        w_hi, w_lo = _split16(w)
        w4 = jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                              (group, 2 * H, 2 * D))
        x_hi, x_lo = _split16(x2)
        xp = jnp.concatenate([x_hi, x_lo], axis=2)         # [g, 2D, 2Wb]
        u4 = _BD(w4, xp)                                   # [g, 2H, 2Wb]
        h = ((u4[:, :H, :Wb] + u4[:, :H, Wb:])
             + (u4[:, H:, :Wb] + u4[:, H:, Wb:]))
    else:
        wb_ = jnp.broadcast_to(w.astype(adj.dtype)[None], (group, H, 2 * D))
        h = _BD(wb_, x2.astype(adj.dtype))
    h = h + f_ref[:].astype(jnp.float32)
    y_ref[:] = _ACTS[activation](h).astype(y_ref.dtype)


def _train_fwd_impl(adj_pack, sT3, sdT3, mT3, rT3, fT3H, w_cat, *,
                    activation: str, alpha_drop: bool, rate: float,
                    group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = sT3.shape[1]
    H = w_cat.shape[0]
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_res = rT3 is not None
    kernel = functools.partial(_train_kernel_T, activation=activation, hp=hp,
                               has_res=has_res, alpha_drop=alpha_drop,
                               rate=rate, group=group, block_w=Wb)
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H, Wb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 2 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, sT3, sdT3, mT3, fT3H, w_cat]
    if has_res:
        in_specs.insert(4, pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(4, rT3)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    return pl.pallas_call(
        wrapped,
        grid=(B // group,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((group, H, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Wb), sT3.dtype),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_train_step(adj_pack, sT3, sdT3, mT3, rT3, fT3H, w_cat,
                     activation: str = "tanh", alpha_drop: bool = True,
                     rate: float = 0.0, group: int = 9,
                     interpret: Optional[bool] = None):
    """One fused TRAINING propagation iteration (dropout-aware, pre-BN).

    :param adj_pack: pack_adjacency output (transposed blocks).
    :param sT3: [B, D, Wb] raw node states (feed the aggregation).
    :param sdT3: [B, D, Wb] states with the input-dropout already applied
        (the state slice of the XLA body's mask).
    :param mT3: [B, D, Wb] f32 keep-mask for the AGGREGATED input slice
        (1 keep / 0 drop) — applied in-kernel, after the bmm + residual.
    :param rT3: [B, D, Wb] RAW cross-block residual aggregation (NOT through
        the dense — dropout must see the complete aggregation), or None.
    :param fT3H: [B, H, Wb] this iteration's feature term
        Wf @ dropout(agg_arc_labels) + b (fresh mask per iteration, so it is
        computed per step outside — it is no longer loop-invariant).
    :param w_cat: [H, 2D] dense columns [Ws | Wa] for the state/agg slices.
    :param rate / alpha_drop: the spec's input-dropout config (static).
    Returns (y [B, H, Wb] = act(h), agg [B, D, Wb] pre-dropout aggregation —
    saved for the backward, treat as an auxiliary output).
    """
    return _train_fwd_impl(adj_pack, sT3, sdT3, mT3, rT3, fT3H, w_cat,
                           activation=activation, alpha_drop=alpha_drop,
                           rate=rate, group=group, interpret=interpret)


def _train_fwd_rule(adj_pack, sT3, sdT3, mT3, rT3, fT3H, w_cat, activation,
                    alpha_drop, rate, group, interpret):
    y, agg = _train_fwd_impl(adj_pack, sT3, sdT3, mT3, rT3, fT3H, w_cat,
                             activation=activation, alpha_drop=alpha_drop,
                             rate=rate, group=group, interpret=interpret)
    res_tag = None if rT3 is None else jnp.zeros((), rT3.dtype)
    return (y, agg), (adj_pack, sdT3, mT3, fT3H, w_cat, agg, res_tag)


def _train_bwd_rule(activation, alpha_drop, rate, group, interpret, res, g):
    """XLA backward: the pre-dropout aggregation was saved by the forward, so
    h is recomputed without touching the adjacency; the only adjacency-sized
    product is the dagg -> ds chain rule."""
    gy, g_agg = g
    adj_pack, sdT3, mT3, fT3H, w_cat, agg, res_tag = res
    f32 = jnp.float32
    Wb = adj_pack.shape[1]
    hp = adj_pack.shape[2] == 2 * Wb
    adjT = (adj_pack[..., :Wb].astype(f32) + adj_pack[..., Wb:].astype(f32)
            if hp else adj_pack.astype(f32))
    D = sdT3.shape[1]
    H = w_cat.shape[0]
    ein = functools.partial(jnp.einsum, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)

    if rate > 0.0:
        if alpha_drop:
            a = ((1.0 - rate) * (1.0 + rate * _ALPHA_P ** 2)) ** -0.5
            b = -a * _ALPHA_P * rate
            d_agg = a * jnp.where(_keep(mT3), agg, _ALPHA_P) + b
            dmask = a * _keep(mT3).astype(f32)
        else:
            inv = 1.0 / (1.0 - rate)
            d_agg = jnp.where(_keep(mT3), agg * inv, 0.0)
            dmask = inv * _keep(mT3).astype(f32)
    else:
        d_agg = agg
        dmask = None
    x2 = jnp.concatenate([sdT3.astype(f32), d_agg], axis=1)   # [B, 2D, Wb]
    h = ein("kd,bdw->bkw", w_cat.astype(f32), x2) + fT3H.astype(f32)

    dh = gy.astype(f32) * _act_grad(activation, h)            # [B, H, Wb]
    dfT3H = dh.astype(fT3H.dtype)
    dw_cat = ein("bhw,bdw->hd", dh, x2).astype(w_cat.dtype)
    dx2 = ein("kd,bkw->bdw", w_cat.astype(f32), dh)           # [B, 2D, Wb]
    dsdT3 = dx2[:, :D].astype(sdT3.dtype)
    dagg = dx2[:, D:] if dmask is None else dx2[:, D:] * dmask
    if g_agg is not None and not isinstance(
            g_agg, jax.custom_derivatives.SymbolicZero):
        dagg = dagg + g_agg.astype(f32)
    # residual enters the aggregation raw, so its cotangent IS dagg
    drT3 = None if res_tag is None else dagg.astype(res_tag.dtype)
    # chain through the aggregation: ds[b, d, src] = sum_dst dagg*adjT[src,dst]
    dsT3 = ein("bhd,bsd->bhs", dagg, adjT).astype(sdT3.dtype)
    return (None, dsT3, dsdT3, None, drT3, dfT3H, dw_cat)


fused_train_step.defvjp(_train_fwd_rule, _train_bwd_rule)


# ------------------------------------------------------- looped training loop
def _loop_train_kernel_T(refs, *, activation: str, hp: bool, K: int,
                         thr: float, group: int, block_w: int,
                         alpha_drop: bool, rate: float):
    """The WHOLE K-iteration TRAINING propagation loop for a group of
    residual-free blocks: adjacency DMA'd to VMEM once, per-iteration dropout
    masks streamed in and applied in-VMEM (state and aggregated slices; the
    feature slice rides pre-dropped inside fT[k]). Emits per-iteration state
    snapshots, convergence margins AND the pre-dropout aggregations (the
    backward reuses them so it never recomputes the adjacency bmm)."""
    Wb = block_w
    (adj_ref, s_ref, ms_ref, ma_ref, fT_ref, w_ref, nm_ref,
     traj_ref, marg_ref, agg_ref) = refs
    adj = adj_ref[:]
    w = w_ref[:].astype(jnp.float32)                      # [H, 2D]
    H = w.shape[0]
    nm = nm_ref[:]
    thrf = jnp.float32(thr)
    s = s_ref[:]
    D = s.shape[1]
    s_old = jnp.ones_like(s)
    drop, _ = _make_drop(alpha_drop, rate)
    if hp:
        w_hi, w_lo = _split16(w)
        w4 = jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                              (group, 2 * H, 2 * D))
    else:
        w_b = jnp.broadcast_to(w.astype(adj.dtype)[None], (group, H, 2 * D))

    for k in range(K):
        diff = (s - s_old).astype(jnp.float32)
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))     # [g, Wb]
        norm = jnp.sqrt(jnp.sum(jnp.square(s_old.astype(jnp.float32)),
                                axis=1))
        marg_ref[k] = jnp.where(dist > thrf * norm, 1.0, 0.0) * nm
        # issue 1: agg = s @ adjT (hi/lo packed when the adjacency is f32)
        agg = _agg_packed(s, adj, hp=hp)
        agg_ref[k] = agg.astype(agg_ref.dtype)
        d_agg = drop(agg, ma_ref[k])
        sd = drop(s.astype(jnp.float32), ms_ref[k])
        x2 = jnp.concatenate([sd, d_agg], axis=1)         # [g, 2D, Wb] f32
        # issue 2: h = [Ws | Wa] @ [s_drop ; agg_drop] + fT[k]
        if hp:
            x_hi, x_lo = _split16(x2)
            xp = jnp.concatenate([x_hi, x_lo], axis=2)    # [g, 2D, 2Wb]
            u4 = _BD(w4, xp)                              # [g, 2H, 2Wb]
            h = ((u4[:, :H, :Wb] + u4[:, :H, Wb:])
                 + (u4[:, H:, :Wb] + u4[:, H:, Wb:]))
        else:
            h = _BD(w_b, x2.astype(adj.dtype))
        h = h + fT_ref[k].astype(jnp.float32)
        s_old = s
        s = _ACTS[activation](h).astype(s.dtype)
        traj_ref[k] = s


def _loop_train_impl(adj_pack, s0, ms, ma, fT, w_cat, nmf, *, K: int,
                     threshold: float, activation: str, alpha_drop: bool,
                     rate: float, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    H = w_cat.shape[0]
    if H != D:
        raise ValueError(f"loop kernel needs state width H == D ({H} != {D})")
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop_train_kernel_T, activation=activation,
                               hp=hp, K=K, thr=threshold, group=group,
                               block_w=Wb, alpha_drop=alpha_drop, rate=rate)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    return pl.pallas_call(
        wrapped,
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, H, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, Wb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, group, H, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, Wb), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, B, H, Wb), s0.dtype),
            jax.ShapeDtypeStruct((K, B, Wb), jnp.float32),
            jax.ShapeDtypeStruct((K, B, D, Wb), jnp.float32),
        ],
        interpret=interpret,
    )(adj_pack, s0, ms, ma, fT, w_cat, nmf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def fused_train_loop(adj_pack, s0, ms, ma, fT, w_cat, nmf, K: int,
                     threshold: float, activation: str = "tanh",
                     alpha_drop: bool = True, rate: float = 0.0,
                     group: int = 12, interpret: Optional[bool] = None):
    """The full K-iteration TRAINING propagation loop over residual-free
    blocks (dropout at the MLP input, NO BatchNorm — BN's training moments
    are a global cross-block reduction and force per-step iteration).

    :param adj_pack: pack_adjacency output for the loop blocks.
    :param s0: [B, D, Wb] initial states (feature-major blocks).
    :param ms: [K, B, D, Wb] f32 keep-masks for the STATE input slice.
    :param ma: [K, B, D, Wb] f32 keep-masks for the AGGREGATED slice
        (applied in-VMEM after the adjacency bmm).
    :param fT: [K, B, H, Wb] per-iteration feature term
        Wf @ dropout_k(agg_arc_labels) + b (fresh mask per iteration).
    :param w_cat: [H, 2D] dense columns [Ws | Wa].
    :param nmf: [B, Wb] float node mask for the convergence flags.
    Returns (traj [K, B, H, Wb], margins [K, B, Wb])."""
    traj, margins, _ = _loop_train_impl(
        adj_pack, s0, ms, ma, fT, w_cat, nmf, K=K, threshold=threshold,
        activation=activation, alpha_drop=alpha_drop, rate=rate, group=group,
        interpret=interpret)
    return traj, margins


def _loop_train_fwd(adj_pack, s0, ms, ma, fT, w_cat, nmf, K, threshold,
                    activation, alpha_drop, rate, group, interpret):
    traj, margins, agg = _loop_train_impl(
        adj_pack, s0, ms, ma, fT, w_cat, nmf, K=K, threshold=threshold,
        activation=activation, alpha_drop=alpha_drop, rate=rate, group=group,
        interpret=interpret)
    return (traj, margins), (adj_pack, s0, ms, ma, fT, w_cat, traj, agg)


def _loop_train_bwd_kernel(refs, *, activation: str, hp: bool, K: int,
                           group: int, block_w: int, alpha_drop: bool,
                           rate: float):
    """ALL K reverse iterations of the training-loop backward for a group of
    blocks in one kernel: the adjacency is DMA'd to VMEM once and every
    reverse step's recompute (dropout + dense pre-activation), dh, dw
    accumulation and the dagg -> ds adjacency chain run in VMEM. Mirrors
    _loop_train_kernel_T's structure; the per-group dw partials are summed by
    the caller (tiny [G, H, 2D])."""
    Wb = block_w
    (adj_ref, s0_ref, traj_ref, agg_ref, ms_ref, ma_ref, fT_ref, w_ref,
     gt_ref, gs_ref, dw_ref, dfT_ref) = refs
    adj = adj_ref[:]
    w = w_ref[:].astype(jnp.float32)                      # [H, 2D]
    H = w.shape[0]
    D = s0_ref.shape[1]
    drop, dmask = _make_drop(alpha_drop, rate)
    if hp:
        w_hi, w_lo = _split16(w)
        w4 = jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                              (group, 2 * H, 2 * D))
        wT_hi, wT_lo = _split16(w.T)                      # [2D, H]
        wT4 = jnp.broadcast_to(jnp.concatenate([wT_hi, wT_lo], axis=0)[None],
                               (group, 4 * D, H))
    else:
        w_b = jnp.broadcast_to(w.astype(adj.dtype)[None], (group, H, 2 * D))
        wT_b = jnp.broadcast_to(w.T.astype(adj.dtype)[None],
                                (group, 2 * D, H))

    gs = jnp.zeros((group, D, Wb), jnp.float32)
    dw = jnp.zeros((H, 2 * D), jnp.float32)
    for k in reversed(range(K)):
        s_in = (traj_ref[k - 1] if k else s0_ref[:]).astype(jnp.float32)
        x2 = jnp.concatenate([drop(s_in, ms_ref[k]),
                              drop(agg_ref[k].astype(jnp.float32),
                                   ma_ref[k])], axis=1)   # [g, 2D, Wb] f32
        # recompute pre-activation h (one MXU issue, hi/lo packed like fwd)
        if hp:
            x_hi, x_lo = _split16(x2)
            xp = jnp.concatenate([x_hi, x_lo], axis=2)    # [g, 2D, 2Wb]
            u4 = _BD(w4, xp)                              # [g, 2H, 2Wb]
            h = ((u4[:, :H, :Wb] + u4[:, :H, Wb:])
                 + (u4[:, H:, :Wb] + u4[:, H:, Wb:]))
        else:
            h = _BD(w_b, x2.astype(adj.dtype))
        h = h + fT_ref[k].astype(jnp.float32)
        gy = gt_ref[k].astype(jnp.float32) + gs
        dh = gy * _act_grad(activation, h)                # [g, H, Wb]
        dfT_ref[k] = dh.astype(dfT_ref.dtype)
        # dw += dh · x2ᵀ (contract the lane axis; tiny result, accumulated
        # in registers/VMEM across k and written once per group)
        dw = dw + jnp.sum(_BDT_HI(dh, x2), axis=0)        # [H, 2D]
        # dx2 = wᵀ · dh (hi/lo packed)
        dx2 = _mm_packed(wT4 if hp else wT_b, dh, 2 * D, hp=hp, Wb=Wb,
                         cdt=adj.dtype)                    # [g, 2D, Wb]
        dagg = dx2[:, D:] * dmask(ma_ref[k])
        # ds = dagg @ adjTᵀ over the packed dst axis (_contract_dst)
        ds = _contract_dst(dagg, adj, hp=hp)
        gs = dx2[:, :D] * dmask(ms_ref[k]) + ds
    gs_ref[:] = gs.astype(gs_ref.dtype)
    dw_ref[0] = dw.astype(dw_ref.dtype)


def _loop_train_bwd_impl(adj_pack, s0, traj, agg, ms, ma, fT, w_cat, g_traj,
                         *, K: int, activation: str, alpha_drop: bool,
                         rate: float, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    H = w_cat.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop_train_bwd_kernel, activation=activation,
                               hp=hp, K=K, group=group, block_w=Wb,
                               alpha_drop=alpha_drop, rate=rate)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    G = B // group
    b3 = lambda i: (i, 0, 0)        # noqa: E731
    b4 = lambda i: (0, i, 0, 0)     # noqa: E731
    gs, dw_part, dfT = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, H, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, H, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, H, Wb), b4, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 2 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, H, Wb), b4, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), s0.dtype),
            jax.ShapeDtypeStruct((G, H, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((K, B, H, Wb), fT.dtype),
        ],
        interpret=interpret,
    )(adj_pack, s0, traj, agg, ms, ma, fT, w_cat, g_traj)
    return gs, jnp.sum(dw_part, axis=0), dfT


def _loop_train_bwd(K, threshold, activation, alpha_drop, rate, group,
                    interpret, res, g):
    """Fused backward: all K reverse iterations in one kernel per block group
    (adjacency streamed once, recompute + dh + dw + dagg->ds chain in VMEM).
    The forward saved every iteration's pre-dropout aggregation, so no
    forward adjacency bmm is re-run."""
    g_traj, _ = g                                         # margins: non-diff
    adj_pack, s0, ms, ma, fT, w_cat, traj, agg = res
    gs, dw, dfT = _loop_train_bwd_impl(
        adj_pack, s0, traj, agg.astype(jnp.float32), ms, ma, fT, w_cat,
        g_traj.astype(fT.dtype), K=K, activation=activation,
        alpha_drop=alpha_drop, rate=rate, group=group, interpret=interpret)
    return (None, gs.astype(s0.dtype), None, None, dfT.astype(fT.dtype),
            dw.astype(w_cat.dtype), None)


fused_train_loop.defvjp(_loop_train_fwd, _loop_train_bwd)


# ------------------------------------------------- two-layer state networks
# Hidden-layer state nets (e.g. the hidden-150 accuracy configs) run
# dense0 -> act0 -> dense1 -> act1 per iteration. Layer 0 keeps the
# reassociation through the aggregation (_iter_core); layer 1 is one more
# packed MXU issue per block with the state resident in VMEM.
def _dense1_fm(w1, b1, y0, *, hp: bool, group: int, Wb: int,
               cdt=jnp.bfloat16):
    """h1 = w1 @ y0 + b1 for feature-major blocks (w1 [D, H1], y0 [g, H1, Wb],
    b1 [D, 1]), bf16 hi/lo packed in hp mode (exact 4-pass quadrant sums);
    in non-hp mode compute at the adjacency's dtype like the layer-0 path."""
    D = w1.shape[0]
    if hp:
        w_hi, w_lo = _split16(w1)
        w4 = jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                              (group, 2 * D) + (w1.shape[1],))
        y_hi, y_lo = _split16(y0.astype(jnp.float32))
        yp = jnp.concatenate([y_hi, y_lo], axis=2)         # [g, H1, 2Wb]
        u4 = _BD(w4, yp)                                   # [g, 2D, 2Wb]
        h1 = ((u4[:, :D, :Wb] + u4[:, :D, Wb:])
              + (u4[:, D:, :Wb] + u4[:, D:, Wb:]))
    else:
        wb_ = jnp.broadcast_to(w1.astype(cdt)[None], (group,) + w1.shape)
        h1 = _BD(wb_, y0.astype(cdt))
    return h1 + b1[None].astype(jnp.float32)


def _step2_kernel_T(refs, *, act0: str, act1: str, hp: bool, has_res: bool,
                    group: int, block_w: int):
    """One fused 2-layer iteration: aggregation-reassociated dense0 + act0 +
    dense1 + act1 (+ inference-BN affine) in one kernel."""
    if has_res:
        (adj_ref, sT_ref, rT_ref, fT_ref, w20_ref, w1_ref, b1_ref, aff_ref,
         out_ref) = refs
    else:
        (adj_ref, sT_ref, fT_ref, w20_ref, w1_ref, b1_ref, aff_ref,
         out_ref) = refs
        rT_ref = None
    adj = adj_ref[:]
    h0 = (_iter_core(adj, sT_ref[:], w20_ref[:].astype(jnp.float32),
                     hp=hp, group=group, Wb=block_w)
          + fT_ref[:].astype(jnp.float32))
    if has_res:
        h0 = h0 + rT_ref[:].astype(jnp.float32)
    y0 = _ACTS[act0](h0)
    h1 = _dense1_fm(w1_ref[:].astype(jnp.float32),
                    b1_ref[:].astype(jnp.float32), y0, hp=hp, group=group,
                    Wb=block_w, cdt=adj.dtype)
    out_ref[:] = (_ACTS[act1](h1) * aff_ref[0:1].astype(jnp.float32)
                  + aff_ref[1:2].astype(jnp.float32)).astype(out_ref.dtype)


def _step2_impl(adj_pack, stateT3, resT3, featsT3, w20, w1, b1, aff, *,
                act0: str, act1: str, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = stateT3.shape[1]
    H1 = w20.shape[0] // 2
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_res = resT3 is not None
    kernel = functools.partial(_step2_kernel_T, act0=act0, act1=act1, hp=hp,
                               has_res=has_res, group=group, block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H1, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * H1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, D, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, stateT3, featsT3, w20, w1, b1.reshape(D, 1),
                aff.reshape(2, D, 1)]
    if has_res:
        in_specs.insert(2, pl.BlockSpec((group, H1, Wb), b3,
                                        memory_space=pltpu.VMEM))
        operands.insert(2, resT3)
    return pl.pallas_call(
        wrapped,
        grid=(B // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, Wb), stateT3.dtype),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_propagation_step2(adj_pack, stateT3, resT3, featsT3, w20, w1, b1,
                            affine=None, act0: str = "tanh",
                            act1: str = "tanh", group: int = 9,
                            interpret: Optional[bool] = None):
    """One fused 2-LAYER propagation iteration (dense0+act0+dense1+act1).

    :param w20: [2H1, D] stacked dense0 rows [W0s; W0a] (state/agg columns).
    :param w1: [D, H1] dense1 (transposed), b1: [D].
    :param featsT3: [B, H1, Wb] hoisted W0f@feats + b0.
    :param resT3: [B, H1, Wb] cross-block residual through W0a, or None.
    Other params as fused_propagation_step."""
    D = w1.shape[0]
    aff = (jnp.stack([jnp.ones((D,), w20.dtype), jnp.zeros((D,), w20.dtype)])
           if affine is None else affine)
    return _step2_impl(adj_pack, stateT3, resT3, featsT3, w20, w1, b1, aff,
                       act0=act0, act1=act1, group=group, interpret=interpret)


def _step2_fwd(adj_pack, stateT3, resT3, featsT3, w20, w1, b1, affine, act0,
               act1, group, interpret):
    out = fused_propagation_step2(adj_pack, stateT3, resT3, featsT3, w20, w1,
                                  b1, affine, act0, act1, group, interpret)
    return out, (adj_pack, stateT3, resT3, featsT3, w20, w1, b1, affine)


def _step2_bwd(act0, act1, group, interpret, res, g):
    """XLA backward for the 2-layer step (dep blocks — small counts)."""
    adj_pack, sT3, rT3, fT3, w20, w1, b1, affine = res
    f32 = jnp.float32
    Wb = adj_pack.shape[1]
    hp = adj_pack.shape[2] == 2 * Wb
    adjT = (adj_pack[..., :Wb].astype(f32) + adj_pack[..., Wb:].astype(f32)
            if hp else adj_pack.astype(f32))
    has_res = rT3 is not None
    had_affine = affine is not None
    H1 = w20.shape[0] // 2
    ein = functools.partial(jnp.einsum, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)

    s3 = sT3.astype(f32)
    u = ein("kd,bdw->bkw", w20.astype(f32), s3)            # [B, 2H1, Wb]
    a = ein("bhs,bsd->bhd", u[:, H1:], adjT)
    h0 = u[:, :H1] + a + fT3.astype(f32)
    if has_res:
        h0 = h0 + rT3.astype(f32)
    y0 = _ACTS[act0](h0)
    h1 = ein("dh,bhw->bdw", w1.astype(f32), y0) + b1.astype(f32)[None, :, None]

    gy = g.astype(f32)
    if had_affine:
        y1 = _ACTS[act1](h1)
        daff = jnp.stack([jnp.sum(gy * y1, axis=(0, 2)),
                          jnp.sum(gy, axis=(0, 2))]).astype(affine.dtype)
        gy = gy * affine[0].astype(f32)[None, :, None]
    else:
        daff = None
    dh1 = gy * _act_grad(act1, h1)                         # [B, D, Wb]
    dw1 = ein("bdw,bhw->dh", dh1, y0).astype(w1.dtype)
    db1 = jnp.sum(dh1, axis=(0, 2)).astype(b1.dtype)
    dy0 = ein("dh,bdw->bhw", w1.astype(f32), dh1)
    dh0 = dy0 * _act_grad(act0, h0)                        # [B, H1, Wb]
    dfT3 = dh0.astype(fT3.dtype)
    drT3 = dh0.astype(rT3.dtype) if has_res else None
    dua = ein("bhd,bsd->bhs", dh0, adjT)
    du = jnp.concatenate([dh0, dua], axis=1)
    dw20 = ein("bkw,bdw->kd", du, s3).astype(w20.dtype)
    dsT3 = ein("kd,bkw->bdw", w20.astype(f32), du).astype(sT3.dtype)
    return (None, dsT3, drT3, dfT3, dw20, dw1, db1, daff)


fused_propagation_step2.defvjp(_step2_fwd, _step2_bwd)


def _loop2_kernel_T(refs, *, act0: str, act1: str, hp: bool, K: int,
                    thr: float, group: int, block_w: int):
    """The whole K-iteration 2-layer propagation loop for residual-free
    blocks: adjacency streamed once, both dense layers in VMEM."""
    (adj_ref, s_ref, fT_ref, w20_ref, w1_ref, b1_ref, aff_ref, nm_ref,
     traj_ref, marg_ref) = refs
    adj = adj_ref[:]
    w20 = w20_ref[:].astype(jnp.float32)
    w1 = w1_ref[:].astype(jnp.float32)
    b1 = b1_ref[:].astype(jnp.float32)
    fT0 = fT_ref[:].astype(jnp.float32)
    aff0 = aff_ref[0:1].astype(jnp.float32)
    aff1 = aff_ref[1:2].astype(jnp.float32)
    nm = nm_ref[:]
    thrf = jnp.float32(thr)
    s = s_ref[:]
    s_old = jnp.ones_like(s)
    for k in range(K):
        diff = (s - s_old).astype(jnp.float32)
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))
        norm = jnp.sqrt(jnp.sum(jnp.square(s_old.astype(jnp.float32)),
                                axis=1))
        marg_ref[k] = jnp.where(dist > thrf * norm, 1.0, 0.0) * nm
        h0 = _iter_core(adj, s, w20, hp=hp, group=group, Wb=block_w) + fT0
        y0 = _ACTS[act0](h0)
        h1 = _dense1_fm(w1, b1, y0, hp=hp, group=group, Wb=block_w,
                        cdt=adj.dtype)
        y1 = _ACTS[act1](h1) * aff0 + aff1
        s_old = s
        s = y1.astype(s.dtype)
        traj_ref[k] = s


def _loop2_impl(adj_pack, s0, fT0, w20, w1, b1, aff, nmf, *, K: int,
                threshold: float, act0: str, act1: str, group: int,
                interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    H1 = w20.shape[0] // 2
    if w1.shape[0] != D:
        raise ValueError(f"loop kernel needs state width out == in "
                         f"({w1.shape[0]} != {D})")
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop2_kernel_T, act0=act0, act1=act1, hp=hp,
                               K=K, thr=threshold, group=group, block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)        # noqa: E731
    return pl.pallas_call(
        wrapped,
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, H1, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, Wb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, group, D, Wb), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, Wb), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, B, D, Wb), s0.dtype),
            jax.ShapeDtypeStruct((K, B, Wb), jnp.float32),
        ],
        interpret=interpret,
    )(adj_pack, s0, fT0, w20, w1, b1.reshape(D, 1), aff.reshape(2, D, 1), nmf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def fused_propagation_loop2(adj_pack, s0, fT0, w20, w1, b1, affine, nmf,
                            K: int, threshold: float, act0: str = "tanh",
                            act1: str = "tanh", group: int = 9,
                            interpret: Optional[bool] = None):
    """Full K-iteration 2-LAYER propagation loop over residual-free blocks
    (see fused_propagation_loop; layer dims per fused_propagation_step2)."""
    D = w1.shape[0]
    aff = _ident_affine(D, w20.dtype) if affine is None else affine
    traj, margins = _loop2_impl(adj_pack, s0, fT0, w20, w1, b1, aff, nmf,
                                K=K, threshold=threshold, act0=act0,
                                act1=act1, group=group, interpret=interpret)
    return traj, margins


def _loop2_fwd(adj_pack, s0, fT0, w20, w1, b1, affine, nmf, K, threshold,
               act0, act1, group, interpret):
    traj, margins = fused_propagation_loop2(
        adj_pack, s0, fT0, w20, w1, b1, affine, nmf, K, threshold, act0,
        act1, group, interpret)
    return (traj, margins), (adj_pack, s0, fT0, w20, w1, b1, affine, traj)


def _loop2_bwd_kernel(refs, *, act0: str, act1: str, hp: bool, K: int,
                      group: int, block_w: int, has_affine: bool):
    """All K reverse iterations of the 2-layer loop backward in one kernel
    (structure of _loop_bwd_kernel plus the dense1 chain)."""
    Wb = block_w
    if has_affine:
        (adj_ref, s0_ref, traj_ref, fT_ref, w20_ref, w1_ref, b1_ref, aff_ref,
         gt_ref, gs_ref, dw20_ref, dw1_ref, db1_ref, dfT_ref,
         daff_ref) = refs
        aff0 = aff_ref[0:1].astype(jnp.float32)
    else:
        (adj_ref, s0_ref, traj_ref, fT_ref, w20_ref, w1_ref, b1_ref,
         gt_ref, gs_ref, dw20_ref, dw1_ref, db1_ref, dfT_ref) = refs
    adj = adj_ref[:]
    w20 = w20_ref[:].astype(jnp.float32)                   # [2H1, D]
    w1 = w1_ref[:].astype(jnp.float32)                     # [D, H1]
    b1 = b1_ref[:].astype(jnp.float32)
    H2 = w20.shape[0]
    H1 = H2 // 2
    D = s0_ref.shape[1]
    fT0 = fT_ref[:].astype(jnp.float32)

    if hp:
        w20T_hi, w20T_lo = _split16(w20.T)                 # [D, 2H1]
        w20T4 = jnp.broadcast_to(
            jnp.concatenate([w20T_hi, w20T_lo], axis=0)[None],
            (group, 2 * D, H2))
        w1T_hi, w1T_lo = _split16(w1.T)                    # [H1, D]
        w1T4 = jnp.broadcast_to(
            jnp.concatenate([w1T_hi, w1T_lo], axis=0)[None],
            (group, 2 * H1, D))
    else:
        w20T_b = jnp.broadcast_to(w20.T.astype(adj.dtype)[None],
                                  (group, D, H2))
        w1T_b = jnp.broadcast_to(w1.T.astype(adj.dtype)[None],
                                 (group, H1, D))

    gs = jnp.zeros((group, D, Wb), jnp.float32)
    dw20 = jnp.zeros((H2, D), jnp.float32)
    dw1 = jnp.zeros((D, H1), jnp.float32)
    db1 = jnp.zeros((D, 1), jnp.float32)
    dfT = jnp.zeros((group, H1, Wb), jnp.float32)
    if has_affine:
        daff_s = jnp.zeros((1, D, 1), jnp.float32)
        daff_b = jnp.zeros((1, D, 1), jnp.float32)
    for k in reversed(range(K)):
        s_in = (traj_ref[k - 1] if k else s0_ref[:])
        h0 = _iter_core(adj, s_in, w20, hp=hp, group=group, Wb=Wb) + fT0
        y0 = _ACTS[act0](h0)
        h1 = _dense1_fm(w1, b1, y0, hp=hp, group=group, Wb=Wb, cdt=adj.dtype)
        gy_raw = gt_ref[k].astype(jnp.float32) + gs
        if has_affine:
            daff_s = daff_s + jnp.sum(gy_raw * _ACTS[act1](h1),
                                      axis=(0, 2))[None, :, None]
            daff_b = daff_b + jnp.sum(gy_raw, axis=(0, 2))[None, :, None]
            gy = gy_raw * aff0
        else:
            gy = gy_raw
        dh1 = gy * _act_grad(act1, h1)                     # [g, D, Wb]
        db1 = db1 + jnp.sum(dh1, axis=(0, 2))[:, None]
        dw1 = dw1 + jnp.sum(_BDT_HI(dh1, y0), axis=0)         # [D, H1]
        dy0 = _mm_packed(w1T4 if hp else w1T_b, dh1, H1, hp=hp, Wb=Wb,
                         cdt=adj.dtype)                    # [g, H1, Wb]
        dh0 = dy0 * _act_grad(act0, h0)
        dfT = dfT + dh0
        dua = _contract_dst(dh0, adj, hp=hp)
        du = jnp.concatenate([dh0, dua], axis=1)           # [g, 2H1, Wb]
        dw20 = dw20 + jnp.sum(_BDT_HI(du, s_in.astype(jnp.float32)), axis=0)
        gs = _mm_packed(w20T4 if hp else w20T_b, du, D, hp=hp, Wb=Wb,
                        cdt=adj.dtype)                     # [g, D, Wb]
    gs_ref[:] = gs.astype(gs_ref.dtype)
    dw20_ref[0] = dw20.astype(dw20_ref.dtype)
    dw1_ref[0] = dw1.astype(dw1_ref.dtype)
    db1_ref[0] = db1.astype(db1_ref.dtype)
    dfT_ref[:] = dfT.astype(dfT_ref.dtype)
    if has_affine:
        daff_ref[0] = jnp.concatenate([daff_s, daff_b], axis=0).astype(
            daff_ref.dtype)


def _loop2_bwd(K, threshold, act0, act1, group, interpret, res, g):
    g_traj, _ = g
    adj_pack, s0, fT0, w20, w1, b1, affine, traj = res
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    H1 = w20.shape[0] // 2
    has_affine = affine is not None
    interp = interpret
    if interp is None:
        interp = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop2_bwd_kernel, act0=act0, act1=act1,
                               hp=hp, K=K, group=group, block_w=Wb,
                               has_affine=has_affine)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    G = B // group
    b3 = lambda i: (i, 0, 0)        # noqa: E731
    b4 = lambda i: (0, i, 0, 0)     # noqa: E731
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H1, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * H1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, s0, traj, fT0, w20, w1, b1.reshape(D, 1), g_traj]
    out_specs = [
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * H1, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, H1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D, Wb), s0.dtype),
        jax.ShapeDtypeStruct((G, 2 * H1, D), jnp.float32),
        jax.ShapeDtypeStruct((G, D, H1), jnp.float32),
        jax.ShapeDtypeStruct((G, D, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, H1, Wb), fT0.dtype),
    ]
    if has_affine:
        in_specs.insert(7, pl.BlockSpec((2, D, 1), lambda i: (0, 0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(7, affine.reshape(2, D, 1))
        out_specs.append(pl.BlockSpec((1, 2, D, 1), lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((G, 2, D, 1), jnp.float32))
    res_out = pl.pallas_call(
        wrapped, grid=(G,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interp,
    )(*operands)
    gs, dw20_p, dw1_p, db1_p, dfT = res_out[:5]
    daff = (jnp.sum(res_out[5], axis=0)[:, :, 0].astype(affine.dtype)
            if has_affine else None)
    return (None, gs.astype(s0.dtype), dfT.astype(fT0.dtype),
            jnp.sum(dw20_p, axis=0).astype(w20.dtype),
            jnp.sum(dw1_p, axis=0).astype(w1.dtype),
            jnp.sum(db1_p, axis=0)[:, 0].astype(b1.dtype), daff, None)


fused_propagation_loop2.defvjp(_loop2_fwd, _loop2_bwd)


# --------------------------------------------- looped 2-layer TRAINING loop
# Dropout training for hidden-layer state nets (the hidden-150 accuracy
# configs). Unlike the 1-layer training loop — which streams a precomputed
# per-iteration feature term fT = Wf@drop_k(feats)+b [K, B, H, Wb] — this
# kernel consumes the RAW dropped arc-label aggregation fd [K, B, AL, Wb]
# (AL ~ 3 rows vs H1 ~ 150) and evaluates the FULL dense0 in one packed MXU
# issue per iteration: h0 = [Ws|Wa|Wf] @ [s_drop; agg_drop; fd_k] + b0.
# Dropout between the aggregation and dense0 makes the eval kernels'
# reassociation illegal (same reason as fused_train_loop), so the adjacency
# bmm runs first and the aggregated slice's keep-mask is applied in VMEM;
# the state/feature slices arrive with masks from the SAME bernoulli stream
# as the XLA body. Per-iteration aggregations are saved for the fused
# backward (one kernel per block group, adjacency streamed once).
def _loop2_train_kernel_T(refs, *, act0: str, act1: str, hp: bool, K: int,
                          thr: float, group: int, block_w: int,
                          alpha_drop: bool, rate: float):
    Wb = block_w
    (adj_ref, s_ref, ms_ref, ma_ref, fd_ref, w0_ref, b0_ref, w1_ref, b1_ref,
     nm_ref, traj_ref, marg_ref, agg_ref) = refs
    adj = adj_ref[:]
    w0 = w0_ref[:].astype(jnp.float32)                    # [H1, 2D + AL]
    b0 = b0_ref[:].astype(jnp.float32)                    # [H1, 1]
    w1 = w1_ref[:].astype(jnp.float32)                    # [D, H1]
    b1 = b1_ref[:].astype(jnp.float32)                    # [D, 1]
    H1 = w0.shape[0]
    nm = nm_ref[:]
    thrf = jnp.float32(thr)
    s = s_ref[:]
    D = s.shape[1]
    s_old = jnp.ones_like(s)
    drop, _ = _make_drop(alpha_drop, rate)
    if hp:
        w0_hi, w0_lo = _split16(w0)
        w04 = jnp.broadcast_to(jnp.concatenate([w0_hi, w0_lo], axis=0)[None],
                               (group, 2 * H1) + w0.shape[1:])
    else:
        w0_b = jnp.broadcast_to(w0.astype(adj.dtype)[None],
                                (group,) + w0.shape)

    for k in range(K):
        diff = (s - s_old).astype(jnp.float32)
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))     # [g, Wb]
        norm = jnp.sqrt(jnp.sum(jnp.square(s_old.astype(jnp.float32)),
                                axis=1))
        marg_ref[k] = jnp.where(dist > thrf * norm, 1.0, 0.0) * nm
        # issue 1: agg = s @ adjT (hi/lo packed when the adjacency is f32)
        agg = _agg_packed(s, adj, hp=hp)
        agg_ref[k] = agg.astype(agg_ref.dtype)
        x3 = jnp.concatenate([drop(s.astype(jnp.float32), ms_ref[k]),
                              drop(agg, ma_ref[k]),
                              fd_ref[k].astype(jnp.float32)],
                             axis=1)                      # [g, 2D+AL, Wb]
        # issue 2: h0 = [Ws | Wa | Wf] @ [s_drop ; agg_drop ; fd_k] + b0
        h0 = _mm_packed(w04 if hp else w0_b, x3, H1, hp=hp, Wb=Wb,
                        cdt=adj.dtype) + b0[None]
        y0 = _ACTS[act0](h0)
        # issue 3: h1 = w1 @ y0 + b1
        h1 = _dense1_fm(w1, b1, y0, hp=hp, group=group, Wb=Wb, cdt=adj.dtype)
        s_old = s
        s = _ACTS[act1](h1).astype(s.dtype)
        traj_ref[k] = s


def _loop2_train_impl(adj_pack, s0, ms, ma, fd, w0, b0, w1, b1, nmf, *,
                      K: int, threshold: float, act0: str, act1: str,
                      alpha_drop: bool, rate: float, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    AL = fd.shape[2]
    H1 = w0.shape[0]
    if w1.shape[0] != D:
        raise ValueError(f"loop kernel needs state width out == in "
                         f"({w1.shape[0]} != {D})")
    if w0.shape[1] != 2 * D + AL:
        raise ValueError(f"w0 columns {w0.shape[1]} != 2D+AL {2 * D + AL}")
    if B % group:
        raise ValueError(f"block count {B} not divisible by group {group}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop2_train_kernel_T, act0=act0, act1=act1,
                               hp=hp, K=K, thr=threshold, group=group,
                               block_w=Wb, alpha_drop=alpha_drop, rate=rate)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)        # noqa: E731
    b4 = lambda i: (0, i, 0, 0)     # noqa: E731
    return pl.pallas_call(
        wrapped,
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, AL, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, 2 * D + AL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, Wb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, Wb), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, B, D, Wb), s0.dtype),
            jax.ShapeDtypeStruct((K, B, Wb), jnp.float32),
            jax.ShapeDtypeStruct((K, B, D, Wb), jnp.float32),
        ],
        interpret=interpret,
    )(adj_pack, s0, ms, ma, fd, w0, b0.reshape(H1, 1), w1,
      b1.reshape(D, 1), nmf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15,
                                                    16, 17))
def fused_train_loop2(adj_pack, s0, ms, ma, fd, w0, b0, w1, b1, nmf, K: int,
                      threshold: float, act0: str = "tanh",
                      act1: str = "tanh", alpha_drop: bool = True,
                      rate: float = 0.0, group: int = 8,
                      interpret: Optional[bool] = None):
    """The full K-iteration 2-LAYER TRAINING propagation loop over
    residual-free blocks (dropout at the MLP input, NO BatchNorm).

    :param adj_pack: pack_adjacency output for the loop blocks.
    :param s0: [B, D, Wb] initial states (feature-major blocks).
    :param ms: [K, B, D, Wb] f32 keep-masks for the STATE input slice.
    :param ma: [K, B, D, Wb] f32 keep-masks for the AGGREGATED slice
        (applied in-VMEM after the adjacency bmm).
    :param fd: [K, B, AL, Wb] per-iteration PRE-DROPPED arc-label aggregation
        (drop_k applied outside with the body's bernoulli stream).
    :param w0: [H1, 2D + AL] full transposed dense0 weight [Ws | Wa | Wf].
    :param b0: [H1], w1: [D, H1] transposed dense1, b1: [D].
    :param nmf: [B, Wb] float node mask for the convergence flags.
    Returns (traj [K, B, D, Wb], margins [K, B, Wb])."""
    traj, margins, _ = _loop2_train_impl(
        adj_pack, s0, ms, ma, fd, w0, b0, w1, b1, nmf, K=K,
        threshold=threshold, act0=act0, act1=act1, alpha_drop=alpha_drop,
        rate=rate, group=group, interpret=interpret)
    return traj, margins


def _loop2_train_fwd(adj_pack, s0, ms, ma, fd, w0, b0, w1, b1, nmf, K,
                     threshold, act0, act1, alpha_drop, rate, group,
                     interpret):
    traj, margins, agg = _loop2_train_impl(
        adj_pack, s0, ms, ma, fd, w0, b0, w1, b1, nmf, K=K,
        threshold=threshold, act0=act0, act1=act1, alpha_drop=alpha_drop,
        rate=rate, group=group, interpret=interpret)
    return (traj, margins), (adj_pack, s0, ms, ma, fd, w0, b0, w1, b1, traj,
                             agg)


def _loop2_train_bwd_kernel(refs, *, act0: str, act1: str, hp: bool, K: int,
                            group: int, block_w: int, alpha_drop: bool,
                            rate: float):
    """All K reverse iterations of the 2-layer training-loop backward for a
    group of blocks in one kernel: adjacency streamed once; each step's
    recompute (dropout + dense0 + act0 + dense1), the dh1/dh0 chains, the
    dw0/db0/dw1/db1 accumulators and the dagg -> ds adjacency contraction
    all stay in VMEM. Per-group weight partials are summed by the caller."""
    Wb = block_w
    (adj_ref, s0_ref, traj_ref, agg_ref, ms_ref, ma_ref, fd_ref, w0_ref,
     b0_ref, w1_ref, b1_ref, gt_ref, gs_ref, dw0_ref, db0_ref, dw1_ref,
     db1_ref, dfd_ref) = refs
    adj = adj_ref[:]
    w0 = w0_ref[:].astype(jnp.float32)                    # [H1, 2D + AL]
    b0 = b0_ref[:].astype(jnp.float32)
    w1 = w1_ref[:].astype(jnp.float32)                    # [D, H1]
    b1 = b1_ref[:].astype(jnp.float32)
    H1 = w0.shape[0]
    I = w0.shape[1]
    D = s0_ref.shape[1]
    AL = I - 2 * D
    drop, dmask = _make_drop(alpha_drop, rate)
    if hp:
        w0_hi, w0_lo = _split16(w0)
        w04 = jnp.broadcast_to(jnp.concatenate([w0_hi, w0_lo], axis=0)[None],
                               (group, 2 * H1, I))
        w0T_hi, w0T_lo = _split16(w0.T)                   # [I, H1]
        w0T4 = jnp.broadcast_to(
            jnp.concatenate([w0T_hi, w0T_lo], axis=0)[None],
            (group, 2 * I, H1))
        w1T_hi, w1T_lo = _split16(w1.T)                   # [H1, D]
        w1T4 = jnp.broadcast_to(
            jnp.concatenate([w1T_hi, w1T_lo], axis=0)[None],
            (group, 2 * H1, D))
    else:
        w0_b = jnp.broadcast_to(w0.astype(adj.dtype)[None], (group, H1, I))
        w0T_b = jnp.broadcast_to(w0.T.astype(adj.dtype)[None],
                                 (group, I, H1))
        w1T_b = jnp.broadcast_to(w1.T.astype(adj.dtype)[None],
                                 (group, H1, D))

    gs = jnp.zeros((group, D, Wb), jnp.float32)
    dw0 = jnp.zeros((H1, I), jnp.float32)
    db0 = jnp.zeros((H1, 1), jnp.float32)
    dw1 = jnp.zeros((D, H1), jnp.float32)
    db1 = jnp.zeros((D, 1), jnp.float32)
    for k in reversed(range(K)):
        s_in = (traj_ref[k - 1] if k else s0_ref[:]).astype(jnp.float32)
        x3 = jnp.concatenate([drop(s_in, ms_ref[k]),
                              drop(agg_ref[k].astype(jnp.float32),
                                   ma_ref[k]),
                              fd_ref[k].astype(jnp.float32)],
                             axis=1)                      # [g, 2D+AL, Wb]
        # recompute h0, y0, h1 with the forward's exact packed algebra
        h0 = _mm_packed(w04 if hp else w0_b, x3, H1, hp=hp, Wb=Wb,
                        cdt=adj.dtype) + b0[None]
        y0 = _ACTS[act0](h0)
        h1 = _dense1_fm(w1, b1, y0, hp=hp, group=group, Wb=Wb, cdt=adj.dtype)
        gy = gt_ref[k].astype(jnp.float32) + gs
        dh1 = gy * _act_grad(act1, h1)                    # [g, D, Wb]
        db1 = db1 + jnp.sum(dh1, axis=(0, 2))[:, None]
        dw1 = dw1 + jnp.sum(_BDT_HI(dh1, y0), axis=0)        # [D, H1]
        dy0 = _mm_packed(w1T4 if hp else w1T_b, dh1, H1, hp=hp, Wb=Wb,
                         cdt=adj.dtype)                   # [g, H1, Wb]
        dh0 = dy0 * _act_grad(act0, h0)
        db0 = db0 + jnp.sum(dh0, axis=(0, 2))[:, None]
        dw0 = dw0 + jnp.sum(_BDT_HI(dh0, x3), axis=0)        # [H1, 2D+AL]
        dx3 = _mm_packed(w0T4 if hp else w0T_b, dh0, I, hp=hp, Wb=Wb,
                         cdt=adj.dtype)                   # [g, 2D+AL, Wb]
        dfd_ref[k] = dx3[:, 2 * D:].astype(dfd_ref.dtype)
        dagg = dx3[:, D:2 * D] * dmask(ma_ref[k])
        # ds = dagg @ adjTᵀ over the packed dst axis
        ds = _contract_dst(dagg, adj, hp=hp)
        gs = dx3[:, :D] * dmask(ms_ref[k]) + ds
    gs_ref[:] = gs.astype(gs_ref.dtype)
    dw0_ref[0] = dw0.astype(dw0_ref.dtype)
    db0_ref[0] = db0.astype(db0_ref.dtype)
    dw1_ref[0] = dw1.astype(dw1_ref.dtype)
    db1_ref[0] = db1.astype(db1_ref.dtype)


def _loop2_train_bwd_impl(adj_pack, s0, traj, agg, ms, ma, fd, w0, b0, w1,
                          b1, g_traj, *, K: int, act0: str, act1: str,
                          alpha_drop: bool, rate: float, group: int,
                          interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = s0.shape[1]
    AL = fd.shape[2]
    H1 = w0.shape[0]
    I = 2 * D + AL
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_loop2_train_bwd_kernel, act0=act0, act1=act1,
                               hp=hp, K=K, group=group, block_w=Wb,
                               alpha_drop=alpha_drop, rate=rate)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    G = B // group
    b3 = lambda i: (i, 0, 0)        # noqa: E731
    b4 = lambda i: (0, i, 0, 0)     # noqa: E731
    gs, dw0_p, db0_p, dw1_p, db1_p, dfd = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, AL, Wb), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, D, Wb), b4, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1, I), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1, 1), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, H1), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 1), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, group, AL, Wb), b4, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), s0.dtype),
            jax.ShapeDtypeStruct((G, H1, I), jnp.float32),
            jax.ShapeDtypeStruct((G, H1, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, D, H1), jnp.float32),
            jax.ShapeDtypeStruct((G, D, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, B, AL, Wb), fd.dtype),
        ],
        interpret=interpret,
    )(adj_pack, s0, traj, agg, ms, ma, fd, w0, b0.reshape(H1, 1), w1,
      b1.reshape(D, 1), g_traj)
    return (gs, jnp.sum(dw0_p, axis=0), jnp.sum(db0_p, axis=0)[:, 0],
            jnp.sum(dw1_p, axis=0), jnp.sum(db1_p, axis=0)[:, 0], dfd)


def _loop2_train_bwd(K, threshold, act0, act1, alpha_drop, rate, group,
                     interpret, res, g):
    """Fused backward: all K reverse iterations in one kernel per block group
    (adjacency streamed once). The forward saved every iteration's
    pre-dropout aggregation, so no forward adjacency bmm is re-run; fd's
    cotangent is returned so LGNN-augmented arc labels keep their grads."""
    g_traj, _ = g                                         # margins: non-diff
    adj_pack, s0, ms, ma, fd, w0, b0, w1, b1, traj, agg = res
    gs, dw0, db0, dw1, db1, dfd = _loop2_train_bwd_impl(
        adj_pack, s0, traj, agg.astype(jnp.float32), ms, ma, fd, w0, b0, w1,
        b1, g_traj.astype(s0.dtype), K=K, act0=act0, act1=act1,
        alpha_drop=alpha_drop, rate=rate, group=group, interpret=interpret)
    return (None, gs.astype(s0.dtype), None, None, dfd.astype(fd.dtype),
            dw0.astype(w0.dtype), db0.astype(b0.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), None)


fused_train_loop2.defvjp(_loop2_train_fwd, _loop2_train_bwd)


def supports_fused2_train(state_spec) -> bool:
    """Static eligibility of the 2-LAYER looped TRAINING kernel
    (fused_train_loop2): two dense layers, fusable activations, dropout only
    at the input (pos 0), no BatchNorm (its training moments are a global
    cross-block reduction every iteration — and there is no per-step 2-layer
    training kernel to fall back to)."""
    if state_spec.num_layers != 2:
        return False
    if any(a not in FUSABLE_ACTIVATIONS for a in state_spec.activations):
        return False
    if any(p != 0 for p in state_spec.dropout_pos):
        return False
    if state_spec.batch_normalization:
        return False
    return True


def supports_fused2(state_spec, training: bool) -> bool:
    """Static eligibility of the 2-LAYER EVAL kernels (dense0+act0+dense1+
    act1): both activations fusable; in training mode dropout and the
    trailing batch-stat BN are excluded here — dropout training routes to
    the looped training kernel instead (supports_fused2_train /
    fused_train_loop2), BN training keeps the XLA body (its moments are a
    global per-iteration reduction) — at eval both are inactive/fused
    (BN inference affine)."""
    if state_spec.num_layers != 2:
        return False
    if any(a not in FUSABLE_ACTIVATIONS for a in state_spec.activations):
        return False
    if training and (state_spec.dropout_rate
                     or state_spec.batch_normalization):
        return False
    return True


def bn_inference_affine(gamma, beta, mean, var, eps: float = 1e-3):
    """[2, H] (scale; shift) for the post-activation inference BatchNorm:
    y = act(h)·scale + shift with scale = γ·rsqrt(σ²+ε), shift = β − μ·scale
    (ops/mlp.py::_batchnorm eval branch; the reference puts BN after the last
    dense+activation, MLP.py:63)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return jnp.stack([scale, beta - mean * scale])


def pick_group(n_blocks: int, cap: int = 45, loop: bool = False) -> int:
    """Largest divisor of n_blocks within the VMEM budget (feature-major
    blocks cost ~90 KB double-buffered; 45 blocks ≈ 8 MB of the 16 MB limit).

    loop=True is for the LOOP kernels, which carry 2-D [B, Wb] node-mask and
    3-D [K, B, Wb] margin arrays whose second-to-last block dim IS the group:
    Mosaic requires it to be a multiple of 8 or the whole array. Loop-block
    counts are padded to a multiple of 8 whenever they exceed 8
    (from_graphs_blocked), so a multiple-of-8 divisor always exists.
    Per-step kernels (loop=False) block only ≥3-D arrays with full trailing
    dims — any divisor lowers fine, so they take the plain maximum."""
    if n_blocks <= cap:
        return n_blocks
    if loop:
        ok = [d for d in range(1, cap + 1)
              if n_blocks % d == 0 and d % 8 == 0]
        if ok:
            return max(ok)
    return max(d for d in range(1, cap + 1) if n_blocks % d == 0)


def supports_fused(state_spec, training: bool) -> bool:
    """Static eligibility of the EVAL fused kernel (fused_propagation_step /
    _loop) for a state MLPSpec — training-mode dropout/batch-stat BN need the
    training kernel instead (supports_fused_train)."""
    if state_spec.num_layers != 1:
        return False
    if state_spec.activations[0] not in FUSABLE_ACTIVATIONS:
        return False
    if training and (state_spec.dropout_rate or state_spec.batch_normalization):
        return False
    return True


def supports_fused_train(state_spec) -> bool:
    """Static eligibility of the TRAINING fused kernel (fused_train_step):
    single dense layer, fusable activation, dropout only at the input
    (pos 0 — the kernel applies the aggregated slice's mask in-VMEM, the
    caller pre-drops the rest); the trailing BatchNorm is allowed because its
    training-mode moments run outside in XLA (global reduction)."""
    if state_spec.num_layers != 1:
        return False
    if state_spec.activations[0] not in FUSABLE_ACTIVATIONS:
        return False
    if any(p != 0 for p in state_spec.dropout_pos):
        return False
    return True
