"""Kernel-path BatchNorm TRAINING propagation (the reference's default
config: trailing BatchNormalization on the state net, MLP.py:13,63).

BN's training-mode moments are a GLOBAL cross-block reduction every
iteration, so the whole-loop kernels (ops/pallas_fused.py) — which keep each
block resident for all K iterations — cannot apply: iteration k+1 of every
block needs the moments of every other block's iteration k. The exact
structure is one kernel launch per iteration with [2, D]-sized XLA glue
between launches:

    for k in 1..K:                       (UNROLLED python loop, K static)
      y_k, agg_k, margins_k, sum(y_k) = _bn_fwd_kernel launch   (Pallas)
      mean/var finalize -> affine_k                             (XLA, [2,D])

The kernel consumes the PREVIOUS iteration's pre-BN activation y_{k-1} plus
the affine vector (scale, shift) derived from its batch moments, and
normalizes AT LOAD TIME in VMEM — post-BN states are never materialized in
HBM (node-major [N, D] arrays lane-pad D -> 128 on TPU, 9x the bytes; and
XLA's layout choices for an elementwise normalize forced relayout copies
around every kernel call in the v1 design). Margins (pre-update convergence
flags, GNN.py:202-220) and the moment partial sums are computed in-kernel
for the same reason. Cross-block residual edges are gathered/scattered
directly in the feature-major [B, D, Wb] layout ((block, lane) indexing —
no full-array transposes).

Round 4, the fT-fold: the per-iteration feature term
fT_k = Wf @ dropout_k(feats) + b used to be precomputed outside as a
[K, B, H, Wb] stream read by BOTH passes (and written back as dfT by the
backward). It is now folded INTO the kernels' dense: the input rows are
x3 = [state_drop ; agg_drop ; feats_drop ; 1] against the bias-augmented
weight w_aug = [Ws | Wa | Wf | b], with the raw loop-invariant feats
[B, F, Wb] streamed instead (F = fold dims ~ AL << H) and ONE combined
int8 keep-mask [K, B, 2D+F, Wb] replacing the two separate [K, B, D, Wb]
mask streams (2D+F rows land on a single int8 (32,128) tile at the
reference shapes). This removes the fT construction, its fwd+bwd reads,
the dfT write, and the outside dfT->dWf einsum — dw_aug from the backward
kernel directly carries dWs|dWa|dWf|db. feats carry NO gradient (graph
constants, like the adjacency). Saves ~0.2 ms/step on the flagship and far
more on hidden-width nets, where fT was [K, B, H1~150, Wb].

The whole K-loop is ONE custom_vjp returning (iters, state, moms): snapshot
selection happens inside, and the backward is K launches of a fused
one-iteration backward kernel (recompute + dh + dw + dagg->ds chain in
VMEM) with the BatchNorm backward as [2, D] reductions + one elementwise
pass in XLA. No lax.scan anywhere — residuals are exactly the per-iteration
y/agg pairs the backward needs.

Semantics are the XLA body's exactly (ops/mlp.py::_batchnorm training
branch, masked two-pass moments, eps 1e-3, momentum 0.99): reference
MLP.py:63 trailing BN inside the fixed-point loop GNN.py:223-242; moving
statistics follow the active-step gating of models/core.py::propagate
(frozen iterations stop updating them)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnn_tpu.ops.mlp import _ALPHA_P, _BN_EPS, _BN_MOMENTUM
from gnn_tpu.ops.pallas_fused import (_BDT_HI, _act_grad, _ACTS,
                                      _agg_packed, _contract_dst,
                                      _dense1_fm, _make_drop,
                                      _mm_packed, _split16, from_blocks_fm,
                                      FUSABLE_ACTIVATIONS, pack_adjacency,
                                      pick_group, to_blocks_fm)


def _pack_w(w, *, hp: bool, group: int, cdt):
    """Broadcast an [R, C] weight for _mm_packed: hp stacks [w_hi; w_lo]."""
    if hp:
        w_hi, w_lo = _split16(w)
        return jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                                (group, 2 * w.shape[0], w.shape[1]))
    return jnp.broadcast_to(w.astype(cdt)[None], (group,) + w.shape)


def _x3_aug(s, agg, feats, mc, *, rate: float, alpha_drop: bool,
            group: int, Wb: int):
    """The bias-augmented dense input [s_drop; agg_drop; feats_drop; 1]
    ([g, 2D+F+1, Wb] f32) — pos-0 dropout applied in ONE elementwise pass
    over the combined rows with the combined keep-mask (ops/mlp.py::_dropout
    arithmetic via _make_drop)."""
    x3 = jnp.concatenate([s, agg, feats], axis=1)
    if rate > 0.0:
        drop, _ = _make_drop(alpha_drop, rate)
        x3 = drop(x3, mc)
    return jnp.concatenate([x3, jnp.ones((group, 1, Wb), jnp.float32)],
                           axis=1)


def _bn_fwd_kernel(refs, *, activation: str, hp: bool, has_res: bool,
                   alpha_drop: bool, rate: float, group: int, block_w: int,
                   thr: float):
    """One BN training iteration for a group of blocks. Consumes the two
    previous pre-BN activations + their BN affines, normalizes in VMEM,
    computes convergence margins, dropout, aggregation, the bias-augmented
    dense (fT-folded) + activation, and the per-group moment partial sums —
    everything HBM-facing stays in the kernel's feature-major layout."""
    Wb = block_w
    refs = list(refs)
    adj_ref, y1_ref, y2_ref, aff_ref = refs[:4]
    refs = refs[4:]
    mc_ref = refs.pop(0) if rate > 0.0 else None
    r_ref = refs.pop(0) if has_res else None
    (f_ref, w_ref, nm_ref, y_ref, agg_ref, marg_ref, msum_ref) = refs
    adj = adj_ref[:]
    aff = aff_ref[:].astype(jnp.float32)                  # [2, 2, D, 1]
    # s_{k-1} / s_{k-2} reconstructed from pre-BN activations (exact up to
    # the affine-vs-centered rounding class the kernels already live in)
    s = y1_ref[:].astype(jnp.float32) * aff[0, 0] + aff[0, 1]
    s_old = y2_ref[:].astype(jnp.float32) * aff[1, 0] + aff[1, 1]
    nm = nm_ref[:]                                        # [g, 1, Wb] f32
    diff = s - s_old
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))         # [g, Wb]
    norm = jnp.sqrt(jnp.sum(s_old * s_old, axis=1))
    marg_ref[:] = (jnp.where(dist > jnp.float32(thr) * norm, 1.0, 0.0)[:, None, :]
                   * nm)

    agg = _agg_packed(s, adj, hp=hp)
    if has_res:
        agg = agg + r_ref[:].astype(jnp.float32)
    agg_ref[:] = agg.astype(agg_ref.dtype)
    x3 = _x3_aug(s, agg, f_ref[:].astype(jnp.float32),
                 mc_ref[:] if rate > 0.0 else None, rate=rate,
                 alpha_drop=alpha_drop, group=group, Wb=Wb)
    w = w_ref[:].astype(jnp.float32)                      # [H, 2D+F+1]
    H = w.shape[0]
    wp = _pack_w(w, hp=hp, group=group, cdt=adj.dtype)
    h = _mm_packed(wp, x3, H, hp=hp, Wb=Wb, cdt=adj.dtype)
    y = _ACTS[activation](h)
    y_ref[:] = y.astype(y_ref.dtype)
    # masked partial sum of y over this group (mean; the centered variance
    # pass runs in XLA so the two-pass _batchnorm arithmetic is preserved)
    msum_ref[0] = jnp.sum(y * nm, axis=(0, 2))[None, :]


def _bn_fwd_call(adj_pack, y1, y2, aff, mc, rT, feats, w_aug, nmf, *,
                 activation, alpha_drop, rate, group, thr, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y1.shape[1]
    F = feats.shape[1]
    H = w_aug.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_res = rT is not None
    kernel = functools.partial(_bn_fwd_kernel, activation=activation, hp=hp,
                               has_res=has_res, alpha_drop=alpha_drop,
                               rate=rate, group=group, block_w=Wb, thr=thr)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 2, D, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, y1, y2, aff]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec((group, 2 * D + F, Wb), b3,
                                     memory_space=pltpu.VMEM))
        operands.append(mc)
    if has_res:
        in_specs.append(pl.BlockSpec((group, D, Wb), b3,
                                     memory_space=pltpu.VMEM))
        operands.append(rT)
    in_specs += [
        pl.BlockSpec((group, F, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 2 * D + F + 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands += [feats, w_aug, nmf]
    return pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((group, H, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Wb), y1.dtype),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, H), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def _bn_bwd_kernel(refs, *, activation: str, hp: bool, alpha_drop: bool,
                   rate: float, group: int, block_w: int):
    """ONE reverse training iteration for a group of blocks, with the
    BatchNorm backward folded in: given the raw state cotangent ds_in (plus
    the flag-gated snapshot injection gsel), reconstruct gy from the
    [D]-sized BN backward coefficients, recompute h from the saved
    pre-dropout aggregation + raw feats, dh = gy·act'(h), the bias-augmented
    dw partial (carrying dWs|dWa|dWf|db in one reduction), the dagg -> ds
    chain, and the NEXT reverse step's reduction partials
    (sum ds_out, sum ds_out·x_hat_prev) — so the per-iteration XLA glue
    stays [D]-sized and never forces relayout copies of full arrays.

    bnv rows: 0 aff_prev scale, 1 aff_prev shift, 2 mean_k, 3 r_k,
    4 a = gamma·r_k, 5 b2 = a·s1/C, 6 c2 = a·s2/C, 7 mean_prev, 8 r_prev."""
    Wb = block_w
    refs = list(refs)
    adj_ref, yp_ref, yk_ref, agg_ref = refs[:4]
    refs = refs[4:]
    mc_ref = refs.pop(0) if rate > 0.0 else None
    (f_ref, w_ref, ds_ref_in, gsel_ref, bnv_ref, flag_ref, nm_ref,
     ds_ref, dw_ref, dagg_ref, red_ref) = refs
    adj = adj_ref[:]
    w = w_ref[:].astype(jnp.float32)                      # [H, 2D+F+1]
    H = w.shape[0]
    D = yp_ref.shape[1]
    bnv = bnv_ref[:].astype(jnp.float32)                  # [16, D, 1]
    nm = nm_ref[:]                                        # [g, 1, Wb]
    flag = flag_ref[0, 0]
    s_prev = yp_ref[:].astype(jnp.float32) * bnv[0] + bnv[1]
    gS = ds_ref_in[:].astype(jnp.float32) + flag * gsel_ref[:].astype(
        jnp.float32)
    xk = (yk_ref[:].astype(jnp.float32) - bnv[2]) * bnv[3]
    gy = bnv[4] * gS - nm * (bnv[5] + xk * bnv[6])
    _, dmask = _make_drop(alpha_drop, rate)
    x3 = _x3_aug(s_prev, agg_ref[:].astype(jnp.float32),
                 f_ref[:].astype(jnp.float32),
                 mc_ref[:] if rate > 0.0 else None, rate=rate,
                 alpha_drop=alpha_drop, group=group, Wb=Wb)
    wp = _pack_w(w, hp=hp, group=group, cdt=adj.dtype)
    h = _mm_packed(wp, x3, H, hp=hp, Wb=Wb, cdt=adj.dtype)
    dh = gy * _act_grad(activation, h)
    dw_ref[0] = jnp.sum(_BDT_HI(dh, x3), axis=0).astype(dw_ref.dtype)
    # dx only for the [s; agg] rows — feats/bias rows carry no gradient
    w2d = w[:, :2 * D]
    wT_b = _pack_w(w2d.T, hp=hp, group=group, cdt=adj.dtype)
    dx2 = _mm_packed(wT_b, dh, 2 * D, hp=hp, Wb=Wb, cdt=adj.dtype)
    if rate > 0.0:
        dm = dmask(mc_ref[:])                             # [g, 2D+F, Wb]
        dagg = dx2[:, D:] * dm[:, D:2 * D]
        ds_out = dx2[:, :D] * dm[:, :D] + _contract_dst(dagg, adj, hp=hp)
    else:
        dagg = dx2[:, D:]
        ds_out = dx2[:, :D] + _contract_dst(dagg, adj, hp=hp)
    dagg_ref[:] = dagg.astype(dagg_ref.dtype)
    ds_ref[:] = ds_out.astype(ds_ref.dtype)
    xp_hat = (yp_ref[:].astype(jnp.float32) - bnv[7]) * bnv[8]
    red_ref[0] = jnp.stack([jnp.sum(ds_out, axis=(0, 2)),
                            jnp.sum(ds_out * xp_hat, axis=(0, 2))])


def _bn_bwd_call(adj_pack, y_prev, y_k, agg, mc, feats, w_aug, ds_in, gsel,
                 bnv, flag, nmf, *, activation: str, alpha_drop: bool,
                 rate: float, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y_prev.shape[1]
    F = feats.shape[1]
    H = w_aug.shape[0]
    C = w_aug.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_bn_bwd_kernel, activation=activation, hp=hp,
                               alpha_drop=alpha_drop, rate=rate, group=group,
                               block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    dspec = pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        dspec, dspec, dspec,
    ]
    operands = [adj_pack, y_prev, y_k, agg]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec((group, 2 * D + F, Wb), b3,
                                     memory_space=pltpu.VMEM))
        operands.append(mc)
    in_specs += [
        pl.BlockSpec((group, F, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        dspec, dspec,
        pl.BlockSpec((16, D, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands += [feats, w_aug, ds_in, gsel, bnv, flag, nmf]
    ds, dw_part, dagg, red_part = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            dspec,
            pl.BlockSpec((1, H, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            dspec,
            pl.BlockSpec((1, 2, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, H, C), jnp.float32),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, 2, D), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return (ds, jnp.sum(dw_part, axis=0), dagg, jnp.sum(red_part, axis=0))


def _affine(gamma, beta, mean, var):
    """[2, D] (scale, shift) of the training-mode BN for given batch moments:
    s = y·scale + shift == (y - mean)·rsqrt(var+eps)·gamma + beta."""
    scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(var + _BN_EPS)
    return jnp.stack([scale, beta.astype(jnp.float32) - mean * scale])


def _res_flat_idx(node_idx, D, Wb):
    """[E, D] flat indices into a feature-major [B, D, Wb] array viewed 1-D:
    flat(b, d, w) = (b·D + d)·Wb + w — 1-D gathers/scatters never force XLA
    relayout copies of the full array (2-axis forms did, ~0.1 ms each)."""
    b, w = node_idx // Wb, node_idx % Wb
    d = jnp.arange(D, dtype=node_idx.dtype)
    return (b[:, None] * D + d[None, :]) * Wb + w[:, None]


def _res_gather(y3, aff, src_idx, res_w):
    """Residual-edge source values from feature-major y3 [B, D, Wb]:
    1-D gather by precomputed flat indices, then normalize and weight."""
    vals = jnp.take(y3.reshape(-1), src_idx).astype(jnp.float32)  # [E, D]
    vals = vals * aff[0][None, :] + aff[1][None, :]
    return vals * res_w[:, None]


def _res_scatter(vals, dst_idx, B, D, Wb):
    """Scatter-add [E, D] rows into a zero feature-major [B, D, Wb] array
    through the flat view."""
    return (jnp.zeros((B * D * Wb,), jnp.float32)
            .at[dst_idx.reshape(-1)].add(vals.reshape(-1))
            .reshape(B, D, Wb))


def _ident_aff(D):
    return jnp.stack([jnp.ones((D,), jnp.float32),
                      jnp.zeros((D,), jnp.float32)])


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16, 17))
def fused_bn_train_loop(adj_pack, s0, mc, feats, w_aug, gamma, beta, nmf,
                        res_src, res_dst, res_w, K: int, threshold: float,
                        activation: str = "tanh", alpha_drop: bool = True,
                        rate: float = 0.0, group: int = 32,
                        interpret: Optional[bool] = None):
    """The K-iteration BN TRAINING propagation loop (ALL blocks — BN couples
    every block through the batch moments each iteration, so there is no
    loop/dep split here; cross-block residual edges ride a per-iteration
    feature-major gather/scatter).

    :param adj_pack: pack_adjacency output for the FULL block set.
    :param s0: [B, D, Wb] initial states (feature-major blocks).
    :param mc: TUPLE of K [B, 2D+F, Wb] combined keep-masks in x3 row order
        [state | agg | fold] (int8), or K tiny dummies when rate == 0 (a
        stacked [K, ...] array forces a per-step relayout copy).
    :param feats: [B, F, Wb] loop-invariant raw fold features (node labels /
        aggregated constants; dropped in-VMEM per iteration). NO gradient —
        graph constants, like the adjacency.
    :param w_aug: [H, 2D+F+1] bias-augmented dense [Ws | Wa | Wf | b]; its
        cotangent carries dWs|dWa|dWf|db directly.
    :param gamma / beta: [D] BatchNorm scale / shift.
    :param nmf: [B, Wb] float node mask (moments + convergence flags).
    :param res_src / res_dst / res_w: cross-block residual edges (empty
        arrays when the batch has none).
    Returns (iters, state3 [B, D, Wb] — the realised-count snapshot with the
    reference's global early stop, moms [K, 2, D] per-iteration batch
    moments for the moving-statistics update; moms carries NO gradient)."""
    out, _ = _bn_loop_fwd(adj_pack, s0, mc, feats, w_aug, gamma, beta, nmf,
                          res_src, res_dst, res_w, K, threshold, activation,
                          alpha_drop, rate, group, interpret)
    return out


def _bn_loop_fwd(adj_pack, s0, mc, feats, w_aug, gamma, beta, nmf,
                 res_src, res_dst, res_w, K, threshold, activation,
                 alpha_drop, rate, group, interpret):
    B, D, Wb = s0.shape
    has_res = res_src.shape[0] > 0
    if has_res:
        src_idx = _res_flat_idx(res_src, D, Wb)
        dst_idx = _res_flat_idx(res_dst, D, Wb)
    cnt = jnp.maximum(jnp.sum(nmf), 1.0)
    nm1 = nmf                                              # [B, 1, Wb]
    ident = _ident_aff(D)
    ones3 = jnp.ones_like(s0)
    y1, y2 = s0, ones3
    a1, a2 = ident, ident
    ys, aggs, moms, affs, margs = [], [], [], [], []
    for k in range(K):
        if has_res:
            vals = _res_gather(y1, a1, src_idx, res_w)
            rT = _res_scatter(vals, dst_idx, B, D, Wb)
        else:
            rT = None
        y, agg, marg, msum = _bn_fwd_call(
            adj_pack, y1, y2, jnp.stack([a1, a2])[:, :, :, None],
            mc[k] if rate > 0.0 else None, rT, feats, w_aug, nmf,
            activation=activation, alpha_drop=alpha_drop, rate=rate,
            group=group, thr=float(threshold), interpret=interpret)
        mean = jnp.sum(msum[:, 0], axis=0) / cnt                      # [D]
        var = (jnp.sum(jnp.square(y.astype(jnp.float32)
                                  - mean[None, :, None]) * nm1, axis=(0, 2))
               / cnt)
        y2, a2 = y1, a1
        y1, a1 = y, _affine(gamma, beta, mean, var)
        ys.append(y)
        aggs.append(agg)
        moms.append(jnp.stack([mean, var]))
        affs.append(a1)
        margs.append(marg)
    margins = jnp.stack(margs)
    loop_any = jnp.any(margins > 0.5, axis=(1, 2, 3))                 # [K]
    iters = jnp.sum(jnp.cumprod(loop_any.astype(jnp.float32)))
    idx = jnp.maximum(iters.astype(jnp.int32) - 1, 0)
    y_sel = jax.lax.dynamic_index_in_dim(jnp.stack(ys), idx, 0,
                                         keepdims=False)
    mom_sel = jax.lax.dynamic_index_in_dim(jnp.stack(moms), idx, 0,
                                           keepdims=False)
    # centered normalize for the returned snapshot (the XLA body's exact
    # arithmetic, ops/mlp.py::_batchnorm)
    state3 = ((y_sel.astype(jnp.float32) - mom_sel[0][None, :, None])
              * jax.lax.rsqrt(mom_sel[1] + _BN_EPS)[None, :, None]
              * gamma.astype(jnp.float32)[None, :, None]
              + beta.astype(jnp.float32)[None, :, None])
    state3 = jnp.where(iters >= 1.0, state3.astype(s0.dtype), s0)
    out = (iters, state3, jnp.stack(moms))
    res = (adj_pack, s0, mc, feats, w_aug, gamma, nmf, iters, idx,
           tuple(ys), tuple(aggs), tuple(moms), tuple(affs),
           res_src, res_dst, res_w)
    return out, res


def _zero_ct(x):
    if isinstance(x, (tuple, list)):
        return type(x)(_zero_ct(v) for v in x)
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(x.dtype,
                                                              jnp.bool_):
        return np.zeros(x.shape, jax.dtypes.float0)
    return jnp.zeros_like(x)


def _bn_loop_bwd(K, threshold, activation, alpha_drop, rate, group,
                 interpret, res, g):
    (adj_pack, s0, mc, feats, w_aug, gamma, nmf, iters, idx,
     ys, aggs, moms, affs, res_src, res_dst, res_w) = res
    _, g_state, _ = g                      # iters / moms: non-differentiable
    B, D, Wb = s0.shape
    has_res = res_src.shape[0] > 0
    if has_res:
        src_idx = _res_flat_idx(res_src, D, Wb)
        dst_idx = _res_flat_idx(res_dst, D, Wb)
    cnt = jnp.maximum(jnp.sum(nmf), 1.0)
    gammaf = gamma.astype(jnp.float32)
    ident = _ident_aff(D)
    bgroup = pick_group(B, cap=24)
    g_state = g_state.astype(jnp.float32)
    active = iters >= 1.0

    # snapshot-injection reduction terms, one pass each (tiny vs per-iter
    # full-array elementwise glue — the kernels do the rest)
    Sg = jnp.sum(g_state, axis=(0, 2))                             # [D]
    rks = [jax.lax.rsqrt(moms[j][1] + _BN_EPS) for j in range(K)]
    Sgx = [jnp.sum(g_state * ((ys[j].astype(jnp.float32)
                               - moms[j][0][None, :, None])
                              * rks[j][None, :, None]), axis=(0, 2))
           for j in range(K)]

    ds = jnp.zeros((B, D, Wb), jnp.float32)
    zred = jnp.zeros((2, D), jnp.float32)
    red = zred
    dw = jnp.zeros_like(w_aug, dtype=jnp.float32)
    dgamma = jnp.zeros((D,), jnp.float32)
    dbeta = jnp.zeros((D,), jnp.float32)
    for k in reversed(range(K)):
        flag = ((jnp.int32(k) == idx) & active).astype(jnp.float32)
        s1 = red[0] + flag * Sg
        s2 = red[1] + flag * Sgx[k]
        dbeta = dbeta + s1
        dgamma = dgamma + s2
        r_k = rks[k]
        a = gammaf * r_k
        aff_p = ident if k == 0 else affs[k - 1]
        mean_p = jnp.zeros((D,), jnp.float32) if k == 0 else moms[k - 1][0]
        r_p = (jnp.ones((D,), jnp.float32) if k == 0 else rks[k - 1])
        bnv = jnp.zeros((16, D), jnp.float32)
        bnv = bnv.at[0].set(aff_p[0]).at[1].set(aff_p[1])
        bnv = bnv.at[2].set(moms[k][0]).at[3].set(r_k).at[4].set(a)
        bnv = bnv.at[5].set(a * s1 / cnt).at[6].set(a * s2 / cnt)
        bnv = bnv.at[7].set(mean_p).at[8].set(r_p)
        y_prev = s0 if k == 0 else ys[k - 1]
        ds_new, dw_k, dagg, red_part = _bn_bwd_call(
            adj_pack, y_prev, ys[k], aggs[k],
            mc[k] if rate > 0.0 else None, feats, w_aug,
            ds, g_state.astype(ys[k].dtype), bnv[:, :, None],
            flag.reshape(1, 1), nmf, activation=activation,
            alpha_drop=alpha_drop, rate=rate, group=bgroup,
            interpret=interpret)
        red = red_part
        if has_res and k > 0:
            # ds[src] += res_w · dagg[dst]; fold the residual contribution
            # into the NEXT step's reduction partials too (sum over its
            # scattered rows, and against x_hat at the source nodes)
            vals = (jnp.take(dagg.reshape(-1), dst_idx) * res_w[:, None])
            ds_new = ds_new + _res_scatter(vals, src_idx, B, D, Wb)
            xp_src = ((jnp.take(ys[k - 1].reshape(-1), src_idx)
                       .astype(jnp.float32) - mean_p[None, :])
                      * r_p[None, :])
            red = red + jnp.stack([jnp.sum(vals, axis=0),
                                   jnp.sum(vals * xp_src, axis=0)])
        elif has_res:
            vals = (jnp.take(dagg.reshape(-1), dst_idx) * res_w[:, None])
            ds_new = ds_new + _res_scatter(vals, src_idx, B, D, Wb)
        ds = ds_new
        dw = dw + dw_k
    # iters == 0: the primal returned s0 untouched — route g_state to s0
    ds = ds + jnp.where(active, 0.0, g_state)
    return (None, ds.astype(s0.dtype), _zero_ct(mc), _zero_ct(feats),
            dw.astype(w_aug.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(gamma.dtype), _zero_ct(nmf), _zero_ct(res_src),
            _zero_ct(res_dst), _zero_ct(res_w))


fused_bn_train_loop.defvjp(_bn_loop_fwd, _bn_loop_bwd)


def supports_fused_bn_train(state_spec) -> bool:
    """Static eligibility of the BN training loop: single dense layer,
    fusable activation, trailing BatchNormalization ON, dropout only at the
    input (pos 0) — pallas_fused.supports_fused_train's contract plus BN."""
    from gnn_tpu.ops.pallas_fused import supports_fused_train
    return (bool(state_spec.batch_normalization)
            and supports_fused_train(state_spec))


def supports_fused_bn2_train(state_spec) -> bool:
    """Static eligibility of the 2-LAYER BN training loop (round 4): two
    dense layers (the reference default trailing BN, MLP.py:13,63, with any
    hidden width — e.g. the hidden-150 accuracy recipe), fusable
    activations, dropout only at the input (pos 0)."""
    return (bool(state_spec.batch_normalization)
            and state_spec.num_layers == 2
            and all(a in FUSABLE_ACTIVATIONS for a in state_spec.activations)
            and all(p == 0 for p in state_spec.dropout_pos))


# --------------------------------------------------------------- bn2 kernels
def _bn2_fwd_kernel(refs, *, act0: str, act1: str, hp: bool, has_res: bool,
                    alpha_drop: bool, rate: float, group: int, block_w: int,
                    thr: float):
    """One 2-LAYER BN training iteration for a group of blocks: the bn1
    forward (_bn_fwd_kernel) with the hidden dense folded in —
    h0 = [Ws|Wa|Wf|b0] @ [s_drop; agg_drop; feats_drop; 1] (fT-folded),
    y0 = act0(h0), h1 = w1 @ y0 + b1, y = act1(h1) pre-BN. Reference:
    GNN.py:223-242 with MLP.py:29-64 hidden-layer state nets."""
    Wb = block_w
    refs = list(refs)
    adj_ref, y1_ref, y2_ref, aff_ref = refs[:4]
    refs = refs[4:]
    mc_ref = refs.pop(0) if rate > 0.0 else None
    r_ref = refs.pop(0) if has_res else None
    (f_ref, w0_ref, w1_ref, b1_ref, nm_ref, y_ref, agg_ref, marg_ref,
     msum_ref) = refs
    adj = adj_ref[:]
    aff = aff_ref[:].astype(jnp.float32)                  # [2, 2, D, 1]
    s = y1_ref[:].astype(jnp.float32) * aff[0, 0] + aff[0, 1]
    s_old = y2_ref[:].astype(jnp.float32) * aff[1, 0] + aff[1, 1]
    nm = nm_ref[:]                                        # [g, 1, Wb] f32
    diff = s - s_old
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=1))         # [g, Wb]
    norm = jnp.sqrt(jnp.sum(s_old * s_old, axis=1))
    marg_ref[:] = (jnp.where(dist > jnp.float32(thr) * norm, 1.0,
                             0.0)[:, None, :] * nm)

    agg = _agg_packed(s, adj, hp=hp)
    if has_res:
        agg = agg + r_ref[:].astype(jnp.float32)
    agg_ref[:] = agg.astype(agg_ref.dtype)
    x3 = _x3_aug(s, agg, f_ref[:].astype(jnp.float32),
                 mc_ref[:] if rate > 0.0 else None, rate=rate,
                 alpha_drop=alpha_drop, group=group, Wb=Wb)
    w0 = w0_ref[:].astype(jnp.float32)                    # [H1, 2D+F+1]
    H1 = w0.shape[0]
    w0p = _pack_w(w0, hp=hp, group=group, cdt=adj.dtype)
    h0 = _mm_packed(w0p, x3, H1, hp=hp, Wb=Wb, cdt=adj.dtype)
    y0 = _ACTS[act0](h0)                                  # [g, H1, Wb]
    h1 = _dense1_fm(w1_ref[:].astype(jnp.float32),
                    b1_ref[:].astype(jnp.float32), y0, hp=hp, group=group,
                    Wb=Wb, cdt=adj.dtype)                 # [g, D, Wb]
    y = _ACTS[act1](h1)
    y_ref[:] = y.astype(y_ref.dtype)
    msum_ref[0] = jnp.sum(y * nm, axis=(0, 2))[None, :]


def _bn2_fwd_call(adj_pack, y1, y2, aff, mc, rT, feats, w0, w1, b1, nmf, *,
                  act0, act1, alpha_drop, rate, group, thr, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y1.shape[1]
    F = feats.shape[1]
    H1 = w0.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_res = rT is not None
    kernel = functools.partial(_bn2_fwd_kernel, act0=act0, act1=act1, hp=hp,
                               has_res=has_res, alpha_drop=alpha_drop,
                               rate=rate, group=group, block_w=Wb, thr=thr)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 2, D, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, y1, y2, aff]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec((group, 2 * D + F, Wb), b3,
                                     memory_space=pltpu.VMEM))
        operands.append(mc)
    if has_res:
        in_specs.append(pl.BlockSpec((group, D, Wb), b3,
                                     memory_space=pltpu.VMEM))
        operands.append(rT)
    in_specs += [
        pl.BlockSpec((group, F, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((H1, 2 * D + F + 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands += [feats, w0, w1, b1.reshape(D, 1), nmf]
    return pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), y1.dtype),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, D), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def _bn2_bwd_kernel(refs, *, act0: str, act1: str, hp: bool,
                    alpha_drop: bool, rate: float, group: int,
                    block_w: int):
    """ONE reverse 2-layer training iteration with the BatchNorm backward
    folded in (the bn1 backward, _bn_bwd_kernel, with the hidden dense's
    chain): recompute h0/y0/h1 from the saved pre-dropout aggregation + raw
    feats, gy from the [D]-sized BN coefficients, dh1 = gy·act1'(h1),
    dw1/db1 partials, dy0 = w1ᵀ@dh1, dh0 = dy0·act0'(h0), the bias-augmented
    dw0 partial (dWs|dWa|dWf|db0 in one reduction), then the dx -> ds/dagg
    chain and the next reverse step's reduction partials. bnv rows as in
    _bn_bwd_kernel."""
    Wb = block_w
    refs = list(refs)
    adj_ref, yp_ref, yk_ref, agg_ref = refs[:4]
    refs = refs[4:]
    mc_ref = refs.pop(0) if rate > 0.0 else None
    (f_ref, w0_ref, w1_ref, b1_ref, ds_ref_in, gsel_ref, bnv_ref, flag_ref,
     nm_ref, ds_ref, dw0_ref, dw1_ref, db1_ref, dagg_ref, red_ref) = refs
    adj = adj_ref[:]
    w0 = w0_ref[:].astype(jnp.float32)                    # [H1, 2D+F+1]
    w1 = w1_ref[:].astype(jnp.float32)                    # [D, H1]
    b1 = b1_ref[:].astype(jnp.float32)                    # [D, 1]
    H1 = w0.shape[0]
    D = yp_ref.shape[1]
    bnv = bnv_ref[:].astype(jnp.float32)                  # [16, D, 1]
    nm = nm_ref[:]                                        # [g, 1, Wb]
    flag = flag_ref[0, 0]
    s_prev = yp_ref[:].astype(jnp.float32) * bnv[0] + bnv[1]
    gS = ds_ref_in[:].astype(jnp.float32) + flag * gsel_ref[:].astype(
        jnp.float32)
    xk = (yk_ref[:].astype(jnp.float32) - bnv[2]) * bnv[3]
    gy = bnv[4] * gS - nm * (bnv[5] + xk * bnv[6])
    _, dmask = _make_drop(alpha_drop, rate)
    x3 = _x3_aug(s_prev, agg_ref[:].astype(jnp.float32),
                 f_ref[:].astype(jnp.float32),
                 mc_ref[:] if rate > 0.0 else None, rate=rate,
                 alpha_drop=alpha_drop, group=group, Wb=Wb)
    w0p = _pack_w(w0, hp=hp, group=group, cdt=adj.dtype)
    h0 = _mm_packed(w0p, x3, H1, hp=hp, Wb=Wb, cdt=adj.dtype)
    y0 = _ACTS[act0](h0)                                  # [g, H1, Wb]
    h1 = _dense1_fm(w1, b1, y0, hp=hp, group=group, Wb=Wb, cdt=adj.dtype)
    dh1 = gy * _act_grad(act1, h1)                        # [g, D, Wb]
    db1_ref[0] = jnp.sum(dh1, axis=(0, 2))[None, :]
    dw1_ref[0] = jnp.sum(_BDT_HI(dh1, y0), axis=0).astype(dw1_ref.dtype)
    w1T_b = _pack_w(w1.T, hp=hp, group=group, cdt=adj.dtype)
    dy0 = _mm_packed(w1T_b, dh1, H1, hp=hp, Wb=Wb, cdt=adj.dtype)
    dh0 = dy0 * _act_grad(act0, h0)                       # [g, H1, Wb]
    dw0_ref[0] = jnp.sum(_BDT_HI(dh0, x3), axis=0).astype(dw0_ref.dtype)
    w0T_b = _pack_w(w0[:, :2 * D].T, hp=hp, group=group, cdt=adj.dtype)
    dx2 = _mm_packed(w0T_b, dh0, 2 * D, hp=hp, Wb=Wb, cdt=adj.dtype)
    if rate > 0.0:
        dm = dmask(mc_ref[:])                             # [g, 2D+F, Wb]
        dagg = dx2[:, D:] * dm[:, D:2 * D]
        ds_out = dx2[:, :D] * dm[:, :D] + _contract_dst(dagg, adj, hp=hp)
    else:
        dagg = dx2[:, D:]
        ds_out = dx2[:, :D] + _contract_dst(dagg, adj, hp=hp)
    dagg_ref[:] = dagg.astype(dagg_ref.dtype)
    ds_ref[:] = ds_out.astype(ds_ref.dtype)
    xp_hat = (yp_ref[:].astype(jnp.float32) - bnv[7]) * bnv[8]
    red_ref[0] = jnp.stack([jnp.sum(ds_out, axis=(0, 2)),
                            jnp.sum(ds_out * xp_hat, axis=(0, 2))])


def _bn2_bwd_call(adj_pack, y_prev, y_k, agg, mc, feats, w0, w1, b1, ds_in,
                  gsel, bnv, flag, nmf, *, act0: str, act1: str,
                  alpha_drop: bool, rate: float, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y_prev.shape[1]
    F = feats.shape[1]
    H1 = w0.shape[0]
    C = w0.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_bn2_bwd_kernel, act0=act0, act1=act1, hp=hp,
                               alpha_drop=alpha_drop, rate=rate, group=group,
                               block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    dspec = pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        dspec, dspec, dspec,
    ]
    operands = [adj_pack, y_prev, y_k, agg]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec((group, 2 * D + F, Wb), b3,
                                     memory_space=pltpu.VMEM))
        operands.append(mc)
    in_specs += [
        pl.BlockSpec((group, F, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((H1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        dspec, dspec,
        pl.BlockSpec((16, D, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands += [feats, w0, w1, b1.reshape(D, 1), ds_in, gsel, bnv, flag,
                 nmf]
    (ds, dw0_part, dw1_part, db1_part, dagg, red_part) = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            dspec,
            pl.BlockSpec((1, H1, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, H1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            dspec,
            pl.BlockSpec((1, 2, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, H1, C), jnp.float32),
            jax.ShapeDtypeStruct((G, D, H1), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, 2, D), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return (ds, jnp.sum(dw0_part, axis=0), jnp.sum(dw1_part, axis=0),
            jnp.sum(db1_part, axis=0)[0], dagg, jnp.sum(red_part, axis=0))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(13, 14, 15, 16, 17, 18, 19, 20))
def fused_bn2_train_loop(adj_pack, s0, mc, feats, w0, w1, b1, gamma, beta,
                         nmf, res_src, res_dst, res_w, K: int,
                         threshold: float, act0: str = "tanh",
                         act1: str = "tanh", alpha_drop: bool = True,
                         rate: float = 0.0, group: int = 32,
                         interpret: Optional[bool] = None):
    """The K-iteration 2-LAYER BN TRAINING propagation loop — the bn1 loop
    (fused_bn_train_loop) with a hidden dense layer per iteration
    (the reference's default trailing-BN config at ANY hidden width,
    MLP.py:13,29-64; e.g. the hidden-150 accuracy recipe with BN on).

    :param mc / feats: as fused_bn_train_loop (combined int8 keep-mask,
        loop-invariant raw fold features).
    :param w0: [H1, 2D+F+1] bias-augmented dense0 [Ws | Wa | Wf | b0];
        w1: [D, H1]; b1: [D].
    Other params / returns as fused_bn_train_loop."""
    out, _ = _bn2_loop_fwd(adj_pack, s0, mc, feats, w0, w1, b1, gamma,
                           beta, nmf, res_src, res_dst, res_w, K, threshold,
                           act0, act1, alpha_drop, rate, group, interpret)
    return out


def _bn2_loop_fwd(adj_pack, s0, mc, feats, w0, w1, b1, gamma, beta, nmf,
                  res_src, res_dst, res_w, K, threshold, act0, act1,
                  alpha_drop, rate, group, interpret):
    B, D, Wb = s0.shape
    has_res = res_src.shape[0] > 0
    if has_res:
        src_idx = _res_flat_idx(res_src, D, Wb)
        dst_idx = _res_flat_idx(res_dst, D, Wb)
    cnt = jnp.maximum(jnp.sum(nmf), 1.0)
    nm1 = nmf
    ident = _ident_aff(D)
    ones3 = jnp.ones_like(s0)
    y1, y2 = s0, ones3
    a1, a2 = ident, ident
    ys, aggs, moms, affs, margs = [], [], [], [], []
    for k in range(K):
        if has_res:
            vals = _res_gather(y1, a1, src_idx, res_w)
            rT = _res_scatter(vals, dst_idx, B, D, Wb)
        else:
            rT = None
        y, agg, marg, msum = _bn2_fwd_call(
            adj_pack, y1, y2, jnp.stack([a1, a2])[:, :, :, None],
            mc[k] if rate > 0.0 else None, rT, feats, w0, w1, b1, nmf,
            act0=act0, act1=act1, alpha_drop=alpha_drop, rate=rate,
            group=group, thr=float(threshold), interpret=interpret)
        mean = jnp.sum(msum[:, 0], axis=0) / cnt                      # [D]
        var = (jnp.sum(jnp.square(y.astype(jnp.float32)
                                  - mean[None, :, None]) * nm1, axis=(0, 2))
               / cnt)
        y2, a2 = y1, a1
        y1, a1 = y, _affine(gamma, beta, mean, var)
        ys.append(y)
        aggs.append(agg)
        moms.append(jnp.stack([mean, var]))
        affs.append(a1)
        margs.append(marg)
    margins = jnp.stack(margs)
    loop_any = jnp.any(margins > 0.5, axis=(1, 2, 3))                 # [K]
    iters = jnp.sum(jnp.cumprod(loop_any.astype(jnp.float32)))
    idx = jnp.maximum(iters.astype(jnp.int32) - 1, 0)
    y_sel = jax.lax.dynamic_index_in_dim(jnp.stack(ys), idx, 0,
                                         keepdims=False)
    mom_sel = jax.lax.dynamic_index_in_dim(jnp.stack(moms), idx, 0,
                                           keepdims=False)
    state3 = ((y_sel.astype(jnp.float32) - mom_sel[0][None, :, None])
              * jax.lax.rsqrt(mom_sel[1] + _BN_EPS)[None, :, None]
              * gamma.astype(jnp.float32)[None, :, None]
              + beta.astype(jnp.float32)[None, :, None])
    state3 = jnp.where(iters >= 1.0, state3.astype(s0.dtype), s0)
    out = (iters, state3, jnp.stack(moms))
    res = (adj_pack, s0, mc, feats, w0, w1, b1, gamma, nmf, iters, idx,
           tuple(ys), tuple(aggs), tuple(moms), tuple(affs),
           res_src, res_dst, res_w)
    return out, res


def _bn2_loop_bwd(K, threshold, act0, act1, alpha_drop, rate, group,
                  interpret, res, g):
    (adj_pack, s0, mc, feats, w0, w1, b1, gamma, nmf, iters, idx,
     ys, aggs, moms, affs, res_src, res_dst, res_w) = res
    _, g_state, _ = g                      # iters / moms: non-differentiable
    B, D, Wb = s0.shape
    has_res = res_src.shape[0] > 0
    if has_res:
        src_idx = _res_flat_idx(res_src, D, Wb)
        dst_idx = _res_flat_idx(res_dst, D, Wb)
    cnt = jnp.maximum(jnp.sum(nmf), 1.0)
    gammaf = gamma.astype(jnp.float32)
    ident = _ident_aff(D)
    bgroup = pick_group(B, cap=16)
    g_state = g_state.astype(jnp.float32)
    active = iters >= 1.0

    Sg = jnp.sum(g_state, axis=(0, 2))                             # [D]
    rks = [jax.lax.rsqrt(moms[j][1] + _BN_EPS) for j in range(K)]
    Sgx = [jnp.sum(g_state * ((ys[j].astype(jnp.float32)
                               - moms[j][0][None, :, None])
                              * rks[j][None, :, None]), axis=(0, 2))
           for j in range(K)]

    ds = jnp.zeros((B, D, Wb), jnp.float32)
    zred = jnp.zeros((2, D), jnp.float32)
    red = zred
    dw0 = jnp.zeros_like(w0, dtype=jnp.float32)
    dw1 = jnp.zeros_like(w1, dtype=jnp.float32)
    db1 = jnp.zeros((D,), jnp.float32)
    dgamma = jnp.zeros((D,), jnp.float32)
    dbeta = jnp.zeros((D,), jnp.float32)
    for k in reversed(range(K)):
        flag = ((jnp.int32(k) == idx) & active).astype(jnp.float32)
        s1 = red[0] + flag * Sg
        s2 = red[1] + flag * Sgx[k]
        dbeta = dbeta + s1
        dgamma = dgamma + s2
        r_k = rks[k]
        a = gammaf * r_k
        aff_p = ident if k == 0 else affs[k - 1]
        mean_p = jnp.zeros((D,), jnp.float32) if k == 0 else moms[k - 1][0]
        r_p = (jnp.ones((D,), jnp.float32) if k == 0 else rks[k - 1])
        bnv = jnp.zeros((16, D), jnp.float32)
        bnv = bnv.at[0].set(aff_p[0]).at[1].set(aff_p[1])
        bnv = bnv.at[2].set(moms[k][0]).at[3].set(r_k).at[4].set(a)
        bnv = bnv.at[5].set(a * s1 / cnt).at[6].set(a * s2 / cnt)
        bnv = bnv.at[7].set(mean_p).at[8].set(r_p)
        y_prev = s0 if k == 0 else ys[k - 1]
        (ds_new, dw0_k, dw1_k, db1_k, dagg, red_part) = _bn2_bwd_call(
            adj_pack, y_prev, ys[k], aggs[k],
            mc[k] if rate > 0.0 else None, feats, w0, w1, b1,
            ds, g_state.astype(ys[k].dtype), bnv[:, :, None],
            flag.reshape(1, 1), nmf, act0=act0, act1=act1,
            alpha_drop=alpha_drop, rate=rate, group=bgroup,
            interpret=interpret)
        red = red_part
        if has_res and k > 0:
            vals = (jnp.take(dagg.reshape(-1), dst_idx) * res_w[:, None])
            ds_new = ds_new + _res_scatter(vals, src_idx, B, D, Wb)
            xp_src = ((jnp.take(ys[k - 1].reshape(-1), src_idx)
                       .astype(jnp.float32) - mean_p[None, :])
                      * r_p[None, :])
            red = red + jnp.stack([jnp.sum(vals, axis=0),
                                   jnp.sum(vals * xp_src, axis=0)])
        elif has_res:
            vals = (jnp.take(dagg.reshape(-1), dst_idx) * res_w[:, None])
            ds_new = ds_new + _res_scatter(vals, src_idx, B, D, Wb)
        ds = ds_new
        dw0 = dw0 + dw0_k
        dw1 = dw1 + dw1_k
        db1 = db1 + db1_k
    ds = ds + jnp.where(active, 0.0, g_state)
    return (None, ds.astype(s0.dtype), _zero_ct(mc), _zero_ct(feats),
            dw0.astype(w0.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype),
            _zero_ct(nmf), _zero_ct(res_src), _zero_ct(res_dst),
            _zero_ct(res_w))


fused_bn2_train_loop.defvjp(_bn2_loop_fwd, _bn2_loop_bwd)


def bn_train_propagate(spec, params_state, bn_state, gb, state0, agg_arcs,
                       step_rngs, nm, const_feats=None):
    """Orchestrate the BN training kernel path for models/core.py::propagate:
    precompute the bit-identical dropout mask stream (ONE combined int8
    array in the kernels' x3 row order), run the custom-VJP loop, and apply
    the active-gated moving-statistics update (GNN_BaseClass/GNN.py
    semantics via the XLA body's carry gating).

    Returns (iters, state [Np, D] node-major, new_bn_state)."""
    import os as _os
    Bb, Wb, _ = gb.adj_blocks.shape
    Np = gb.n_node_pad
    K = spec.max_iteration
    D = state0.shape[1]
    in_dim = spec.state_spec.input_dim
    w1T = params_state["dense_0"]["w"].T                   # [H, in_dim]
    b1 = params_state["dense_0"]["b"]
    # column layout (models/core.py): state_dim == 0 -> [state, Σstate,
    # Σarcs]; state_dim > 0 -> [state, labels, Σstate, Σlabels, Σarcs]
    # (labels + constant aggregations fold into the feature rows)
    sd_ = spec.state_dim
    nl_ = gb.nodes.shape[1]
    if sd_ > 0:
        w_cat = jnp.concatenate([w1T[:, :sd_],
                                 w1T[:, sd_ + nl_:2 * sd_ + nl_]], axis=1)
        Wf = jnp.concatenate([w1T[:, sd_:sd_ + nl_],
                              w1T[:, 2 * sd_ + nl_:]], axis=1)
        fold_feats = jnp.concatenate([gb.nodes, const_feats], axis=1)
        state_cols = lambda kp: kp[..., :sd_]     # noqa: E731
        fold_cols = lambda kp: jnp.concatenate(   # noqa: E731
            [kp[..., sd_:sd_ + nl_], kp[..., 2 * sd_ + nl_:]], axis=-1)
        agg_cols = lambda kp: kp[..., sd_ + nl_:2 * sd_ + nl_]  # noqa: E731
    else:
        w_cat = w1T[:, :2 * D]
        Wf = w1T[:, 2 * D:]
        fold_feats = agg_arcs
        state_cols = lambda kp: kp[..., :D]       # noqa: E731
        fold_cols = lambda kp: kp[..., 2 * D:]    # noqa: E731
        agg_cols = lambda kp: kp[..., D:2 * D]    # noqa: E731
    # bias-augmented kernel weight [Ws | Wa | Wf | b]: the backward's dw
    # cotangent flows back through this concatenate into the param pytree
    w_aug = jnp.concatenate([w_cat, Wf, b1[:, None]], axis=1)
    gamma = params_state["bn"]["gamma"]
    beta = params_state["bn"]["beta"]
    act = spec.state_spec.activations[0]
    dropmap = dict(zip(spec.state_spec.dropout_pos,
                       spec.state_spec.dropout_rate))
    rate = float(dropmap.get(0, 0.0))
    alpha = spec.state_spec.alphadropout
    to3 = functools.partial(to_blocks_fm, block_w=Wb)

    adj_pack = (gb.adj_packT if gb.adj_packT is not None
                else pack_adjacency(jnp.swapaxes(gb.adj_blocks, 1, 2)))
    nm3 = nm.astype(jnp.float32).reshape(Bb, 1, Wb)
    feats3 = to3(fold_feats.astype(state0.dtype))          # [B, F, Wb]
    if rate > 0.0:
        # bit-identical mask stream to the XLA body (mlp_apply: one split +
        # one bernoulli over the full input row per step); static unroll, not
        # vmap — the rbg PRNG is not vmap-invariant (see models/core.py).
        # Columns permuted to the kernels' x3 row order [state | agg | fold]
        # BEFORE the blocked transpose, so ONE [K, B, 2D+F, Wb] int8 array
        # carries all three mask streams (2D+F rows ride a single int8
        # (32, 128) tile at the reference shapes — half the bytes of the two
        # separate [K, B, D, Wb] arrays they replace).
        # a TUPLE of K [B, 2D+F, Wb] arrays, each blocked independently — a
        # stacked [K, ...] array forced XLA to materialize a transposed
        # relayout copy of the whole stream every step (0.16 ms on the
        # flagship, round-5 xplane attribution)
        mc_list = []
        for i in range(K):
            keep = jax.random.bernoulli(jax.random.split(step_rngs[i])[1],
                                        1.0 - rate, (Np, in_dim))
            kc = jnp.concatenate([state_cols(keep), agg_cols(keep),
                                  fold_cols(keep)], axis=-1)
            mc_list.append(to3(kc).astype(jnp.int8))
        mc = tuple(mc_list)
    else:
        # dummies: never passed to the kernels when rate == 0
        # (the fwd/bwd rules omit the mask operand entirely)
        mc = tuple(jnp.ones((1, 1, 1), jnp.float32) for _ in range(K))

    if gb.res_src is not None and gb.res_src.shape[0]:
        res_src, res_dst, res_w = gb.res_src, gb.res_dst, gb.res_w
    else:
        res_src = jnp.zeros((0,), jnp.int32)
        res_dst = jnp.zeros((0,), jnp.int32)
        res_w = jnp.zeros((0,), jnp.float32)

    s03 = to3(state0)
    interpret = True if _os.environ.get("GNN_TPU_INTERPRET") else None
    if spec.state_spec.num_layers == 2:
        # hidden-layer state net (reference MLP.py:29-64 with trailing BN):
        # dense1 runs inside the kernels; smaller group caps — the hidden
        # activations ([g, H1, Wb]) multiply the per-group VMEM footprint
        w1_2 = params_state["dense_1"]["w"].T              # [D, H1]
        b1_2 = params_state["dense_1"]["b"]
        act1 = spec.state_spec.activations[1]
        k, state3, moms = fused_bn2_train_loop(
            adj_pack, s03, mc, feats3, w_aug, w1_2, b1_2, gamma, beta, nm3,
            res_src, res_dst, res_w, K, float(spec.threshold), act, act1,
            alpha, rate, pick_group(Bb, cap=16), interpret)
    else:
        k, state3, moms = fused_bn_train_loop(
            adj_pack, s03, mc, feats3, w_aug, gamma, beta, nm3,
            res_src, res_dst, res_w, K, float(spec.threshold), act, alpha,
            rate, pick_group(Bb, cap=32), interpret)

    # active-gated moving statistics (XLA body: bn carry updates only while
    # active — models/core.py _tree_where(active, bn_new, bn))
    moms = jax.lax.stop_gradient(moms)
    mean_mv, var_mv = bn_state["mean"], bn_state["var"]
    for j in range(K):
        on = jnp.float32(j) < k
        mean_mv = jnp.where(on,
                            mean_mv * _BN_MOMENTUM
                            + moms[j, 0] * (1.0 - _BN_MOMENTUM), mean_mv)
        var_mv = jnp.where(on,
                           var_mv * _BN_MOMENTUM
                           + moms[j, 1] * (1.0 - _BN_MOMENTUM), var_mv)
    new_bn = {"mean": mean_mv.astype(bn_state["mean"].dtype),
              "var": var_mv.astype(bn_state["var"].dtype)}
    return k, from_blocks_fm(state3), new_bn
