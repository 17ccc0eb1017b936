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
from gnn_tpu.ops.pallas_fused import (_BD, _BDT_HI, _act_grad, _ACTS,
                                      _agg_packed, _contract_dst,
                                      _dense1_fm, _drop_coeffs, _make_drop,
                                      _mm_packed, _split16, from_blocks_fm,
                                      FUSABLE_ACTIVATIONS, pack_adjacency,
                                      pick_group, to_blocks_fm)


def _bn_fwd_kernel(refs, *, activation: str, hp: bool, has_res: bool,
                   alpha_drop: bool, rate: float, group: int, block_w: int,
                   thr: float):
    """One BN training iteration for a group of blocks. Consumes the two
    previous pre-BN activations + their BN affines, normalizes in VMEM,
    computes convergence margins, dropout, aggregation, dense + activation,
    and the per-group moment partial sums — everything HBM-facing stays in
    the kernel's feature-major layout."""
    Wb = block_w
    if has_res:
        (adj_ref, y1_ref, y2_ref, aff_ref, ms_ref, ma_ref, r_ref, fT_ref,
         w_ref, nm_ref, y_ref, agg_ref, marg_ref, msum_ref) = refs
    else:
        (adj_ref, y1_ref, y2_ref, aff_ref, ms_ref, ma_ref, fT_ref,
         w_ref, nm_ref, y_ref, agg_ref, marg_ref, msum_ref) = refs
        r_ref = None
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
    drop, _ = _make_drop(alpha_drop, rate)
    d_agg = drop(agg, ma_ref[:]) if rate > 0.0 else agg
    sd = drop(s, ms_ref[:]) if rate > 0.0 else s
    x2 = jnp.concatenate([sd, d_agg], axis=1)             # [g, 2D, Wb] f32
    w = w_ref[:].astype(jnp.float32)                      # [H, 2D]
    H = w.shape[0]
    if hp:
        w_hi, w_lo = _split16(w)
        w4 = jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                              (group, 2 * H, x2.shape[1]))
        x_hi, x_lo = _split16(x2)
        xp = jnp.concatenate([x_hi, x_lo], axis=2)
        u4 = _BD(w4, xp)
        h = ((u4[:, :H, :Wb] + u4[:, :H, Wb:])
             + (u4[:, H:, :Wb] + u4[:, H:, Wb:]))
    else:
        w_b = jnp.broadcast_to(w.astype(adj.dtype)[None],
                               (group,) + w.shape)
        h = _BD(w_b, x2.astype(adj.dtype))
    h = h + fT_ref[:].astype(jnp.float32)
    y = _ACTS[activation](h)
    y_ref[:] = y.astype(y_ref.dtype)
    # masked partial sum of y over this group (mean; the centered variance
    # pass runs in XLA so the two-pass _batchnorm arithmetic is preserved)
    msum_ref[0] = jnp.sum(y * nm, axis=(0, 2))[None, :]


def _bn_fwd_call(adj_pack, y1, y2, aff, ms, ma, rT, fT, w_cat, nmf, *,
                 activation, alpha_drop, rate, group, thr, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y1.shape[1]
    H = w_cat.shape[0]
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
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 2 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, y1, y2, aff, ms, ma, fT, w_cat, nmf]
    if has_res:
        in_specs.insert(6, pl.BlockSpec((group, D, Wb), b3,
                                        memory_space=pltpu.VMEM))
        operands.insert(6, rT)
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
    pre-dropout aggregation, dh = gy·act'(h), dw partial, the dagg -> ds
    chain, and the NEXT reverse step's reduction partials
    (sum ds_out, sum ds_out·x_hat_prev) — so the per-iteration XLA glue
    stays [D]-sized and never forces relayout copies of full arrays.

    bnv rows: 0 aff_prev scale, 1 aff_prev shift, 2 mean_k, 3 r_k,
    4 a = gamma·r_k, 5 b2 = a·s1/C, 6 c2 = a·s2/C, 7 mean_prev, 8 r_prev."""
    Wb = block_w
    (adj_ref, yp_ref, yk_ref, agg_ref, ms_ref, ma_ref, fT_ref, w_ref,
     ds_ref_in, gsel_ref, bnv_ref, flag_ref, nm_ref,
     ds_ref, dw_ref, dfT_ref, dagg_ref, red_ref) = refs
    adj = adj_ref[:]
    w = w_ref[:].astype(jnp.float32)                      # [H, 2D]
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
    drop, dmask = _make_drop(alpha_drop, rate)
    x2 = jnp.concatenate([drop(s_prev, ms_ref[:]) if rate > 0.0 else s_prev,
                          drop(agg_ref[:].astype(jnp.float32), ma_ref[:])
                          if rate > 0.0 else agg_ref[:].astype(jnp.float32)],
                         axis=1)                           # [g, 2D, Wb] f32
    if hp:
        w_hi, w_lo = _split16(w)
        w4 = jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                              (group, 2 * H, 2 * D))
        x_hi, x_lo = _split16(x2)
        xp = jnp.concatenate([x_hi, x_lo], axis=2)
        u4 = _BD(w4, xp)
        h = ((u4[:, :H, :Wb] + u4[:, :H, Wb:])
             + (u4[:, H:, :Wb] + u4[:, H:, Wb:]))
        wT_hi, wT_lo = _split16(w.T)
        wT_b = jnp.broadcast_to(jnp.concatenate([wT_hi, wT_lo], axis=0)[None],
                                (group, 4 * D, H))
    else:
        w_b = jnp.broadcast_to(w.astype(adj.dtype)[None], (group, H, 2 * D))
        h = _BD(w_b, x2.astype(adj.dtype))
        wT_b = jnp.broadcast_to(w.T.astype(adj.dtype)[None],
                                (group, 2 * D, H))
    h = h + fT_ref[:].astype(jnp.float32)
    dh = gy * _act_grad(activation, h)
    dfT_ref[:] = dh.astype(dfT_ref.dtype)
    dw_ref[0] = jnp.sum(_BDT_HI(dh, x2), axis=0).astype(dw_ref.dtype)
    dx2 = _mm_packed(wT_b, dh, 2 * D, hp=hp, Wb=Wb, cdt=adj.dtype)
    dagg = dx2[:, D:] * dmask(ma_ref[:])
    dagg_ref[:] = dagg.astype(dagg_ref.dtype)
    ds_out = dx2[:, :D] * dmask(ms_ref[:]) + _contract_dst(dagg, adj, hp=hp)
    ds_ref[:] = ds_out.astype(ds_ref.dtype)
    xp_hat = (yp_ref[:].astype(jnp.float32) - bnv[7]) * bnv[8]
    red_ref[0] = jnp.stack([jnp.sum(ds_out, axis=(0, 2)),
                            jnp.sum(ds_out * xp_hat, axis=(0, 2))])


def _bn_bwd_call(adj_pack, y_prev, y_k, agg, ms, ma, fT, w_cat, ds_in, gsel,
                 bnv, flag, nmf, *, activation: str, alpha_drop: bool,
                 rate: float, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y_prev.shape[1]
    H = w_cat.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_bn_bwd_kernel, activation=activation, hp=hp,
                               alpha_drop=alpha_drop, rate=rate, group=group,
                               block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    dspec = pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM)
    ds, dw_part, dfT, dagg, red_part = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
            dspec, dspec, dspec, dspec, dspec,
            pl.BlockSpec((group, H, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            dspec, dspec,
            pl.BlockSpec((16, D, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            dspec,
            pl.BlockSpec((1, H, 2 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, H, Wb), b3, memory_space=pltpu.VMEM),
            dspec,
            pl.BlockSpec((1, 2, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, H, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Wb), fT.dtype),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, 2, D), jnp.float32),
        ],
        interpret=interpret,
    )(adj_pack, y_prev, y_k, agg, ms, ma, fT, w_cat, ds_in, gsel, bnv, flag,
      nmf)
    return (ds, jnp.sum(dw_part, axis=0), dfT, dagg,
            jnp.sum(red_part, axis=0))


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
                   nondiff_argnums=(12, 13, 14, 15, 16, 17, 18))
def fused_bn_train_loop(adj_pack, s0, ms, ma, fT, w_cat, gamma, beta, nmf,
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
    :param ms / ma: [K, B, D, Wb] keep-masks (state / aggregated input
        slices; any float dtype), or (K, 1, 1, 1) dummies when rate == 0.
    :param fT: [K, B, H, Wb] per-iteration feature term
        Wf @ dropout_k(agg_arc_labels) + b.
    :param w_cat: [H, 2D] dense columns [Ws | Wa].
    :param gamma / beta: [D] BatchNorm scale / shift.
    :param nmf: [B, Wb] float node mask (moments + convergence flags).
    :param res_src / res_dst / res_w: cross-block residual edges (empty
        arrays when the batch has none).
    Returns (iters, state3 [B, D, Wb] — the realised-count snapshot with the
    reference's global early stop, moms [K, 2, D] per-iteration batch
    moments for the moving-statistics update; moms carries NO gradient)."""
    out, _ = _bn_loop_fwd(adj_pack, s0, ms, ma, fT, w_cat, gamma, beta, nmf,
                          res_src, res_dst, res_w, K, threshold, activation,
                          alpha_drop, rate, group, interpret)
    return out


def _bn_loop_fwd(adj_pack, s0, ms, ma, fT, w_cat, gamma, beta, nmf,
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
    dummy3 = (jnp.ones((B, D, Wb), ms.dtype) if rate <= 0.0 else None)
    for k in range(K):
        if has_res:
            vals = _res_gather(y1, a1, src_idx, res_w)
            rT = _res_scatter(vals, dst_idx, B, D, Wb)
        else:
            rT = None
        ms_k = ms[k] if rate > 0.0 else dummy3
        ma_k = ma[k] if rate > 0.0 else dummy3
        y, agg, marg, msum = _bn_fwd_call(
            adj_pack, y1, y2, jnp.stack([a1, a2])[:, :, :, None],
            ms_k, ma_k, rT, fT[k], w_cat, nmf, activation=activation,
            alpha_drop=alpha_drop, rate=rate, group=group,
            thr=float(threshold), interpret=interpret)
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
    res = (adj_pack, s0, ms, ma, fT, w_cat, gamma, nmf, iters, idx,
           tuple(ys), tuple(aggs), tuple(moms), tuple(affs),
           res_src, res_dst, res_w)
    return out, res


def _zero_ct(x):
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(x.dtype,
                                                              jnp.bool_):
        return np.zeros(x.shape, jax.dtypes.float0)
    return jnp.zeros_like(x)


def _bn_loop_bwd(K, threshold, activation, alpha_drop, rate, group,
                 interpret, res, g):
    (adj_pack, s0, ms, ma, fT, w_cat, gamma, nmf, iters, idx,
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
    dw = jnp.zeros_like(w_cat, dtype=jnp.float32)
    dgamma = jnp.zeros((D,), jnp.float32)
    dbeta = jnp.zeros((D,), jnp.float32)
    dfT = [None] * K
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
        ms_k = (ms[k] if rate > 0.0
                else jnp.ones((B, D, Wb), jnp.float32))
        ma_k = ma[k] if rate > 0.0 else ms_k
        ds_new, dw_k, dfT_k, dagg, red_part = _bn_bwd_call(
            adj_pack, y_prev, ys[k], aggs[k], ms_k, ma_k, fT[k], w_cat,
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
        dfT[k] = dfT_k
    # iters == 0: the primal returned s0 untouched — route g_state to s0
    ds = ds + jnp.where(active, 0.0, g_state)
    return (None, ds.astype(s0.dtype), _zero_ct(ms), _zero_ct(ma),
            jnp.stack(dfT).astype(fT.dtype), dw.astype(w_cat.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype),
            _zero_ct(nmf), _zero_ct(res_src), _zero_ct(res_dst),
            _zero_ct(res_w))


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
    h0 = [Ws|Wa] @ [s_drop; agg_drop] + fT (fT carries Wf@feats + b0),
    y0 = act0(h0), h1 = w1 @ y0 + b1, y = act1(h1) pre-BN. Reference:
    GNN.py:223-242 with MLP.py:29-64 hidden-layer state nets."""
    Wb = block_w
    if has_res:
        (adj_ref, y1_ref, y2_ref, aff_ref, ms_ref, ma_ref, r_ref, fT_ref,
         w0_ref, w1_ref, b1_ref, nm_ref, y_ref, agg_ref, marg_ref,
         msum_ref) = refs
    else:
        (adj_ref, y1_ref, y2_ref, aff_ref, ms_ref, ma_ref, fT_ref,
         w0_ref, w1_ref, b1_ref, nm_ref, y_ref, agg_ref, marg_ref,
         msum_ref) = refs
        r_ref = None
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
    drop, _ = _make_drop(alpha_drop, rate)
    d_agg = drop(agg, ma_ref[:]) if rate > 0.0 else agg
    sd = drop(s, ms_ref[:]) if rate > 0.0 else s
    x2 = jnp.concatenate([sd, d_agg], axis=1)             # [g, 2D, Wb] f32
    w0 = w0_ref[:].astype(jnp.float32)                    # [H1, 2D]
    H1 = w0.shape[0]
    if hp:
        w0_hi, w0_lo = _split16(w0)
        w04 = jnp.broadcast_to(
            jnp.concatenate([w0_hi, w0_lo], axis=0)[None],
            (group, 2 * H1, x2.shape[1]))
        h0 = _mm_packed(w04, x2, H1, hp=True, Wb=Wb)
    else:
        w0_b = jnp.broadcast_to(w0.astype(adj.dtype)[None],
                                (group,) + w0.shape)
        h0 = _mm_packed(w0_b, x2, H1, hp=False, Wb=Wb, cdt=adj.dtype)
    h0 = h0 + fT_ref[:].astype(jnp.float32)
    y0 = _ACTS[act0](h0)                                  # [g, H1, Wb]
    h1 = _dense1_fm(w1_ref[:].astype(jnp.float32),
                    b1_ref[:].astype(jnp.float32), y0, hp=hp, group=group,
                    Wb=Wb, cdt=adj.dtype)                 # [g, D, Wb]
    y = _ACTS[act1](h1)
    y_ref[:] = y.astype(y_ref.dtype)
    msum_ref[0] = jnp.sum(y * nm, axis=(0, 2))[None, :]


def _bn2_fwd_call(adj_pack, y1, y2, aff, ms, ma, rT, fT, w0, w1, b1, nmf, *,
                  act0, act1, alpha_drop, rate, group, thr, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y1.shape[1]
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
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, H1, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((H1, 2 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, y1, y2, aff, ms, ma, fT, w0, w1,
                b1.reshape(D, 1), nmf]
    if has_res:
        in_specs.insert(6, pl.BlockSpec((group, D, Wb), b3,
                                        memory_space=pltpu.VMEM))
        operands.insert(6, rT)
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
    chain): recompute h0/y0/h1 from the saved pre-dropout aggregation,
    gy from the [D]-sized BN coefficients, dh1 = gy·act1'(h1),
    dw1/db1 partials, dy0 = w1ᵀ@dh1, dh0 = dy0·act0'(h0) (the fT cotangent),
    dw0 partial, then the dx2 -> ds/dagg chain and the next reverse step's
    reduction partials. bnv rows as in _bn_bwd_kernel."""
    Wb = block_w
    (adj_ref, yp_ref, yk_ref, agg_ref, ms_ref, ma_ref, fT_ref, w0_ref,
     w1_ref, b1_ref, ds_ref_in, gsel_ref, bnv_ref, flag_ref, nm_ref,
     ds_ref, dw0_ref, dw1_ref, db1_ref, dfT_ref, dagg_ref, red_ref) = refs
    adj = adj_ref[:]
    w0 = w0_ref[:].astype(jnp.float32)                    # [H1, 2D]
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
    drop, dmask = _make_drop(alpha_drop, rate)
    x2 = jnp.concatenate([drop(s_prev, ms_ref[:]) if rate > 0.0 else s_prev,
                          drop(agg_ref[:].astype(jnp.float32), ma_ref[:])
                          if rate > 0.0 else agg_ref[:].astype(jnp.float32)],
                         axis=1)                           # [g, 2D, Wb] f32
    if hp:
        w0_hi, w0_lo = _split16(w0)
        w04 = jnp.broadcast_to(
            jnp.concatenate([w0_hi, w0_lo], axis=0)[None],
            (group, 2 * H1, 2 * D))
        h0 = _mm_packed(w04, x2, H1, hp=True, Wb=Wb)
        w0T_hi, w0T_lo = _split16(w0.T)
        w0T_b = jnp.broadcast_to(
            jnp.concatenate([w0T_hi, w0T_lo], axis=0)[None],
            (group, 4 * D, H1))
        w1T_hi, w1T_lo = _split16(w1.T)
        w1T_b = jnp.broadcast_to(
            jnp.concatenate([w1T_hi, w1T_lo], axis=0)[None],
            (group, 2 * H1, D))
    else:
        w0_b = jnp.broadcast_to(w0.astype(adj.dtype)[None],
                                (group, H1, 2 * D))
        h0 = _mm_packed(w0_b, x2, H1, hp=False, Wb=Wb, cdt=adj.dtype)
        w0T_b = jnp.broadcast_to(w0.T.astype(adj.dtype)[None],
                                 (group, 2 * D, H1))
        w1T_b = jnp.broadcast_to(w1.T.astype(adj.dtype)[None],
                                 (group, H1, D))
    h0 = h0 + fT_ref[:].astype(jnp.float32)
    y0 = _ACTS[act0](h0)                                  # [g, H1, Wb]
    h1 = _dense1_fm(w1, b1, y0, hp=hp, group=group, Wb=Wb, cdt=adj.dtype)
    dh1 = gy * _act_grad(act1, h1)                        # [g, D, Wb]
    db1_ref[0] = jnp.sum(dh1, axis=(0, 2))[None, :]
    dw1_ref[0] = jnp.sum(_BDT_HI(dh1, y0), axis=0).astype(dw1_ref.dtype)
    dy0 = _mm_packed(w1T_b, dh1, H1, hp=hp, Wb=Wb, cdt=adj.dtype)
    dh0 = dy0 * _act_grad(act0, h0)                       # [g, H1, Wb]
    dfT_ref[:] = dh0.astype(dfT_ref.dtype)
    dw0_ref[0] = jnp.sum(_BDT_HI(dh0, x2), axis=0).astype(dw0_ref.dtype)
    dx2 = _mm_packed(w0T_b, dh0, 2 * D, hp=hp, Wb=Wb, cdt=adj.dtype)
    dagg = dx2[:, D:] * dmask(ma_ref[:])
    dagg_ref[:] = dagg.astype(dagg_ref.dtype)
    ds_out = dx2[:, :D] * dmask(ms_ref[:]) + _contract_dst(dagg, adj, hp=hp)
    ds_ref[:] = ds_out.astype(ds_ref.dtype)
    xp_hat = (yp_ref[:].astype(jnp.float32) - bnv[7]) * bnv[8]
    red_ref[0] = jnp.stack([jnp.sum(ds_out, axis=(0, 2)),
                            jnp.sum(ds_out * xp_hat, axis=(0, 2))])


def _bn2_bwd_call(adj_pack, y_prev, y_k, agg, ms, ma, fT, w0, w1, b1, ds_in,
                  gsel, bnv, flag, nmf, *, act0: str, act1: str,
                  alpha_drop: bool, rate: float, group: int, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y_prev.shape[1]
    H1 = w0.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_bn2_bwd_kernel, act0=act0, act1=act1, hp=hp,
                               alpha_drop=alpha_drop, rate=rate, group=group,
                               block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    dspec = pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM)
    (ds, dw0_part, dw1_part, db1_part, dfT, dagg, red_part) = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
            dspec, dspec, dspec, dspec, dspec,
            pl.BlockSpec((group, H1, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, 2 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            dspec, dspec,
            pl.BlockSpec((16, D, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            dspec,
            pl.BlockSpec((1, H1, 2 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, H1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, H1, Wb), b3, memory_space=pltpu.VMEM),
            dspec,
            pl.BlockSpec((1, 2, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, H1, 2 * D), jnp.float32),
            jax.ShapeDtypeStruct((G, D, H1), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H1, Wb), fT.dtype),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, 2, D), jnp.float32),
        ],
        interpret=interpret,
    )(adj_pack, y_prev, y_k, agg, ms, ma, fT, w0, w1, b1.reshape(D, 1),
      ds_in, gsel, bnv, flag, nmf)
    return (ds, jnp.sum(dw0_part, axis=0), jnp.sum(dw1_part, axis=0),
            jnp.sum(db1_part, axis=0)[0], dfT, dagg,
            jnp.sum(red_part, axis=0))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(14, 15, 16, 17, 18, 19, 20, 21))
def fused_bn2_train_loop(adj_pack, s0, ms, ma, fT, w0, w1, b1, gamma, beta,
                         nmf, res_src, res_dst, res_w, K: int,
                         threshold: float, act0: str = "tanh",
                         act1: str = "tanh", alpha_drop: bool = True,
                         rate: float = 0.0, group: int = 32,
                         interpret: Optional[bool] = None):
    """The K-iteration 2-LAYER BN TRAINING propagation loop — the bn1 loop
    (fused_bn_train_loop) with a hidden dense layer per iteration
    (the reference's default trailing-BN config at ANY hidden width,
    MLP.py:13,29-64; e.g. the hidden-150 accuracy recipe with BN on).

    :param fT: [K, B, H1, Wb] per-iteration feature term
        Wf @ dropout_k(feats) + b0.
    :param w0: [H1, 2D] dense0 columns [Ws | Wa]; w1: [D, H1]; b1: [D].
    Other params / returns as fused_bn_train_loop."""
    out, _ = _bn2_loop_fwd(adj_pack, s0, ms, ma, fT, w0, w1, b1, gamma,
                           beta, nmf, res_src, res_dst, res_w, K, threshold,
                           act0, act1, alpha_drop, rate, group, interpret)
    return out


def _bn2_loop_fwd(adj_pack, s0, ms, ma, fT, w0, w1, b1, gamma, beta, nmf,
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
    dummy3 = (jnp.ones((B, D, Wb), ms.dtype) if rate <= 0.0 else None)
    for k in range(K):
        if has_res:
            vals = _res_gather(y1, a1, src_idx, res_w)
            rT = _res_scatter(vals, dst_idx, B, D, Wb)
        else:
            rT = None
        ms_k = ms[k] if rate > 0.0 else dummy3
        ma_k = ma[k] if rate > 0.0 else dummy3
        y, agg, marg, msum = _bn2_fwd_call(
            adj_pack, y1, y2, jnp.stack([a1, a2])[:, :, :, None],
            ms_k, ma_k, rT, fT[k], w0, w1, b1, nmf, act0=act0, act1=act1,
            alpha_drop=alpha_drop, rate=rate, group=group,
            thr=float(threshold), interpret=interpret)
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
    res = (adj_pack, s0, ms, ma, fT, w0, w1, b1, gamma, nmf, iters, idx,
           tuple(ys), tuple(aggs), tuple(moms), tuple(affs),
           res_src, res_dst, res_w)
    return out, res


def _bn2_loop_bwd(K, threshold, act0, act1, alpha_drop, rate, group,
                  interpret, res, g):
    (adj_pack, s0, ms, ma, fT, w0, w1, b1, gamma, nmf, iters, idx,
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
    dfT = [None] * K
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
        ms_k = (ms[k] if rate > 0.0
                else jnp.ones((B, D, Wb), jnp.float32))
        ma_k = ma[k] if rate > 0.0 else ms_k
        (ds_new, dw0_k, dw1_k, db1_k, dfT_k, dagg, red_part) = _bn2_bwd_call(
            adj_pack, y_prev, ys[k], aggs[k], ms_k, ma_k, fT[k], w0, w1, b1,
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
        dfT[k] = dfT_k
    ds = ds + jnp.where(active, 0.0, g_state)
    return (None, ds.astype(s0.dtype), _zero_ct(ms), _zero_ct(ma),
            jnp.stack(dfT).astype(fT.dtype), dw0.astype(w0.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype),
            _zero_ct(nmf), _zero_ct(res_src), _zero_ct(res_dst),
            _zero_ct(res_w))


fused_bn2_train_loop.defvjp(_bn2_loop_fwd, _bn2_loop_bwd)


def bn_train_propagate(spec, params_state, bn_state, gb, state0, agg_arcs,
                       step_rngs, nm, const_feats=None):
    """Orchestrate the BN training kernel path for models/core.py::propagate:
    precompute the bit-identical dropout mask stream, run the custom-VJP
    loop, and apply the active-gated moving-statistics update
    (GNN_BaseClass/GNN.py semantics via the XLA body's carry gating).

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
    # (labels + constant aggregations fold into the feature term)
    sd_ = spec.state_dim
    nl_ = gb.nodes.shape[1]
    if sd_ > 0:
        w_cat = jnp.concatenate([w1T[:, :sd_],
                                 w1T[:, sd_ + nl_:2 * sd_ + nl_]], axis=1)
        Wf = jnp.concatenate([w1T[:, sd_:sd_ + nl_],
                              w1T[:, 2 * sd_ + nl_:]], axis=1)
        fold_feats = jnp.concatenate([gb.nodes, const_feats], axis=1)
        fold_cols = lambda kp: jnp.concatenate(  # noqa: E731
            [kp[..., sd_:sd_ + nl_], kp[..., 2 * sd_ + nl_:]], axis=-1)
        agg_cols = lambda kp: kp[..., sd_ + nl_:2 * sd_ + nl_]  # noqa: E731
    else:
        w_cat = w1T[:, :2 * D]
        Wf = w1T[:, 2 * D:]
        fold_feats = agg_arcs
        fold_cols = lambda kp: kp[..., 2 * D:]    # noqa: E731
        agg_cols = lambda kp: kp[..., D:2 * D]    # noqa: E731
    gamma = params_state["bn"]["gamma"]
    beta = params_state["bn"]["beta"]
    act = spec.state_spec.activations[0]
    dropmap = dict(zip(spec.state_spec.dropout_pos,
                       spec.state_spec.dropout_rate))
    rate = float(dropmap.get(0, 0.0))
    alpha = spec.state_spec.alphadropout
    _hp = functools.partial(jnp.einsum, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    to3 = functools.partial(to_blocks_fm, block_w=Wb)

    adj_pack = (gb.adj_packT if gb.adj_packT is not None
                else pack_adjacency(jnp.swapaxes(gb.adj_blocks, 1, 2)))
    nm3 = nm.astype(jnp.float32).reshape(Bb, 1, Wb)
    featsT3 = to3(fold_feats.astype(state0.dtype))         # [B, F, Wb]
    if rate > 0.0:
        # bit-identical mask stream to the XLA body (mlp_apply: one split +
        # one bernoulli over the full input row per step); static unroll, not
        # vmap — the rbg PRNG is not vmap-invariant (see models/core.py).
        # Transposed as BOOL (4x fewer bytes than the f32 transposes the
        # other training paths pay), then converted in the target layout.
        keeps = jnp.stack([
            jax.random.bernoulli(jax.random.split(step_rngs[i])[1],
                                 1.0 - rate, (Np, in_dim))
            for i in range(K)])
        # int8 into the kernels (pallas_fused._keep): masks are exactly 0/1,
        # so numerics are unchanged while the blocked relayouts and the
        # fwd+bwd kernels' mask streams move 4x fewer bytes than f32
        ms = jax.vmap(to3)(keeps[:, :, :D]).astype(jnp.int8)
        ma = jax.vmap(to3)(agg_cols(keeps)).astype(jnp.int8)
        a_c, b_c = _drop_coeffs(alpha, rate)
        kf3 = jax.vmap(to3)(fold_cols(keeps))
        if alpha:
            featsd = a_c * jnp.where(kf3,
                                     featsT3.astype(jnp.float32)[None],
                                     _ALPHA_P) + b_c
        else:
            featsd = jnp.where(kf3,
                               a_c * featsT3.astype(jnp.float32)[None], 0.0)
        fT = (_hp("hf,kbfw->kbhw", Wf, featsd)
              + b1[None, None, :, None]).astype(state0.dtype)
    else:
        # shape-(K,1,1,1) dummies: never indexed when rate == 0 (the fwd/bwd
        # rules substitute full-size ones for the kernel operands)
        ms = jnp.ones((K, 1, 1, 1), jnp.float32)
        ma = ms
        fT1 = (_hp("hf,bfw->bhw", Wf, featsT3)
               + b1[None, :, None]).astype(state0.dtype)
        fT = jnp.broadcast_to(fT1[None], (K,) + fT1.shape)

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
            adj_pack, s03, ms, ma, fT, w_cat, w1_2, b1_2, gamma, beta, nm3,
            res_src, res_dst, res_w, K, float(spec.threshold), act, act1,
            alpha, rate, pick_group(Bb, cap=16), interpret)
    else:
        k, state3, moms = fused_bn_train_loop(
            adj_pack, s03, ms, ma, fT, w_cat, gamma, beta, nm3,
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
