"""Typed (heterogeneous / composite) kernel-path BN TRAINING propagation.

The reference repository only signalled the composite capability
(GraphGenerator.py:8 imports a `GNN.composite_graph_class` that does not
exist); models/composite.py implements the evident design — per-node-type
state nets f_w^t with shared aggregation/convergence/readout. Its dense
type-masked XLA body is correct but measured 2.5x (T=1) to 5.6x (T=8)
slower than the homogeneous kernel path on identical math
(benchmarks/composite_bench.py, NOTES_r4.md). This module closes that gap
with a TYPED variant of the BN training chain (ops/pallas_bn.py):

* ALL per-type dense weights are stacked into ONE kernel issue:
  w_stk [T·H, 2D+F+1] against the shared bias-augmented input
  x3 = [state_drop ; agg_drop ; feats_drop ; 1] — one MXU product
  h_all [T·H, Wb] instead of T separate MLP applications. Extra types add
  MXU rows (which ride the systolic array almost free at reference widths),
  not extra passes over the HBM-resident arrays.
* Per-node TYPE-MASK SELECTION runs in VMEM: the one-hot masks tm [T, Wb]
  select each node's own type's activation slab, BN affine and backward
  coefficients. Aggregation, convergence margins, dropout and the
  dagg -> ds chain are computed ONCE on the selected state — exactly the
  shapes of the homogeneous chain, so the HBM streams (adjacency,
  snapshots, masks) do NOT grow with T.
* Dropout exactness: each type's net draws its OWN mask over the full
  input (models/composite.py: rng = fold_in(step_rng, t) into
  ops/mlp.py::mlp_apply). Because node n only ever uses type t(n)'s
  output, the kernels stream the per-node SELECTED mask
  m_sel[:, n] = m_{t(n)}[:, n] — bit-identical to the XLA body at every
  row that survives selection.
* BatchNorm is PER TYPE (mlp_apply stat_mask = nm & (types == t)): the
  forward kernel emits per-type masked moment partial sums [T, D]; the
  [T, 2, D]-sized XLA glue between launches finalizes moments/affines with
  ops/mlp.py::_batchnorm's exact two-pass arithmetic (per-node selected
  mean, then masked centered variance). The backward kernel folds the
  per-type BN backward in via bnv [T, 16, D] coefficient rows.

Semantics are models/composite.py::composite_propagate's exactly
(masked-scan convergence, active-gated per-type moving statistics,
grads ÷ iterations handled by the caller). Reference lineage:
GNN.py:202-242 hot loop, MLP.py:63 trailing BN, per-type nets as the
CompositeGNN of the reference's research line."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnn_tpu.ops.mlp import _BN_EPS, _BN_MOMENTUM
from gnn_tpu.ops.pallas_bn import (_affine, _ident_aff, _res_flat_idx,
                                   _res_scatter, _zero_ct)
from gnn_tpu.ops.pallas_fused import (_BDT_HI, _act_grad, _ACTS, _agg_packed,
                                      _contract_dst, _make_drop, _mm_packed,
                                      _split16, from_blocks_fm,
                                      FUSABLE_ACTIVATIONS, pack_adjacency,
                                      pick_group, to_blocks_fm)
from gnn_tpu.ops.pallas_bn import _x3_aug


def _pack_w(w, *, hp: bool, group: int, cdt):
    if hp:
        w_hi, w_lo = _split16(w)
        return jnp.broadcast_to(jnp.concatenate([w_hi, w_lo], axis=0)[None],
                                (group, 2 * w.shape[0], w.shape[1]))
    return jnp.broadcast_to(w.astype(cdt)[None], (group,) + w.shape)


def _sel_state(y3, aff, tm, T: int, lo: int, sc: int, sh: int):
    """Per-node type-selected affine reconstruction:
    s[:, :, n] = y3[:, :, n]·aff[sc, t(n)] + aff[sh, t(n)] — T masked FMAs
    (VPU) over the [g, D, Wb] block; aff rows indexed from a [R, T, D, 1]
    coefficient array."""
    s = jnp.zeros_like(y3)
    for t in range(T):
        mt = tm[:, t + lo:t + lo + 1, :]
        s = s + mt * (y3 * aff[sc, t] + aff[sh, t])
    return s


def _bnT_fwd_kernel(refs, *, acts: Tuple[str, ...], T: int, hp: bool,
                    has_res: bool, alpha_drop: bool, rate: float, group: int,
                    block_w: int, thr: float):
    """One typed BN training iteration for a group of blocks: select the
    previous two states per node type, margins, aggregation, the shared
    dropped bias-augmented dense against the STACKED per-type weights (one
    MXU issue), per-type activation + selection, per-type masked moment
    partial sums."""
    Wb = block_w
    refs = list(refs)
    adj_ref, y1_ref, y2_ref, aff_ref, tm_ref = refs[:5]
    refs = refs[5:]
    mc_ref = refs.pop(0) if rate > 0.0 else None
    r_ref = refs.pop(0) if has_res else None
    (f_ref, w_ref, nm_ref, y_ref, agg_ref, marg_ref, msum_ref) = refs
    adj = adj_ref[:]
    aff = aff_ref[:].astype(jnp.float32)                  # [4, T, D, 1]
    tm = tm_ref[:]                                        # [g, T, Wb] f32
    y1 = y1_ref[:].astype(jnp.float32)
    y2 = y2_ref[:].astype(jnp.float32)
    s = _sel_state(y1, aff, tm, T, 0, 0, 1)
    s_old = _sel_state(y2, aff, tm, T, 0, 2, 3)
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
    w = w_ref[:].astype(jnp.float32)                      # [T·H, 2D+F+1]
    TH = w.shape[0]
    H = TH // T
    wp = _pack_w(w, hp=hp, group=group, cdt=adj.dtype)
    h_all = _mm_packed(wp, x3, TH, hp=hp, Wb=Wb, cdt=adj.dtype)
    y_sel = jnp.zeros((group, H, Wb), jnp.float32)
    msums = []
    for t in range(T):
        y_t = _ACTS[acts[t]](h_all[:, t * H:(t + 1) * H, :])
        mt = tm[:, t:t + 1, :]
        y_sel = y_sel + mt * y_t
        # moments over REAL own-type nodes only (tm is the raw one-hot —
        # padded rows select type 0 for the state update, as the XLA body's
        # tmask does — so the moment sum masks by nm here)
        msums.append(jnp.sum(y_t * (mt * nm), axis=(0, 2)))
    y_ref[:] = y_sel.astype(y_ref.dtype)
    msum_ref[0] = jnp.stack(msums)                        # [T, D]


def _bnT_fwd_call(adj_pack, y1, y2, aff, tm3, mc, rT, feats, w_stk, nmf, *,
                  acts, T, alpha_drop, rate, group, thr, interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y1.shape[1]
    F = feats.shape[1]
    TH = w_stk.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_res = rT is not None
    kernel = functools.partial(_bnT_fwd_kernel, acts=acts, T=T, hp=hp,
                               has_res=has_res, alpha_drop=alpha_drop,
                               rate=rate, group=group, block_w=Wb, thr=thr)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((4, T, D, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, T, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, y1, y2, aff, tm3]
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
        pl.BlockSpec((TH, 2 * D + F + 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands += [feats, w_stk, nmf]
    return pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), y1.dtype),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, T, D), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def _bnT_bwd_kernel(refs, *, acts: Tuple[str, ...], T: int, hp: bool,
                    alpha_drop: bool, rate: float, group: int, block_w: int):
    """ONE reverse typed training iteration with the per-type BatchNorm
    backward folded in: reconstruct s_prev by type selection, recompute
    h_all with the stacked-weight issue, per-type gy from bnv[t] rows
    (masked to own-type nodes), the stacked dw partial (all T types' dw in
    ONE reduction), the shared dx -> ds/dagg chain, and per-type reduction
    partials for the next reverse step.

    bnv rows per type t: 0 aff_prev scale, 1 aff_prev shift, 2 mean_k,
    3 r_k, 4 a = gamma·r_k, 5 a·s1/cnt_t, 6 a·s2/cnt_t, 7 mean_prev,
    8 r_prev (as ops/pallas_bn.py::_bn_bwd_kernel, typed)."""
    Wb = block_w
    refs = list(refs)
    adj_ref, yp_ref, yk_ref, agg_ref, tm_ref = refs[:5]
    refs = refs[5:]
    mc_ref = refs.pop(0) if rate > 0.0 else None
    (f_ref, w_ref, ds_ref_in, gsel_ref, bnv_ref, flag_ref, nm_ref,
     ds_ref, dw_ref, dagg_ref, red_ref) = refs
    adj = adj_ref[:]
    w = w_ref[:].astype(jnp.float32)                      # [T·H, 2D+F+1]
    TH = w.shape[0]
    H = TH // T
    D = yp_ref.shape[1]
    bnv = bnv_ref[:].astype(jnp.float32)                  # [T, 16, D, 1]
    tm = tm_ref[:]                                        # [g, T, Wb]
    nm = nm_ref[:]                                        # [g, 1, Wb]
    flag = flag_ref[0, 0]
    yp = yp_ref[:].astype(jnp.float32)
    yk = yk_ref[:].astype(jnp.float32)
    s_prev = jnp.zeros_like(yp)
    for t in range(T):
        mt = tm[:, t:t + 1, :]
        s_prev = s_prev + mt * (yp * bnv[t, 0] + bnv[t, 1])
    gS = ds_ref_in[:].astype(jnp.float32) + flag * gsel_ref[:].astype(
        jnp.float32)
    _, dmask = _make_drop(alpha_drop, rate)
    x3 = _x3_aug(s_prev, agg_ref[:].astype(jnp.float32),
                 f_ref[:].astype(jnp.float32),
                 mc_ref[:] if rate > 0.0 else None, rate=rate,
                 alpha_drop=alpha_drop, group=group, Wb=Wb)
    wp = _pack_w(w, hp=hp, group=group, cdt=adj.dtype)
    h_all = _mm_packed(wp, x3, TH, hp=hp, Wb=Wb, cdt=adj.dtype)
    dh_slabs = []
    for t in range(T):
        mt = tm[:, t:t + 1, :]
        xk_t = (yk - bnv[t, 2]) * bnv[t, 3]
        # the moment-correction term applies at REAL nodes only (the padded
        # rows never enter type-t's batch moments); gS is zero at pads, so
        # dh vanishes there exactly as in the XLA body
        gy_t = bnv[t, 4] * gS - nm * (bnv[t, 5] + xk_t * bnv[t, 6])
        h_t = h_all[:, t * H:(t + 1) * H, :]
        dh_slabs.append(mt * gy_t * _act_grad(acts[t], h_t))
    dh_all = jnp.concatenate(dh_slabs, axis=1)            # [g, T·H, Wb]
    dw_ref[0] = jnp.sum(_BDT_HI(dh_all, x3), axis=0).astype(dw_ref.dtype)
    w2d = w[:, :2 * D]
    wT_b = _pack_w(w2d.T, hp=hp, group=group, cdt=adj.dtype)
    dx2 = _mm_packed(wT_b, dh_all, 2 * D, hp=hp, Wb=Wb, cdt=adj.dtype)
    if rate > 0.0:
        dm = dmask(mc_ref[:])                             # [g, 2D+F, Wb]
        dagg = dx2[:, D:] * dm[:, D:2 * D]
        ds_out = dx2[:, :D] * dm[:, :D] + _contract_dst(dagg, adj, hp=hp)
    else:
        dagg = dx2[:, D:]
        ds_out = dx2[:, :D] + _contract_dst(dagg, adj, hp=hp)
    dagg_ref[:] = dagg.astype(dagg_ref.dtype)
    ds_ref[:] = ds_out.astype(ds_ref.dtype)
    reds = []
    for t in range(T):
        mt = tm[:, t:t + 1, :]
        xp_hat_t = (yp - bnv[t, 7]) * bnv[t, 8]
        reds.append(jnp.stack([jnp.sum(ds_out * mt, axis=(0, 2)),
                               jnp.sum(ds_out * xp_hat_t * mt, axis=(0, 2))]))
    red_ref[0] = jnp.stack(reds)                          # [T, 2, D]


def _bnT_bwd_call(adj_pack, y_prev, y_k, agg, tm3, mc, feats, w_stk, ds_in,
                  gsel, bnv, flag, nmf, *, acts, T, alpha_drop, rate, group,
                  interpret):
    B, Wb, Wp = adj_pack.shape
    hp = Wp == 2 * Wb
    D = y_prev.shape[1]
    F = feats.shape[1]
    TH = w_stk.shape[0]
    C = w_stk.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_bnT_bwd_kernel, acts=acts, T=T, hp=hp,
                               alpha_drop=alpha_drop, rate=rate, group=group,
                               block_w=Wb)
    wrapped = lambda *refs: kernel(refs)  # noqa: E731
    b3 = lambda i: (i, 0, 0)              # noqa: E731
    G = B // group
    dspec = pl.BlockSpec((group, D, Wb), b3, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((group, Wb, Wp), b3, memory_space=pltpu.VMEM),
        dspec, dspec, dspec,
        pl.BlockSpec((group, T, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands = [adj_pack, y_prev, y_k, agg, tm3]
    if rate > 0.0:
        in_specs.append(pl.BlockSpec((group, 2 * D + F, Wb), b3,
                                     memory_space=pltpu.VMEM))
        operands.append(mc)
    in_specs += [
        pl.BlockSpec((group, F, Wb), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((TH, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        dspec, dspec,
        pl.BlockSpec((T, 16, D, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((group, 1, Wb), b3, memory_space=pltpu.VMEM),
    ]
    operands += [feats, w_stk, ds_in, gsel, bnv, flag, nmf]
    ds, dw_part, dagg, red_part = pl.pallas_call(
        wrapped,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            dspec,
            pl.BlockSpec((1, TH, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            dspec,
            pl.BlockSpec((1, T, 2, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, TH, C), jnp.float32),
            jax.ShapeDtypeStruct((B, D, Wb), jnp.float32),
            jax.ShapeDtypeStruct((G, T, 2, D), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return (ds, jnp.sum(dw_part, axis=0), dagg, jnp.sum(red_part, axis=0))


def _sel_coef(tm3, coef):
    """Per-node selected [B, D, Wb] coefficient array from per-type [T, D]
    rows: out[b, :, w] = coef[t(node b·Wb+w)] (zero at padded nodes)."""
    return jnp.einsum("btw,td->bdw", tm3, coef,
                      preferred_element_type=jnp.float32)


def _res_gather_typed(y3, aff, src_idx, src_type, res_w):
    """Typed residual-edge source values: gather from feature-major y3 then
    apply each SOURCE node's own type's affine ([2, T, D] rows gathered per
    edge)."""
    vals = jnp.take(y3.reshape(-1), src_idx).astype(jnp.float32)  # [E, D]
    sc = jnp.take(aff[0], src_type, axis=0)                       # [E, D]
    sh = jnp.take(aff[1], src_type, axis=0)
    return (vals * sc + sh) * res_w[:, None]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(13, 14, 15, 16, 17, 18, 19))
def fused_bn_typed_train_loop(adj_pack, s0, mc, feats, w_stk3, gamma, beta,
                              nmf, tm3, res_src, res_dst, res_w, res_type,
                              K: int, threshold: float,
                              acts: Tuple[str, ...] = ("tanh",),
                              alpha_drop: bool = True, rate: float = 0.0,
                              group: int = 32,
                              interpret: Optional[bool] = None):
    """The K-iteration TYPED BN TRAINING propagation loop (per-node-type
    state nets, models/composite.py semantics).

    :param adj_pack: pack_adjacency output for the FULL block set.
    :param s0: [B, D, Wb] initial states (feature-major blocks).
    :param mc: TUPLE of K [B, 2D+F, Wb] combined int8 keep-masks, per-node SELECTED
        from each type's own draw, or a (K, 1, 1, 1) dummy when rate == 0.
    :param feats: [B, F, Wb] loop-invariant raw fold features (no gradient).
    :param w_stk3: [T, H, 2D+F+1] per-type bias-augmented dense
        [Ws_t | Wa_t | Wf_t | b_t]; stacked to [T·H, ·] for the kernels.
    :param gamma / beta: [T, D] per-type BatchNorm scale / shift.
    :param nmf: [B, 1, Wb] float node mask.
    :param tm3: [B, T, Wb] float one-hot node-type masks (nm-masked: zero
        at padded nodes).
    :param res_src / res_dst / res_w / res_type: cross-block residual edges
        + each source node's type (empty arrays when the batch has none).
    :param acts: per-type activation names (static tuple).
    Returns (iters, state3 [B, D, Wb] realised-count snapshot, moms
    [K, T, 2, D] per-iteration per-type batch moments; non-diff)."""
    out, _ = _bnT_loop_fwd(adj_pack, s0, mc, feats, w_stk3, gamma, beta, nmf,
                           tm3, res_src, res_dst, res_w, res_type, K,
                           threshold, acts, alpha_drop, rate, group,
                           interpret)
    return out


def _bnT_loop_fwd(adj_pack, s0, mc, feats, w_stk3, gamma, beta, nmf, tm3,
                  res_src, res_dst, res_w, res_type, K, threshold, acts,
                  alpha_drop, rate, group, interpret):
    B, D, Wb = s0.shape
    T = w_stk3.shape[0]
    w_stk = w_stk3.reshape(T * w_stk3.shape[1], w_stk3.shape[2])
    has_res = res_src.shape[0] > 0
    if has_res:
        src_idx = _res_flat_idx(res_src, D, Wb)
        dst_idx = _res_flat_idx(res_dst, D, Wb)
    # tm3 is the RAW one-hot (padded rows select type 0 for the state
    # update, as the XLA body's tmask); moments mask by nm on top
    tm3n = tm3 * nmf
    cnt = jnp.maximum(jnp.sum(tm3n, axis=(0, 2)), 1.0)     # [T]
    identT = jnp.broadcast_to(_ident_aff(D)[:, None, :], (2, T, D))
    y1, y2 = s0, jnp.ones_like(s0)
    a1, a2 = identT, identT
    ys, aggs, moms, affs, margs = [], [], [], [], []
    for k in range(K):
        if has_res:
            vals = _res_gather_typed(y1, a1, src_idx, res_type, res_w)
            rT = _res_scatter(vals, dst_idx, B, D, Wb)
        else:
            rT = None
        aff_pack = jnp.concatenate([a1, a2], axis=0)[:, :, :, None]
        y, agg, marg, msum = _bnT_fwd_call(
            adj_pack, y1, y2, aff_pack, tm3,
            mc[k] if rate > 0.0 else None, rT, feats, w_stk, nmf,
            acts=acts, T=T, alpha_drop=alpha_drop, rate=rate, group=group,
            thr=float(threshold), interpret=interpret)
        mean = jnp.sum(msum, axis=0) / cnt[:, None]                   # [T, D]
        # _batchnorm's exact two-pass masked variance: center by each
        # node's OWN type's mean, then per-type masked reduce
        mean_sel = _sel_coef(tm3, mean)
        sq = jnp.square(y.astype(jnp.float32) - mean_sel)
        var = (jnp.einsum("bdw,btw->td", sq, tm3n,
                          preferred_element_type=jnp.float32)
               / cnt[:, None])
        y2, a2 = y1, a1
        aff_t = jax.vmap(_affine)(gamma, beta, mean, var)             # [T,2,D]
        y1, a1 = y, jnp.swapaxes(aff_t, 0, 1)                         # [2,T,D]
        ys.append(y)
        aggs.append(agg)
        moms.append(jnp.stack([mean, var], axis=1))                   # [T,2,D]
        affs.append(a1)
        margs.append(marg)
    margins = jnp.stack(margs)
    loop_any = jnp.any(margins > 0.5, axis=(1, 2, 3))                 # [K]
    iters = jnp.sum(jnp.cumprod(loop_any.astype(jnp.float32)))
    idx = jnp.maximum(iters.astype(jnp.int32) - 1, 0)
    y_sel = jax.lax.dynamic_index_in_dim(jnp.stack(ys), idx, 0,
                                         keepdims=False)
    mom_sel = jax.lax.dynamic_index_in_dim(jnp.stack(moms), idx, 0,
                                           keepdims=False)            # [T,2,D]
    rsel = _sel_coef(tm3, jax.lax.rsqrt(mom_sel[:, 1] + _BN_EPS)
                     * gamma.astype(jnp.float32))
    state3 = ((y_sel.astype(jnp.float32) - _sel_coef(tm3, mom_sel[:, 0]))
              * rsel + _sel_coef(tm3, beta.astype(jnp.float32)))
    state3 = jnp.where(iters >= 1.0, state3.astype(s0.dtype), s0)
    out = (iters, state3, jnp.stack(moms))
    res = (adj_pack, s0, mc, feats, w_stk3, gamma, nmf, tm3, iters, idx,
           tuple(ys), tuple(aggs), tuple(moms), tuple(affs),
           res_src, res_dst, res_w, res_type)
    return out, res


def _bnT_loop_bwd(K, threshold, acts, alpha_drop, rate, group, interpret,
                  res, g):
    (adj_pack, s0, mc, feats, w_stk3, gamma, nmf, tm3, iters, idx,
     ys, aggs, moms, affs, res_src, res_dst, res_w, res_type) = res
    _, g_state, _ = g                      # iters / moms: non-differentiable
    B, D, Wb = s0.shape
    T = w_stk3.shape[0]
    H = w_stk3.shape[1]
    w_stk = w_stk3.reshape(T * H, w_stk3.shape[2])
    has_res = res_src.shape[0] > 0
    if has_res:
        src_idx = _res_flat_idx(res_src, D, Wb)
        dst_idx = _res_flat_idx(res_dst, D, Wb)
    tm3n = tm3 * nmf
    cnt = jnp.maximum(jnp.sum(tm3n, axis=(0, 2)), 1.0)     # [T]
    gammaf = gamma.astype(jnp.float32)
    identT = jnp.broadcast_to(_ident_aff(D)[:, None, :], (2, T, D))
    bgroup = pick_group(B, cap=max(4, min(24, 96 // max(1, T))))
    g_state = g_state.astype(jnp.float32)
    active = iters >= 1.0

    # snapshot-injection reduction terms, per type (over REAL nodes)
    Sg = jnp.einsum("bdw,btw->td", g_state, tm3n,
                    preferred_element_type=jnp.float32)
    rks = [jax.lax.rsqrt(moms[j][:, 1] + _BN_EPS) for j in range(K)]  # [T,D]
    Sgx = []
    for j in range(K):
        xhat = ((ys[j].astype(jnp.float32) - _sel_coef(tm3, moms[j][:, 0]))
                * _sel_coef(tm3, rks[j]))
        Sgx.append(jnp.einsum("bdw,btw->td", g_state * xhat, tm3n,
                              preferred_element_type=jnp.float32))

    ds = jnp.zeros((B, D, Wb), jnp.float32)
    red = jnp.zeros((T, 2, D), jnp.float32)
    dw = jnp.zeros((T * H, w_stk3.shape[2]), jnp.float32)
    dgamma = jnp.zeros((T, D), jnp.float32)
    dbeta = jnp.zeros((T, D), jnp.float32)
    for k in reversed(range(K)):
        flag = ((jnp.int32(k) == idx) & active).astype(jnp.float32)
        s1 = red[:, 0] + flag * Sg                                    # [T, D]
        s2 = red[:, 1] + flag * Sgx[k]
        dbeta = dbeta + s1
        dgamma = dgamma + s2
        r_k = rks[k]
        a = gammaf * r_k                                              # [T, D]
        aff_p = identT if k == 0 else affs[k - 1]                     # [2,T,D]
        mean_p = (jnp.zeros((T, D), jnp.float32) if k == 0
                  else moms[k - 1][:, 0])
        r_p = (jnp.ones((T, D), jnp.float32) if k == 0 else rks[k - 1])
        bnv = jnp.zeros((T, 16, D), jnp.float32)
        bnv = bnv.at[:, 0].set(aff_p[0]).at[:, 1].set(aff_p[1])
        bnv = bnv.at[:, 2].set(moms[k][:, 0]).at[:, 3].set(r_k)
        bnv = bnv.at[:, 4].set(a)
        bnv = bnv.at[:, 5].set(a * s1 / cnt[:, None])
        bnv = bnv.at[:, 6].set(a * s2 / cnt[:, None])
        bnv = bnv.at[:, 7].set(mean_p).at[:, 8].set(r_p)
        y_prev = s0 if k == 0 else ys[k - 1]
        ds_new, dw_k, dagg, red_part = _bnT_bwd_call(
            adj_pack, y_prev, ys[k], aggs[k], tm3,
            mc[k] if rate > 0.0 else None, feats, w_stk,
            ds, g_state.astype(ys[k].dtype), bnv[:, :, :, None],
            flag.reshape(1, 1), nmf, acts=acts, T=T, alpha_drop=alpha_drop,
            rate=rate, group=bgroup, interpret=interpret)
        red = red_part
        if has_res:
            vals = (jnp.take(dagg.reshape(-1), dst_idx) * res_w[:, None])
            ds_new = ds_new + _res_scatter(vals, src_idx, B, D, Wb)
            if k > 0:
                # fold the residual contribution into the next reverse
                # step's PER-TYPE reduction partials (grouped by the source
                # node's type)
                mp_src = jnp.take(mean_p, res_type, axis=0)
                rp_src = jnp.take(r_p, res_type, axis=0)
                xp_src = ((jnp.take(ys[k - 1].reshape(-1), src_idx)
                           .astype(jnp.float32) - mp_src) * rp_src)
                red = red + jnp.stack(
                    [jax.ops.segment_sum(vals, res_type, num_segments=T),
                     jax.ops.segment_sum(vals * xp_src, res_type,
                                         num_segments=T)], axis=1)
        ds = ds_new
        dw = dw + dw_k
    ds = ds + jnp.where(active, 0.0, g_state)
    return (None, ds.astype(s0.dtype), _zero_ct(mc), _zero_ct(feats),
            dw.reshape(w_stk3.shape).astype(w_stk3.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype),
            _zero_ct(nmf), _zero_ct(tm3), _zero_ct(res_src),
            _zero_ct(res_dst), _zero_ct(res_w), _zero_ct(res_type))


fused_bn_typed_train_loop.defvjp(_bnT_loop_fwd, _bnT_loop_bwd)


def supports_typed_bn_train(state_specs) -> bool:
    """Static eligibility of the typed BN training loop: every per-type
    state net is a single dense layer with trailing BatchNormalization, a
    fusable activation and dropout only at the input, and all types share
    the dropout configuration (per-type activations MAY differ — they are
    applied per weight slab in-kernel)."""
    s0 = state_specs[0]
    return all(
        s.num_layers == 1
        and bool(s.batch_normalization)
        and s.activations[0] in FUSABLE_ACTIVATIONS
        and all(p == 0 for p in s.dropout_pos)
        and s.dropout_pos == s0.dropout_pos
        and s.dropout_rate == s0.dropout_rate
        and bool(s.alphadropout) == bool(s0.alphadropout)
        for s in state_specs)


def bn_typed_train_propagate(spec, params_state, bn_state, gb, state0,
                             agg_arcs, step_rngs, nm, const_feats=None):
    """Orchestrate the typed BN training kernel path for
    models/composite.py::composite_propagate: build the per-node-SELECTED
    dropout mask stream (each type's own bit-identical draw), stack the
    per-type bias-augmented weights, run the custom-VJP loop, and apply the
    active-gated per-type moving-statistics updates.

    Returns (iters, state [Np, D] node-major, new per-type bn tuple)."""
    import os as _os
    Bb, Wb, _ = gb.adj_blocks.shape
    Np = gb.n_node_pad
    K = spec.max_iteration
    D = state0.shape[1]
    T = spec.n_types
    in_dim = spec.state_specs[0].input_dim
    sd_ = spec.state_dim
    nl_ = gb.nodes.shape[1]
    # column layout as the homogeneous chain (ops/pallas_bn.py)
    if sd_ > 0:
        state_cols = lambda kp: kp[..., :sd_]     # noqa: E731
        fold_cols = lambda kp: jnp.concatenate(   # noqa: E731
            [kp[..., sd_:sd_ + nl_], kp[..., 2 * sd_ + nl_:]], axis=-1)
        agg_cols = lambda kp: kp[..., sd_ + nl_:2 * sd_ + nl_]  # noqa: E731
        fold_feats = jnp.concatenate([gb.nodes, const_feats], axis=1)
    else:
        state_cols = lambda kp: kp[..., :D]       # noqa: E731
        fold_cols = lambda kp: kp[..., 2 * D:]    # noqa: E731
        agg_cols = lambda kp: kp[..., D:2 * D]    # noqa: E731
        fold_feats = agg_arcs

    def aug_w(p):
        w1T = p["dense_0"]["w"].T                          # [H, in_dim]
        if sd_ > 0:
            w_cat = jnp.concatenate([w1T[:, :sd_],
                                     w1T[:, sd_ + nl_:2 * sd_ + nl_]], axis=1)
            Wf = jnp.concatenate([w1T[:, sd_:sd_ + nl_],
                                  w1T[:, 2 * sd_ + nl_:]], axis=1)
        else:
            w_cat = w1T[:, :2 * D]
            Wf = w1T[:, 2 * D:]
        return jnp.concatenate([w_cat, Wf, p["dense_0"]["b"][:, None]],
                               axis=1)

    w_stk3 = jnp.stack([aug_w(p) for p in params_state])   # [T, H, C]
    gamma = jnp.stack([p["bn"]["gamma"] for p in params_state])
    beta = jnp.stack([p["bn"]["beta"] for p in params_state])
    acts = tuple(s.activations[0] for s in spec.state_specs)
    dropmap = dict(zip(spec.state_specs[0].dropout_pos,
                       spec.state_specs[0].dropout_rate))
    rate = float(dropmap.get(0, 0.0))
    alpha = spec.state_specs[0].alphadropout
    to3 = functools.partial(to_blocks_fm, block_w=Wb)

    adj_pack = (gb.adj_packT if gb.adj_packT is not None
                else pack_adjacency(jnp.swapaxes(gb.adj_blocks, 1, 2)))
    nm3 = nm.astype(jnp.float32).reshape(Bb, 1, Wb)
    types = gb.node_types
    # RAW one-hot: padded rows select type 0 for the state update exactly
    # as composite_propagate's tmask; the loop nm-masks the moment sums
    tm3 = to3(jax.nn.one_hot(types, T, dtype=jnp.float32))  # [B, T, Wb]
    feats3 = to3(fold_feats.astype(state0.dtype))          # [B, F, Wb]
    if rate > 0.0:
        # each type's bit-identical mask draw (composite_propagate:
        # mlp_apply(rng=fold_in(step_rng, t)) -> split -> bernoulli), then
        # the per-node OWN-TYPE selection the kernels consume. Selection is
        # a T-step where-chain, NOT a gather: the row-gather formulation
        # cost 0.7 ms per iteration on the chip (xplane, round 5) — 5 T
        # elementwise selects are ~free, and T == 1 collapses to the plain
        # homogeneous draw.
        mc_list = []
        for i in range(K):
            acc = None
            for t in range(T):
                k_t = jax.random.bernoulli(
                    jax.random.split(
                        jax.random.fold_in(step_rngs[i], t))[1],
                    1.0 - rate, (Np, in_dim))
                acc = (k_t if acc is None
                       else jnp.where((types == t)[:, None], k_t, acc))
            kc = jnp.concatenate([state_cols(acc), agg_cols(acc),
                                  fold_cols(acc)], axis=-1)
            # per-iteration tuple entries (not a [K, ...] stack): the stack
            # forced a per-step relayout copy (pallas_bn round-5 note)
            mc_list.append(to3(kc).astype(jnp.int8))
        mc = tuple(mc_list)
    else:
        mc = tuple(jnp.ones((1, 1, 1), jnp.float32) for _ in range(K))

    if gb.res_src is not None and gb.res_src.shape[0]:
        res_src, res_dst, res_w = gb.res_src, gb.res_dst, gb.res_w
        res_type = jnp.take(types, res_src)
    else:
        res_src = jnp.zeros((0,), jnp.int32)
        res_dst = jnp.zeros((0,), jnp.int32)
        res_w = jnp.zeros((0,), jnp.float32)
        res_type = jnp.zeros((0,), jnp.int32)

    s03 = to3(state0)
    interpret = True if _os.environ.get("GNN_TPU_INTERPRET") else None
    grp = pick_group(Bb, cap=max(4, min(32, 128 // max(1, T))))
    k, state3, moms = fused_bn_typed_train_loop(
        adj_pack, s03, mc, feats3, w_stk3, gamma, beta, nm3, tm3,
        res_src, res_dst, res_w, res_type, K, float(spec.threshold), acts,
        alpha, rate, grp, interpret)

    # active-gated per-type moving statistics (composite_propagate's
    # _tree_where(active, new_bns, bn) carry gating)
    moms = jax.lax.stop_gradient(moms)                     # [K, T, 2, D]
    new_bns = []
    for t in range(T):
        mean_mv = bn_state[t]["mean"]
        var_mv = bn_state[t]["var"]
        for j in range(K):
            on = jnp.float32(j) < k
            mean_mv = jnp.where(on, mean_mv * _BN_MOMENTUM
                                + moms[j, t, 0] * (1.0 - _BN_MOMENTUM),
                                mean_mv)
            var_mv = jnp.where(on, var_mv * _BN_MOMENTUM
                               + moms[j, t, 1] * (1.0 - _BN_MOMENTUM),
                               var_mv)
        new_bns.append({"mean": mean_mv.astype(bn_state[t]["mean"].dtype),
                        "var": var_mv.astype(bn_state[t]["var"].dtype)})
    return k, from_blocks_fm(state3), tuple(new_bns)


# ------------------------------------------------------------ typed EVAL chain
def supports_typed_eval(state_specs) -> bool:
    """Static eligibility of the typed EVAL chain: single dense layer with a
    fusable activation per type (BatchNormalization optional — at inference
    it is a fixed per-type affine; dropout is inactive)."""
    return all(s.num_layers == 1
               and s.activations[0] in FUSABLE_ACTIVATIONS
               for s in state_specs)


def typed_eval_propagate(spec, params_state, bn_state, gb, state0, agg_arcs,
                         nm, const_feats=None):
    """Typed INFERENCE propagation on the kernel path: the training chain's
    stacked-weight fwd kernel (`_bnT_fwd_call`) launched per iteration with
    the per-type affine FIXED from running statistics (or identity when BN
    is off) — no moment glue, no dropout, no custom VJP (serving never
    differentiates; training uses `bn_typed_train_propagate`). The moment
    partial sums the kernel emits are ignored.

    Returns (iters, state [Np, D] node-major, bn_state unchanged)."""
    import os as _os
    Bb, Wb, _ = gb.adj_blocks.shape
    K = spec.max_iteration
    D = state0.shape[1]
    T = spec.n_types
    sd_ = spec.state_dim
    nl_ = gb.nodes.shape[1]
    if sd_ > 0:
        fold_feats = jnp.concatenate([gb.nodes, const_feats], axis=1)
    else:
        fold_feats = agg_arcs

    def aug_w(p):
        w1T = p["dense_0"]["w"].T
        if sd_ > 0:
            w_cat = jnp.concatenate([w1T[:, :sd_],
                                     w1T[:, sd_ + nl_:2 * sd_ + nl_]], axis=1)
            Wf = jnp.concatenate([w1T[:, sd_:sd_ + nl_],
                                  w1T[:, 2 * sd_ + nl_:]], axis=1)
        else:
            w_cat = w1T[:, :2 * D]
            Wf = w1T[:, 2 * D:]
        return jnp.concatenate([w_cat, Wf, p["dense_0"]["b"][:, None]],
                               axis=1)

    w_stk3 = jnp.stack([aug_w(p) for p in params_state])
    w_stk = w_stk3.reshape(T * w_stk3.shape[1], w_stk3.shape[2])
    acts = tuple(s.activations[0] for s in spec.state_specs)
    to3 = functools.partial(to_blocks_fm, block_w=Wb)
    adj_pack = (gb.adj_packT if gb.adj_packT is not None
                else pack_adjacency(jnp.swapaxes(gb.adj_blocks, 1, 2)))
    nm3 = nm.astype(jnp.float32).reshape(Bb, 1, Wb)
    types = gb.node_types
    tm3 = to3(jax.nn.one_hot(types, T, dtype=jnp.float32))
    feats3 = to3(fold_feats.astype(state0.dtype))

    # the FIXED inference affine per type: identity without BN, else
    # gamma·rsqrt(var_mv+eps) / beta − mean·scale (ops/mlp.py eval branch)
    if spec.state_specs[0].batch_normalization:
        scale = jnp.stack([
            p["bn"]["gamma"].astype(jnp.float32)
            * jax.lax.rsqrt(b["var"].astype(jnp.float32) + _BN_EPS)
            for p, b in zip(params_state, bn_state)])          # [T, D]
        shift = jnp.stack([
            p["bn"]["beta"].astype(jnp.float32)
            - b["mean"].astype(jnp.float32) * s
            for (p, b), s in zip(zip(params_state, bn_state), scale)])
        aff1 = jnp.stack([scale, shift])                       # [2, T, D]
    else:
        aff1 = jnp.broadcast_to(_ident_aff(D)[:, None, :], (2, T, D))
    identT = jnp.broadcast_to(_ident_aff(D)[:, None, :], (2, T, D))

    if gb.res_src is not None and gb.res_src.shape[0]:
        res_src, res_dst, res_w = gb.res_src, gb.res_dst, gb.res_w
        res_type = jnp.take(types, res_src)
        src_idx = _res_flat_idx(res_src, D, Wb)
        dst_idx = _res_flat_idx(res_dst, D, Wb)
        has_res = True
    else:
        has_res = False

    s03 = to3(state0)
    interpret = True if _os.environ.get("GNN_TPU_INTERPRET") else None
    grp = pick_group(Bb, cap=max(4, min(32, 128 // max(1, T))))
    y1, y2 = s03, jnp.ones_like(s03)
    a1, a2 = identT, identT
    ys, margs = [], []
    for k in range(K):
        if has_res:
            vals = _res_gather_typed(y1, a1, src_idx, res_type, res_w)
            rT = _res_scatter(vals, dst_idx, Bb, D, Wb)
        else:
            rT = None
        aff_pack = jnp.concatenate([a1, a2], axis=0)[:, :, :, None]
        y, _agg, marg, _msum = _bnT_fwd_call(
            adj_pack, y1, y2, aff_pack, tm3, None, rT, feats3, w_stk, nm3,
            acts=acts, T=T, alpha_drop=False, rate=0.0, group=grp,
            thr=float(spec.threshold), interpret=interpret)
        y2, a2 = y1, a1
        y1, a1 = y, aff1          # fixed affine from iteration 1 on
        ys.append(y)
        margs.append(marg)
    margins = jnp.stack(margs)
    loop_any = jnp.any(margins > 0.5, axis=(1, 2, 3))
    iters = jnp.sum(jnp.cumprod(loop_any.astype(jnp.float32)))
    idx = jnp.maximum(iters.astype(jnp.int32) - 1, 0)
    y_sel = jax.lax.dynamic_index_in_dim(jnp.stack(ys), idx, 0,
                                         keepdims=False)
    state3 = y_sel.astype(jnp.float32) * _sel_coef(tm3, aff1[0]) \
        + _sel_coef(tm3, aff1[1])
    state3 = jnp.where(iters >= 1.0, state3.astype(s03.dtype), s03)
    return iters, from_blocks_fm(state3), bn_state
