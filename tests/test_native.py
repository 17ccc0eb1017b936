"""Native host-runtime kernels (gnn_tpu/native): the C++ paths must be
BIT-identical to their numpy fallbacks — downstream exactness tests (TF
parity, fused-vs-XLA) assume the batch builder's output does not depend on
which path ran."""

import numpy as np
import pytest

from gnn_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_block_adj_bit_exact_vs_add_at(rng):
    B, W, E = 11, 32, 4000
    dst = rng.integers(0, B * W, E).astype(np.int64)
    src = (dst // W) * W + rng.integers(0, W, E).astype(np.int64)
    w = rng.random(E).astype(np.float32)
    ref = np.zeros((B, W, W), np.float32)
    np.add.at(ref, (dst // W, dst % W, src % W), w)
    out = np.zeros((B, W, W), np.float32)
    assert native.block_adj(src, dst, w, W, out)
    np.testing.assert_array_equal(out, ref)


def test_seg_rows_bit_exact_vs_add_at(rng):
    E, N, D = 5000, 700, 3
    vals = rng.standard_normal((E, D)).astype(np.float32)
    w = rng.random(E).astype(np.float32)
    dst = rng.integers(0, N, E)
    ref = np.zeros((N, D), np.float32)
    np.add.at(ref, dst, vals * w[:, None])
    out = native.seg_rows(vals, w, dst, N)
    np.testing.assert_array_equal(out, ref)


def test_pack_hilo_T_bit_exact_vs_ml_dtypes(rng):
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    adj = (rng.random((7, 64, 64))
           * rng.choice([0.0, 1.0, 1.0], (7, 64, 64))).astype(np.float32)
    a32 = np.ascontiguousarray(adj.transpose(0, 2, 1)).astype(np.float32)
    hi = a32.astype(bf16)
    lo = (a32 - hi.astype(np.float32)).astype(bf16)
    ref = np.concatenate([hi, lo], axis=2)
    out = native.pack_hilo_T(adj)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))


def test_edge_weights_matches_numpy_fallback(rng):
    from gnn_tpu.graphs.datasets import random_graph
    g = random_graph(40, 3, 1, 2, 0.5, focus="n", rng=rng)
    for mode in ("sum", "normalized", "average"):
        g.set_aggregation(mode)
        w_native = g.edge_weights()
        # force the numpy fallback via the implementation detail
        w_np = np.ones(g.n_arcs, np.float32)
        if mode == "normalized":
            w_np *= np.float64(1.0 / g.n_arcs)
        elif mode == "average":
            _, inv, counts = np.unique(g.dst, return_inverse=True,
                                       return_counts=True)
            w_np = w_np / counts[inv]
        np.testing.assert_allclose(w_native, w_np, atol=1e-7)


def test_graph_caches_track_mode_changes(rng):
    from gnn_tpu.graphs.datasets import random_graph
    g = random_graph(30, 3, 1, 2, 0.5, focus="n", rng=rng)
    g.set_aggregation("sum")
    w_sum = g.edge_weights().copy()
    g.set_aggregation("average")
    w_avg = g.edge_weights()
    assert not np.allclose(w_sum, w_avg)
    assert g.edge_weights() is g.edge_weights()   # cached instance
