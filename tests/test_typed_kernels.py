"""Typed (composite) BN training kernel chain vs the dense type-masked XLA
body (ops/pallas_typed.py vs models/composite.py::composite_propagate).

The two paths share bit-identical dropout streams (each type's own draw,
selected per node), so agreement is the kernels' hi/lo + affine-vs-centered
rounding class — the same bands the homogeneous BN chain tests use
(tests/test_fused.py). Gradients are compared through a well-conditioned
functional of the state (CE/softmax conditioning legitimately amplifies the
forward rounding class by 100-1000x — established for the homogeneous
kernels in the round-4 fuzz campaign) AND through the real training loss at
the fuzz harness's scale-aware band."""

import os

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.graphs.batch import from_graphs_blocked
from gnn_tpu.graphs.graph import Graph
from gnn_tpu.models.composite import (CompositeGNNSpec, composite_forward,
                                      composite_init)
from gnn_tpu.models.core import weighted_loss
from gnn_tpu.ops.mlp import MLPSpec, get_inout_dims
from gnn_tpu.training.losses import get_loss


def typed_graphs(rng, T, nl=5, al=2, dt=2, focus="n", n_graphs=4, big=False):
    gs = []
    sizes = [18 + 5 * i for i in range(n_graphs)]
    if big:
        sizes[1] = 80   # over-block at W=32 -> residual edges
    for n in sizes:
        e = 4 * n
        nodes = rng.standard_normal((n, nl)).astype(np.float32)
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        arcs = np.concatenate(
            [src[:, None], dst[:, None],
             rng.standard_normal((e, al)).astype(np.float32)], axis=1)
        tn = {"n": n, "a": e, "g": 1}[focus]
        targets = np.eye(dt, dtype=np.float32)[rng.integers(0, dt, tn)]
        gs.append(Graph(arcs=arcs, nodes=nodes, targets=targets, focus=focus,
                        aggregation_mode="average",
                        node_types=rng.integers(0, T, n).astype(np.int32)))
    return gs


def build(rng, T, focus="n", sd=0, rate=0.15, acts=None, big=False,
          max_iter=3, threshold=0.01):
    nl, al, dt = 5, 2, 2
    gs = typed_graphs(rng, T, nl, al, dt, focus, big=big)
    in_s, layers_s = get_inout_dims("state", nl, al, dt, focus, sd, None)
    acts = acts or ["selu", "tanh", "relu", "selu"]
    kw = (dict(dropout_rate=(rate,), dropout_pos=(0,), alphadropout=True)
          if rate else {})
    sss = tuple(
        MLPSpec(input_dim=in_s, units=tuple(layers_s), activations=acts[t % len(acts)],
                kernel_initializer="lecun_normal",
                bias_initializer="lecun_normal", **kw)
        for t in range(T))
    comp = nl + sd if sd else nl
    o_in = {"n": comp, "g": comp, "a": 2 * comp + al}[focus]
    os_ = MLPSpec(input_dim=o_in, units=(dt,), activations="softmax",
                  kernel_initializer="glorot_normal",
                  bias_initializer="glorot_normal",
                  batch_normalization=False)
    spec = CompositeGNNSpec(focus=focus, state_specs=sss, output_spec=os_,
                            max_iteration=max_iter, threshold=threshold,
                            state_dim=sd)
    params, bn = composite_init(spec, jax.random.key(0))
    gb = from_graphs_blocked(gs, block_w=32)
    return spec, params, bn, gb


def both_paths(spec, params, bn, gb, loss_kind="state", monkeypatch=None):
    key = jax.random.key(42)
    lf = get_loss("categorical_crossentropy")

    def run(kernel_on):
        if kernel_on:
            os.environ.pop("GNN_TPU_FUSED_BN", None)
        else:
            os.environ["GNN_TPU_FUSED_BN"] = "0"
        try:
            def loss_fn(p):
                res = composite_forward(spec, p, bn, gb, key, training=True)
                if loss_kind == "state":
                    nmf = gb.node_mask.astype(jnp.float32)[:, None]
                    loss = jnp.sum(jnp.tanh(res["state"]) * nmf)
                else:
                    loss = weighted_loss(lf, {"from_logits": False}, gb,
                                         res["out"])
                return loss, res

            (loss, res), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, res, grads
        finally:
            os.environ.pop("GNN_TPU_FUSED_BN", None)
    return run(False), run(True)


class TestTypedChainParity:
    @pytest.mark.parametrize("T,focus,sd,rate,big", [
        (1, "n", 0, 0.15, False),
        (3, "n", 0, 0.15, False),
        (3, "g", 0, 0.0, False),
        (2, "a", 0, 0.15, False),
        (3, "n", 4, 0.15, False),
        (2, "n", 0, 0.15, True),     # over-block graph -> residual edges
    ])
    def test_matches_xla_body(self, rng, T, focus, sd, rate, big):
        spec, params, bn, gb = build(rng, T, focus=focus, sd=sd, rate=rate,
                                     big=big)
        if big:
            assert gb.res_src is not None and int(gb.res_src.shape[0]) > 0
        # the kernel path must actually dispatch (routing guard)
        jx = str(jax.make_jaxpr(lambda p: composite_forward(
            spec, p, bn, gb, jax.random.key(0), training=True))(params))
        assert "pallas" in jx
        (l_x, r_x, g_x), (l_k, r_k, g_k) = both_paths(spec, params, bn, gb)
        assert float(r_x["iters"]) == float(r_k["iters"])
        scale = max(1.0, float(jnp.max(jnp.abs(r_x["state"]))))
        np.testing.assert_allclose(np.asarray(r_k["state"]),
                                   np.asarray(r_x["state"]),
                                   atol=max(1e-4, 3e-5 * scale))
        np.testing.assert_allclose(np.asarray(r_k["out"]),
                                   np.asarray(r_x["out"]),
                                   atol=max(1e-4, 3e-5 * scale))
        # per-type moving BN statistics
        bx = jax.flatten_util.ravel_pytree(r_x["bn"]["state"])[0]
        bk = jax.flatten_util.ravel_pytree(r_k["bn"]["state"])[0]
        np.testing.assert_allclose(np.asarray(bk), np.asarray(bx), atol=1e-5)
        # gradients through the well-conditioned state functional: the
        # propagation backward itself is near-exact
        fx, _ = jax.flatten_util.ravel_pytree(g_x)
        fk, _ = jax.flatten_util.ravel_pytree(g_k)
        gm = max(1.0, float(jnp.max(jnp.abs(fx))))
        np.testing.assert_allclose(np.asarray(fk), np.asarray(fx),
                                   atol=max(2e-4, 5e-5 * gm))

    def test_training_loss_grads_scale_band(self, rng):
        """Grads of the REAL CE training loss at the fuzz harness's
        scale-aware band (conditioning amplifies forward rounding)."""
        spec, params, bn, gb = build(rng, 3)
        (l_x, r_x, g_x), (l_k, r_k, g_k) = both_paths(spec, params, bn, gb,
                                                      loss_kind="ce")
        assert abs(float(l_x) - float(l_k)) < max(1e-3, 1e-5 * abs(float(l_x)))
        fx, _ = jax.flatten_util.ravel_pytree(g_x)
        fk, _ = jax.flatten_util.ravel_pytree(g_k)
        gm = max(1.0, float(jnp.max(jnp.abs(fx))))
        np.testing.assert_allclose(np.asarray(fk), np.asarray(fx),
                                   rtol=5e-3, atol=5e-3 * gm)

    def test_early_stop_iters_agree(self, rng):
        """High threshold stops the loop early — realised counts and the
        returned snapshot agree across paths."""
        spec, params, bn, gb = build(rng, 2, rate=0.0, threshold=5.0,
                                     max_iter=5)
        (l_x, r_x, _), (l_k, r_k, _) = both_paths(spec, params, bn, gb)
        assert float(r_x["iters"]) == float(r_k["iters"])
        assert float(r_k["iters"]) < 5.0
        np.testing.assert_allclose(np.asarray(r_k["state"]),
                                   np.asarray(r_x["state"]), atol=1e-4)

    @pytest.mark.parametrize("T,bn_on,sd", [(1, True, 0), (3, True, 0),
                                            (2, False, 0), (3, True, 4)])
    def test_eval_chain_matches_xla_body(self, rng, T, bn_on, sd):
        """Typed EVAL chain (fixed per-type inference affine, no dropout)
        vs the XLA body — BN on and off, state_dim variants."""
        import dataclasses
        spec, params, bn, gb = build(rng, T, sd=sd, rate=0.15)
        if not bn_on:
            spec = dataclasses.replace(spec, state_specs=tuple(
                dataclasses.replace(s, batch_normalization=False)
                for s in spec.state_specs))
            params, bn = composite_init(spec, jax.random.key(0))
        jx = str(jax.make_jaxpr(lambda p: composite_forward(
            spec, p, bn, gb, jax.random.key(0), training=False))(params))
        assert "pallas" in jx
        key = jax.random.key(5)

        def run(off):
            if off:
                os.environ["GNN_TPU_FUSED_BN"] = "0"
            try:
                return composite_forward(spec, params, bn, gb, key,
                                         training=False)
            finally:
                os.environ.pop("GNN_TPU_FUSED_BN", None)

        r_x, r_k = run(True), run(False)
        assert float(r_x["iters"]) == float(r_k["iters"])
        scale = max(1.0, float(jnp.max(jnp.abs(r_x["state"]))))
        np.testing.assert_allclose(np.asarray(r_k["state"]),
                                   np.asarray(r_x["state"]),
                                   atol=max(1e-4, 3e-5 * scale))
        np.testing.assert_allclose(np.asarray(r_k["out"]),
                                   np.asarray(r_x["out"]),
                                   atol=max(1e-4, 3e-5 * scale))

    def test_killswitch_and_eligibility(self, rng, monkeypatch):
        """GNN_TPU_FUSED=0 keeps the XLA body; mixed per-type dropout rates
        are statically ineligible for the stacked kernel."""
        from gnn_tpu.ops.pallas_typed import supports_typed_bn_train
        spec, params, bn, gb = build(rng, 2)
        assert supports_typed_bn_train(spec.state_specs)
        s0 = spec.state_specs[0]
        import dataclasses
        mixed = (s0, dataclasses.replace(s0, dropout_rate=(0.3,)))
        assert not supports_typed_bn_train(mixed)
        nobn = (dataclasses.replace(s0, batch_normalization=False),)
        assert not supports_typed_bn_train(nobn)
        # kill-switch: still correct (trivially — same body)
        monkeypatch.setenv("GNN_TPU_FUSED", "0")
        res = composite_forward(spec, params, bn, gb, jax.random.key(1),
                                training=True)
        assert np.isfinite(float(res["iters"]))
