"""Implicit-function-theorem gradients for the fixed-point propagation.

The reference differentiates through however many unrolled iterations actually
ran (GradientTape over tf.while_loop, SURVEY.md §7 hard part (a)). The masked
scan in models/core.py reproduces those gradients exactly, but stores one
residual set per iteration. This module offers the O(1)-memory alternative
(`GNNSpec(grad_mode='ift')`):

    s* = f(s*, θ)            (state fixed point)
    dL/dθ = λᵀ ∂f/∂θ  with  λ = (I − ∂f/∂sᵀ)⁻¹ ∂L/∂s*

λ is obtained by the Neumann/fixed-point iteration
    λ ← ∂L/∂s* + (∂f/∂s)ᵀ λ
run for `ift_backward_iters` steps — each step is one VJP of f, so backward
memory is constant in the iteration count. Gradients equal the unrolled ones
in the limit of a converged forward fixed point (guaranteed for contractive
f_w, the Scarselli model's defining assumption).

Restriction: f must be stationary across iterations — the state net may not
use dropout in ift mode (per-iteration masks make f non-stationary); training
batch-norm statistics are taken at the fixed point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fixed_point_ift(f, n_backward, params, s_star, consts):
    """Identity on s_star that installs the IFT backward rule.

    :param f: f(params, s, consts) -> next state (stationary step function).
    :param n_backward: Neumann iterations for the adjoint solve.
    :param params: differentiable parameters of f.
    :param s_star: the (already computed) fixed point — treated as f's output.
    :param consts: non-differentiable auxiliary arrays f closes over.
    """
    return s_star


def _ift_fwd(f, n_backward, params, s_star, consts):
    return s_star, (params, s_star, consts)


def _ift_bwd(f, n_backward, res, ct):
    params, s_star, consts = res

    # VJP of one application of f at the fixed point
    _, vjp_s = jax.vjp(lambda s: f(params, s, consts), s_star)
    _, vjp_p = jax.vjp(lambda p: f(p, s_star, consts), params)

    # Neumann series: λ = Σ_k (∂f/∂sᵀ)^k · ct
    def body(lam, _):
        (js,) = vjp_s(lam)
        return ct + js, None

    lam, _ = jax.lax.scan(body, ct, None, length=n_backward)

    (d_params,) = vjp_p(lam)
    d_s = jnp.zeros_like(s_star)          # s_star input carries no gradient

    import numpy as np

    def _zero(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer) or \
                jnp.asarray(x).dtype == jnp.bool_:
            return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)
        return jnp.zeros_like(x)

    d_consts = jax.tree_util.tree_map(_zero, consts)
    return d_params, d_s, d_consts


fixed_point_ift.defvjp(_ift_fwd, _ift_bwd)
