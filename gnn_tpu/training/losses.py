"""Loss function registry (Keras-parity semantics).

The reference passes `tf.keras.losses.*` callables plus kwargs to the model
(GNN_BaseClass.py:44-45) and computes per-sample losses which are weighted and
reduce_sum-med (GNN.py:198-199). Here losses are named functions returning a
per-row vector; the model multiplies by sample weights and sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7  # keras backend epsilon


def categorical_crossentropy(target, output, from_logits: bool = False, axis: int = -1):
    """-Σ t·log p per row. With from_logits=False, probabilities are
    renormalised and clipped like Keras backend.categorical_crossentropy —
    with one hardening: outputs are clipped to [eps, 1-eps] BEFORE the
    renormalisation (Keras normalises first). For genuine probability rows the
    result is identical; for out-of-range rows (e.g. the reference's default
    MLP applies BatchNormalization after the softmax layer, MLP.py:63, whose
    rows can sum to ~0) this avoids division-by-zero NaN gradients that the
    reference's order produces."""
    if from_logits:
        log_p = jax.nn.log_softmax(output, axis=axis)
    else:
        output = jnp.clip(output, _EPS, 1.0 - _EPS)
        output = output / jnp.sum(output, axis=axis, keepdims=True)
        log_p = jnp.log(jnp.clip(output, _EPS, 1.0 - _EPS))
    return -jnp.sum(target * log_p, axis=axis)


def binary_crossentropy(target, output, from_logits: bool = False, axis: int = -1):
    if from_logits:
        # numerically-stable BCE with logits
        bce = jnp.maximum(output, 0) - output * target + jnp.log1p(jnp.exp(-jnp.abs(output)))
    else:
        p = jnp.clip(output, _EPS, 1.0 - _EPS)
        bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return jnp.mean(bce, axis=axis)


def mean_squared_error(target, output, axis: int = -1):
    return jnp.mean(jnp.square(output - target), axis=axis)


def mean_absolute_error(target, output, axis: int = -1):
    return jnp.mean(jnp.abs(output - target), axis=axis)


def huber(target, output, delta: float = 1.0, axis: int = -1):
    err = output - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad * quad + delta * (abs_err - quad), axis=axis)


def hinge(target, output, axis: int = -1):
    return jnp.mean(jnp.maximum(1.0 - target * output, 0.0), axis=axis)


LOSSES = {
    "categorical_crossentropy": categorical_crossentropy,
    "binary_crossentropy": binary_crossentropy,
    "mean_squared_error": mean_squared_error,
    "mse": mean_squared_error,
    "mean_absolute_error": mean_absolute_error,
    "mae": mean_absolute_error,
    "huber": huber,
    "hinge": hinge,
}


def get_loss(name):
    """Resolve a loss by registry name (callables pass through)."""
    if callable(name):
        return name
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name!r}; known: {sorted(set(LOSSES))}")
    return LOSSES[name]
