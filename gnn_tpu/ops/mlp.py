"""Pure-pytree MLP: init/apply functions replacing the reference's Keras
Sequential factory (GNN/MLP.py:11-64) with identical semantics:

* Dense stack with per-layer activation / initializer / regularizer.
* Optional (Alpha)Dropout *before* the dense layer at each `dropout_pos`
  (position len(units) means after the last dense), matching the list-insert
  logic of MLP.py:53-55.
* Optional trailing BatchNormalization (Keras defaults: momentum 0.99,
  epsilon 1e-3), ON by default as in MLP.py:13.

Differences by design (TPU-first):
* Parameters are plain pytrees; apply is a pure function usable under
  jit/grad/scan — BatchNorm running statistics are threaded explicitly.
* `stat_mask` lets batch-norm moments be computed over a masked row subset:
  the reference normalises only the rows that reach the net (padded rows and
  unselected readout rows never existed there); here every padded row flows
  through, so moments must exclude them to match.

`get_inout_dims` reproduces the shape arithmetic of MLP.py:68-122 including the
LGNN layer>=1 label-growth rules.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------- activations
_ACTIVATIONS = {
    "linear": lambda x: x,
    None: lambda x: x,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "leaky_relu": jax.nn.leaky_relu,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
}

# ---------------------------------------------------------------- initializers
_INITIALIZERS = {
    "lecun_normal": jax.nn.initializers.lecun_normal(),
    "lecun_uniform": jax.nn.initializers.lecun_uniform(),
    "glorot_normal": jax.nn.initializers.glorot_normal(),
    "glorot_uniform": jax.nn.initializers.glorot_uniform(),
    "he_normal": jax.nn.initializers.he_normal(),
    "he_uniform": jax.nn.initializers.he_uniform(),
    "zeros": jax.nn.initializers.zeros,
    "ones": jax.nn.initializers.ones,
    "random_normal": jax.nn.initializers.normal(stddev=0.05),
    "random_uniform": jax.nn.initializers.uniform(scale=0.05),
}

# SELU alpha-dropout constants (Klambauer et al.; Keras AlphaDropout)
_SELU_ALPHA = 1.6732632423543772
_SELU_SCALE = 1.0507009873554805
_ALPHA_P = -_SELU_ALPHA * _SELU_SCALE  # activation value dropped units saturate to


def _as_tuple(x, n):
    if isinstance(x, (list, tuple)):
        if len(x) != n:
            raise ValueError("Dense parameters must have the same length to be correctly processed")
        return tuple(x)
    return tuple([x] * n)


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static architecture description (hashable — safe to close over in jit).

    :param input_dim: input feature dimension.
    :param units: per-dense-layer output widths (last = MLP output dim).
    :param activations: name or list of names from the activation registry.
    :param kernel_initializer / bias_initializer: name(s) from the registry.
    :param kernel_regularizer / bias_regularizer: None, 'l1'/'l2', or
        ('l1'|'l2', coeff). Bare names use the Keras default coeff 0.01.
    :param dropout_rate / dropout_pos: rate(s) + dense-index position(s);
        dropout is applied before dense[pos] (pos == len(units): after last).
    :param alphadropout: use AlphaDropout (for selu nets) instead of Dropout.
    :param batch_normalization: trailing BatchNormalization layer (default on).
    """
    input_dim: int
    units: Tuple[int, ...]
    activations: Union[str, Tuple[Optional[str], ...]] = "linear"
    kernel_initializer: Union[str, Tuple[str, ...]] = "glorot_normal"
    bias_initializer: Union[str, Tuple[str, ...]] = "zeros"
    kernel_regularizer: Union[None, str, tuple] = None
    bias_regularizer: Union[None, str, tuple] = None
    dropout_rate: Tuple[float, ...] = ()
    dropout_pos: Tuple[int, ...] = ()
    alphadropout: bool = False
    batch_normalization: bool = True

    def __post_init__(self):
        object.__setattr__(self, "units", tuple(int(u) for u in (
            self.units if isinstance(self.units, (list, tuple)) else [self.units])))
        n = len(self.units)
        object.__setattr__(self, "activations", _as_tuple(self.activations, n))
        object.__setattr__(self, "kernel_initializer", _as_tuple(self.kernel_initializer, n))
        object.__setattr__(self, "bias_initializer", _as_tuple(self.bias_initializer, n))
        dp = self.dropout_pos
        dr = self.dropout_rate
        dp = (dp,) if isinstance(dp, int) else tuple(dp or ())
        dr = tuple([dr] * len(dp)) if isinstance(dr, float) else tuple(dr or ())
        if len(dp) != len(dr):
            raise ValueError("Dropout parameters must have the same length to be correctly processed")
        object.__setattr__(self, "dropout_pos", dp)
        object.__setattr__(self, "dropout_rate", dr)
        for a in self.activations:
            if a not in _ACTIVATIONS:
                raise ValueError(f"unknown activation {a!r}")
        for i in self.kernel_initializer + self.bias_initializer:
            if i not in _INITIALIZERS:
                raise ValueError(f"unknown initializer {i!r}")

    @property
    def output_dim(self) -> int:
        return self.units[-1]

    @property
    def num_layers(self) -> int:
        return len(self.units)

    def to_config(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_config(cls, d: dict) -> "MLPSpec":
        d = dict(d)
        for k in ("units", "activations", "kernel_initializer", "bias_initializer",
                  "dropout_rate", "dropout_pos"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        for k in ("kernel_regularizer", "bias_regularizer"):
            if isinstance(d.get(k), list):
                d[k] = tuple(d[k])
        return cls(**d)


# --------------------------------------------------------------------- params
def _init_vector(name: str, key, n: int, dtype):
    """Initialise a 1-D (bias) vector. Variance-scaling initializers use the
    Keras rank-1 fan rule fan_in = fan_out = n, which equals sampling a row of
    an (n, n) matrix with the same initializer."""
    init = _INITIALIZERS[name]
    if name in ("zeros", "ones", "random_normal", "random_uniform"):
        return init(key, (n,), dtype)
    return init(key, (n, n), dtype)[0]


def mlp_init(spec: MLPSpec, rng: jax.Array, dtype=jnp.float32):
    """Create (params, bn_state) pytrees."""
    params = {}
    fan_in = spec.input_dim
    for i, units in enumerate(spec.units):
        rng, kw, kb = jax.random.split(rng, 3)
        w = _INITIALIZERS[spec.kernel_initializer[i]](kw, (fan_in, units), dtype)
        b = _init_vector(spec.bias_initializer[i], kb, units, dtype)
        params[f"dense_{i}"] = {"w": w, "b": b}
        fan_in = units
    bn_state = {}
    if spec.batch_normalization:
        d = spec.units[-1]
        params["bn"] = {"gamma": jnp.ones((d,), dtype), "beta": jnp.zeros((d,), dtype)}
        bn_state = {"mean": jnp.zeros((d,), dtype), "var": jnp.ones((d,), dtype)}
    return params, bn_state


def _dropout(x, rate, rng, alpha: bool):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    if not alpha:
        return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
    a = ((1.0 - rate) * (1.0 + rate * _ALPHA_P ** 2)) ** -0.5
    b = -a * _ALPHA_P * rate
    return (a * jnp.where(keep, x, _ALPHA_P) + b).astype(x.dtype)


_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


def _batchnorm(params, bn_state, x, training: bool, stat_mask, axis_name=None):
    gamma, beta = params["gamma"], params["beta"]

    def _allsum(v):
        # cross-shard reduction when rows are sharded over a mesh axis
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    if training:
        if stat_mask is None:
            n = _allsum(jnp.asarray(x.shape[0], x.dtype))
            mean = _allsum(jnp.sum(x, axis=0)) / n
            var = _allsum(jnp.sum(jnp.square(x - mean), axis=0)) / n
        else:
            w = stat_mask.astype(x.dtype)[:, None]
            cnt = jnp.maximum(_allsum(jnp.sum(w)), 1.0)
            mean = _allsum(jnp.sum(x * w, axis=0)) / cnt
            var = _allsum(jnp.sum(jnp.square(x - mean) * w, axis=0)) / cnt
        new_state = {
            "mean": bn_state["mean"] * _BN_MOMENTUM + mean * (1.0 - _BN_MOMENTUM),
            "var": bn_state["var"] * _BN_MOMENTUM + var * (1.0 - _BN_MOMENTUM),
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * gamma + beta
    return y.astype(x.dtype), new_state


def _batchnorm_fm(params, bn_state, y3, nm3):
    """Training-mode BatchNorm on feature-major blocks y3 [B, H, Wb] with node
    mask nm3 [B, Wb] — same masked moments as _batchnorm on the node-major
    [N, H] view, computed without the [B, H, Wb] -> [N, H] layout flip (the
    fused training path's scan stays feature-major end to end)."""
    gamma, beta = params["gamma"], params["beta"]
    w = nm3.astype(jnp.float32)[:, None, :]
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    y = y3.astype(jnp.float32)
    mean = jnp.sum(y * w, axis=(0, 2)) / cnt                         # [H]
    var = jnp.sum(jnp.square(y - mean[None, :, None]) * w, axis=(0, 2)) / cnt
    new_state = {
        "mean": bn_state["mean"] * _BN_MOMENTUM + mean * (1.0 - _BN_MOMENTUM),
        "var": bn_state["var"] * _BN_MOMENTUM + var * (1.0 - _BN_MOMENTUM),
    }
    out = ((y - mean[None, :, None]) * jax.lax.rsqrt(var + _BN_EPS)[None, :, None]
           * gamma[None, :, None] + beta[None, :, None])
    return out.astype(y3.dtype), new_state


def mlp_apply(spec: MLPSpec, params, bn_state, x, *, training: bool = False,
              rng: Optional[jax.Array] = None, stat_mask=None, axis_name=None):
    """Apply the MLP. Returns (y, new_bn_state).

    :param training: enables dropout and batch-stat batch-norm.
    :param rng: required when training with dropout.
    :param stat_mask: optional bool [rows] — rows contributing to BN moments.
    :param axis_name: mesh axis over which rows are sharded (inside shard_map)
        — batch-norm moments are psum-ed so statistics stay global.
    """
    drop = dict(zip(spec.dropout_pos, spec.dropout_rate))
    h = x
    for i in range(spec.num_layers):
        if training and i in drop and drop[i] > 0.0:
            if rng is None:
                raise ValueError("rng required for dropout in training mode")
            rng, sub = jax.random.split(rng)
            h = _dropout(h, drop[i], sub, spec.alphadropout)
        p = params[f"dense_{i}"]
        h = jnp.dot(h, p["w"], preferred_element_type=jnp.float32).astype(h.dtype) + p["b"]
        h = _ACTIVATIONS[spec.activations[i]](h)
    n = spec.num_layers
    if training and n in drop and drop[n] > 0.0:
        rng, sub = jax.random.split(rng)
        h = _dropout(h, drop[n], sub, spec.alphadropout)
    if spec.batch_normalization:
        h, bn_state = _batchnorm(params["bn"], bn_state, h, training, stat_mask,
                                 axis_name)
    return h, bn_state


# --------------------------------------------------------------- regularizers
def _reg(kind, value):
    if kind is None:
        return 0.0
    if isinstance(kind, (tuple, list)):
        name, coeff = kind
    else:
        name, coeff = kind, 0.01  # Keras default
    if name == "l2":
        return coeff * jnp.sum(jnp.square(value))
    if name == "l1":
        return coeff * jnp.sum(jnp.abs(value))
    raise ValueError(f"unknown regularizer {name!r}")


def mlp_regularization(spec: MLPSpec, params) -> jnp.ndarray:
    """Sum of kernel/bias regularizer terms over the dense layers — added to
    the loss like reference regularizer_terms (GNN_BaseClass.py:223-228)."""
    total = 0.0
    for i in range(spec.num_layers):
        p = params[f"dense_{i}"]
        total += _reg(spec.kernel_regularizer, p["w"])
        total += _reg(spec.bias_regularizer, p["b"])
    return jnp.asarray(total)


# ---------------------------------------------------------------- shape rules
def get_inout_dims(net_name: str, dim_node_label: int, dim_arc_label: int,
                   dim_target: int, focus: Optional[str] = None, dim_state: int = 0,
                   hidden_units=None, *, layer: int = 0, get_state: bool = False,
                   get_output: bool = False,
                   problem_based: Optional[str] = None) -> Tuple[int, list]:
    """Input/output shape calculator — exact port of the arithmetic in
    reference MLP.py:68-122 (including LGNN layer>=1 label growth)."""
    if focus is None:
        focus = problem_based
    assert layer >= 0
    assert focus in ("a", "n", "g")
    assert dim_state >= 0

    DS = dim_state
    NL, AL, T = dim_node_label, dim_arc_label, dim_target

    if layer > 0:
        GS, GO = get_state, get_output
        if DS != 0:
            NL = NL + DS * GS + T * (focus != "a") * GO
            AL = AL + T * (focus == "a") * GO
        else:
            NL = NL + layer * NL * GS + ((layer - 1) * GS + 1) * T * (focus != "a") * GO
            AL = AL + T * (focus == "a") * GO

    if net_name == "state":
        input_shape = AL + 2 * (NL + DS)
        output_shape = DS if DS else NL
    elif net_name == "output":
        input_shape = (focus == "a") * (NL + AL + DS) + NL + dim_state
        output_shape = T
    else:
        raise ValueError(":param net_name: not in ['state', 'output']")

    if hidden_units is None or (isinstance(hidden_units, int) and hidden_units <= 0):
        hidden_units = []
    if isinstance(hidden_units, (list, tuple)):
        layers = list(hidden_units) + [output_shape]
    else:
        layers = [hidden_units, output_shape]
    return input_shape, layers
