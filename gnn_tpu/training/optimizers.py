"""Optimizer factory over optax, with safe JSON (de)serialisation.

Replaces the reference's Keras optimizer handling — including its unsafe
`eval()` of the stored optimizer config on load (GNN.py:140, LGNN.py:136) —
with a plain name+kwargs dict. Defaults match Keras (Adam eps=1e-7).
"""

from __future__ import annotations

from typing import Optional

import optax

_DEFAULTS = {
    "adam": dict(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-7),
    "adamw": dict(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-7, weight_decay=4e-3),
    "sgd": dict(learning_rate=1e-2),
    "rmsprop": dict(learning_rate=1e-3, decay=0.9, eps=1e-7),
    "adagrad": dict(learning_rate=1e-3),
    "lamb": dict(learning_rate=1e-3),
    "lion": dict(learning_rate=1e-4),
}

_ALIASES = {  # accept Keras-style kwarg names
    "lr": "learning_rate", "beta_1": "b1", "beta_2": "b2", "epsilon": "eps",
}


def optimizer_config(name: str = "adam", **kwargs) -> dict:
    """Build a serialisable optimizer config dict."""
    name = name.lower()
    if name not in _DEFAULTS:
        raise ValueError(f"unknown optimizer {name!r}; known: {sorted(_DEFAULTS)}")
    clean = {_ALIASES.get(k, k): v for k, v in kwargs.items()}
    cfg = dict(_DEFAULTS[name])
    cfg.update(clean)
    return {"name": name, "kwargs": cfg}


_SCHEDULES = {
    "cosine_decay": optax.cosine_decay_schedule,
    "exponential_decay": optax.exponential_decay,
    "warmup_cosine": optax.warmup_cosine_decay_schedule,
    "linear": optax.linear_schedule,
    "constant": optax.constant_schedule,
}


def make_schedule(spec) -> optax.Schedule:
    """Build a serialisable learning-rate schedule:
    {"name": "cosine_decay", "kwargs": {"init_value": 1e-3, "decay_steps": 1000}}."""
    if callable(spec):
        return spec
    return _SCHEDULES[spec["name"]](**spec.get("kwargs", {}))


def freeze_config(config) -> tuple:
    """Hashable form of an optimizer config (nested dicts -> sorted tuples),
    for closing over in jit static args."""
    def fz(v):
        if isinstance(v, dict):
            return ("__dict__",) + tuple((k, fz(x)) for k, x in sorted(v.items()))
        if isinstance(v, list):
            return ("__list__",) + tuple(fz(x) for x in v)
        return v
    return fz(config)


def thaw_config(frozen):
    def th(v):
        if isinstance(v, tuple) and v and v[0] == "__dict__":
            return {k: th(x) for k, x in v[1:]}
        if isinstance(v, tuple) and v and v[0] == "__list__":
            return [th(x) for x in v[1:]]
        return v
    return th(frozen)


def make_optimizer(config) -> optax.GradientTransformation:
    """Instantiate optax optimizer from a config dict (or name string).
    learning_rate may be a number or a schedule spec dict (see make_schedule)."""
    if isinstance(config, str):
        config = optimizer_config(config)
    name, kwargs = config["name"], dict(config.get("kwargs", {}))
    lr = kwargs.get("learning_rate")
    if isinstance(lr, dict):
        kwargs["learning_rate"] = make_schedule(lr)
    return getattr(optax, name)(**kwargs)
