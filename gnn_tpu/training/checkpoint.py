"""Full training-state checkpointing (params + batch-norm + optimizer slots +
history + rng), enabling crash-resilient resume.

The reference checkpoints only model weights — optimizer state is lost on
reload and training resumes its epoch count from `history`
(GNN_BaseClass.py:278-279, SURVEY.md §5). Here the complete state round-trips
through a single folder: npz pytrees + a JSON manifest.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np


def _flatten(tree) -> dict:
    return {jax.tree_util.keystr(kp): np.asarray(leaf)
            for kp, leaf in jax.tree_util.tree_leaves_with_path(tree)}


def _unflatten(data, like):
    leaves_kp = jax.tree_util.tree_leaves_with_path(like)
    import jax.numpy as jnp
    new = [jnp.asarray(data[jax.tree_util.keystr(kp)]) for kp, _ in leaves_kp]
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(like), new)


def save_checkpoint(path: str, *, params, bn, opt_state, history: Optional[dict] = None,
                    rng=None, extra: Optional[dict] = None) -> None:
    """Write a resumable checkpoint folder."""
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "params.npz"), **_flatten(params))
    np.savez(os.path.join(path, "bn.npz"), **_flatten(bn))
    np.savez(os.path.join(path, "opt_state.npz"), **_flatten(opt_state))
    manifest = {"history": history or {}, "extra": extra or {}}
    if rng is not None:
        manifest["rng_key_data"] = np.asarray(jax.random.key_data(rng)).tolist()
        manifest["rng_impl"] = str(jax.random.key_impl(rng))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_checkpoint(path: str, *, params_like, bn_like, opt_state_like):
    """Load a checkpoint folder. Returns (params, bn, opt_state, history, rng,
    extra); rng is None when it was not saved."""
    params = _unflatten(np.load(os.path.join(path, "params.npz")), params_like)
    bn = _unflatten(np.load(os.path.join(path, "bn.npz")), bn_like)
    opt_state = _unflatten(np.load(os.path.join(path, "opt_state.npz")), opt_state_like)
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    rng = None
    if "rng_key_data" in manifest:
        rng = jax.random.wrap_key_data(
            np.asarray(manifest["rng_key_data"], dtype=np.uint32))
    return params, bn, opt_state, manifest.get("history", {}), rng, manifest.get("extra", {})
