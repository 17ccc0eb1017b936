"""Global configuration: default float dtype and padding buckets.

The reference uses `tf.keras.backend.floatx()` (graph_class.py:42). Here the
default is float32 (TPU-native accumulate dtype); bfloat16 can be enabled for
throughput — MXU matmuls then run in bf16 with f32 accumulation.
"""

from __future__ import annotations

import os

import numpy as np

_FLOATX = np.float32


def enable_compilation_cache(path: str = "~/.cache/gnn_tpu_xla") -> None:
    """Enable JAX's persistent compilation cache. Large-scatter TPU compiles
    run minutes through remote-compile tunnels; caching makes them one-time."""
    import jax

    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


if not os.environ.get("GNN_TPU_NO_CACHE"):
    try:
        enable_compilation_cache()
    except Exception:
        pass


_WARMED_UP = False


def warmup_transfers(verbose: bool = True) -> None:
    """One-time device→host transfer warm-up.

    Through tunnelled TPU runtimes (axon), the FIRST device→host pull in a
    process can take minutes (relay handshake); all later pulls are
    instantaneous. The engine calls this before training so the stall happens
    at a visible, predictable point instead of silently inside the first
    weight snapshot."""
    global _WARMED_UP
    if _WARMED_UP:
        return
    import time

    import jax
    import jax.numpy as jnp

    if jax.default_backend() in ("cpu",):
        _WARMED_UP = True
        return
    t0 = time.time()
    if verbose:
        print(" > warming device->host transfer path (first pull through a "
              "tunnelled runtime can take minutes)...", flush=True)
    np_ = jnp.zeros((8,)) + 1
    _ = np.asarray(np_)
    if verbose:
        print(f" > transfer path ready ({time.time() - t0:.1f}s)", flush=True)
    _WARMED_UP = True


# Default PRNG: the TPU hardware RNG ('rbg'). Threefry mask generation costs
# ~14 ms per MUTAG-scale training step (dropout masks for 150k nodes x 5
# iterations); rbg removes it entirely (22.4 -> 8.3 ms measured). Streams
# differ from threefry but remain deterministic per key; set
# GNN_TPU_PRNG=threefry for the JAX default.
if os.environ.get("GNN_TPU_PRNG", "rbg") != "threefry":
    try:
        import jax

        jax.config.update("jax_default_prng_impl",
                          os.environ.get("GNN_TPU_PRNG", "rbg"))
    except Exception:
        pass


def floatx():
    """Current default floating dtype (numpy dtype object)."""
    return _FLOATX


def set_floatx(dtype) -> None:
    """Set default floating dtype. Accepts 'float32' | 'bfloat16' | 'float64' or dtypes."""
    global _FLOATX
    import jax.numpy as jnp

    name = np.dtype(dtype).name if not isinstance(dtype, str) else dtype
    table = {"float32": np.float32, "float64": np.float64, "bfloat16": jnp.bfloat16}
    if name not in table:
        raise ValueError(f"unsupported floatx {dtype!r}; use float32/bfloat16/float64")
    _FLOATX = table[name]


# Padding buckets: device arrays are padded up so jit caches a small number of
# compiled shapes instead of one per ragged graph. Sizes are rounded to the next
# multiple of PAD_MULTIPLE, then to the next power-of-two bucket beyond
# PAD_POW2_FROM. 128 matches the TPU lane width.
PAD_MULTIPLE = 128
PAD_POW2_FROM = 1024


def pad_size(n: int, multiple: int = PAD_MULTIPLE, pow2_from: int = PAD_POW2_FROM) -> int:
    """Bucketed padded size >= max(n, 1)."""
    n = max(int(n), 1)
    m = -(-n // multiple) * multiple
    if m <= pow2_from:
        return m
    p = pow2_from
    while p < m:
        p *= 2
    # soften pure powers of two with a midpoint bucket to halve waste
    half = p // 2 + p // 4
    if m <= half:
        return half
    return p
