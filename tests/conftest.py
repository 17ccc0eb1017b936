"""Test config: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment registers an 'axon' TPU-tunnel backend via sitecustomize
and pins jax_platforms; tests override it back to CPU *after* jax import (env
vars alone are ignored — axon.register re-pins the config)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
