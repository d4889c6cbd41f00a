"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so every sharding/pjit path can
be exercised without TPU hardware (the reference had no such harness — see
SURVEY.md §4).

This environment force-registers a TPU PJRT plugin through a sitecustomize
hook and sets JAX_PLATFORMS=axon globally, so env-var defaults are not
enough: the platform is pinned via jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
