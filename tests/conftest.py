"""Test configuration: run JAX on a virtual 8-device CPU mesh so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin overrides JAX_PLATFORMS from the environment, so
# force the CPU backend through the config API (before first backend use).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="session")
def noise_image(rng):
    """Smooth-ish random grayscale test image (uint8, 97x131 to exercise
    non-aligned shapes)."""
    import cv2

    img = rng.integers(0, 256, size=(97, 131), dtype=np.uint8)
    return cv2.GaussianBlur(img, (5, 5), 1.5)


@pytest.fixture(scope="session")
def noise_rgb(rng):
    return rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test FILES.

    Two consecutive full-suite runs (2026-08-20) segfaulted inside the
    XLA CPU backend while compiling an ECC slab program late in the
    suite (once in compilation_cache serialization, once in
    backend_compile_and_load) — the same test passes in every
    file-subset run, so the trigger is whole-suite accumulated compile
    state, not the test.  Clearing jit caches per module bounds the
    live LLVM-JIT'd program population; programs recompile on demand
    (fixtures holding device arrays are unaffected).
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
