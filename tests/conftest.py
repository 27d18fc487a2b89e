"""Test config: run JAX on a virtual 8-device CPU mesh so sharding tests work
without TPU hardware, and keep float32 math (torch parity).

Note: in the dev container a sitecustomize pre-imports jax with a TPU
platform plugin, so setting JAX_PLATFORMS here is too late.  The CPU backend
still initialises lazily and picks up --xla_force_host_platform_device_count,
so we (a) set the flag, (b) pin jax_default_device to CPU.  Mesh tests should
build meshes from ``jax.devices("cpu")`` explicitly (see ``cpu_devices``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compilation cache: the suite is compile-bound on the 1-CPU CI
# box (~13 min cold); warm runs drop well under the CLAUDE.md ~10 min
# envelope.  Keyed per backend, so sharing the repo cache dir with the TPU
# bench is safe.
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass

# ADVCHAIN_TEST_TPU=1 leaves the default backend (the real chip) in place
# so tests/test_tpu_parity.py can exercise on-device kernel numerics.
if os.environ.get("ADVCHAIN_TEST_TPU") != "1":
    try:
        _cpu0 = jax.devices("cpu")[0]
        jax.config.update("jax_default_device", _cpu0)
    except Exception:  # pragma: no cover - no cpu backend
        pass


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
