"""Test configuration: force a virtual 8-device CPU mesh before jax loads.

Mirrors the survey's test plan (SURVEY.md §4): unit and oracle tests run on
CPU with `xla_force_host_platform_device_count=8` so multi-chip sharding is
exercised without TPU hardware, and x64 is enabled so reference-grade f64
numerics (bundle adjustment, pose composition) are testable.
"""

import os

# Must happen before the first backend initialization. The sandbox's
# sitecustomize force-registers the axon TPU plugin and sets
# JAX_PLATFORMS=axon, so plain setdefault is not enough — override hard.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: this sandbox has a single CPU core, so XLA
# compiles dominate suite wall-time. Cache every executable (no minimum
# compile time / entry size) so warm runs skip compilation entirely.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
