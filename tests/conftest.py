"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic can
be exercised without TPU hardware (the TPU-world analogue of testing
multi-node code without a cluster). The env vars must be set before jax is
first imported, which is why they live at conftest import time.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel),
# so this must be an override, not a setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compilation cache: repeated jit compiles (many tiny trainers
# across tests) hit disk instead of recompiling, cutting suite time ~10x.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/vsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
