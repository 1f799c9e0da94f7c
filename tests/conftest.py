"""Test configuration: run everything on CPU with 8 virtual devices.

Sharding/pjit tests exercise a virtual 8-device mesh; single-device numeric
tests just use cpu:0. The environment may carry a TPU PJRT plugin that
overrides JAX_PLATFORMS, so we force the platform through jax.config (which
wins over plugin registration) before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Auto-mesh (Engine builds an 8-device mesh by default on multi-device
# hosts) stays OFF for the suite baseline -- the sharded paths are
# exercised deliberately by test_parallel.py / test_auto_mesh.py with
# explicit meshes or env overrides.
os.environ.setdefault("BRUTEFIR_TPU_MESH", "off")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xB1F)
