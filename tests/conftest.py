"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding (reart_tpu.parallel) is validated on a virtual CPU mesh;
real-TPU benchmarking happens in bench.py, not the test suite.
"""

import os

# XLA:CPU leaks ~3 tiny mmaps per loaded executable; a full-suite process
# accumulates >60k maps and SEGFAULTS inside LLVM when it crosses
# vm.max_map_count (default 65530) — measured 2026-08-18 (deterministic
# crash at test #145). Raise the limit when we can (root); harmless no-op
# otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1_048_576:
            with open("/proc/sys/vm/max_map_count", "w") as _f:
                _f.write("1048576")
except OSError:
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A TPU plugin may self-register via sitecustomize and ignore JAX_PLATFORMS;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def torch_available() -> bool:
    try:
        import torch  # noqa: F401
        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not (reference_available() and torch_available()),
    reason="reference repo or torch not available for oracle-parity tests",
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
