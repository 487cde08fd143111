"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Real-TPU benchmarking happens in bench.py (driver-run), not under pytest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE_TESTDATA = "/root/reference/deepvariant/testdata"


@pytest.fixture(scope="session")
def testdata_dir():
    if not os.path.isdir(REFERENCE_TESTDATA):
        pytest.skip("reference testdata not available")
    return REFERENCE_TESTDATA
