"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Real-TPU benchmarking happens in bench.py (driver-run), not under pytest.
"""

import os

# Force CPU even when the ambient environment selects the tunneled TPU
# ('axon'): unit tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Belt-and-braces: jax may already be imported by a pytest plugin with the
# ambient JAX_PLATFORMS=axon; the config update wins if no backend is live.
jax.config.update("jax_platforms", "cpu")

# Drop the tunneled-TPU ('axon') backend factory entirely: when the
# tunnel flaps, its plugin init blocks in a claim-retry sleep and a
# CPU-only test run hangs at first backend use (observed 2026-08-18).
try:
    from jax._src import xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if "axon" in _name:
            _xb._backend_factories.pop(_name, None)
except Exception:
    pass  # private API; harmless if the layout changes

import pytest  # noqa: E402

REFERENCE_TESTDATA = "/root/reference/deepvariant/testdata"


@pytest.fixture(scope="session")
def testdata_dir():
    if not os.path.isdir(REFERENCE_TESTDATA):
        pytest.skip("reference testdata not available")
    return REFERENCE_TESTDATA
