"""JAX backend selection helpers for host-side CLI runs.

The tunneled single-chip TPU platform ('axon') registers a PJRT
plugin whose init blocks in a claim-retry sleep while another process
holds the chip. A CPU-only run that merely *imports* jax under the
ambient environment then hangs at first backend use. `force_cpu()`
pins the run to CPU and removes the tunneled factory outright so a
busy or flapping tunnel cannot stall host-side work (same workaround
as tests/conftest.py; observed 2026-08-18).
"""

from __future__ import annotations

import os


def force_cpu() -> None:
    """Pin this process to the CPU backend, dropping remote-TPU
    plugin factories. Call before the first jax backend use."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # a backend is already live; JAX_PLATFORMS was honored
    try:
        from jax._src import xla_bridge as _xb

        for name in list(getattr(_xb, "_backend_factories", {})):
            if "axon" in name:
                _xb._backend_factories.pop(name, None)
    except Exception:
        pass  # private API; harmless if the layout changes


def maybe_force_cpu() -> None:
    """`force_cpu()` when the caller asked for CPU via JAX_PLATFORMS
    (the plugin factory otherwise still loads and can block)."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        force_cpu()
