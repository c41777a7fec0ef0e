"""Test configuration.

- Forces JAX onto a virtual 8-device CPU platform so sharding tests run
  without TPU hardware (the driver separately dry-runs the multi-chip path).
- Enables float64 so parity tests against SciPy / the reference oracle are
  exact to ~1e-12.
- Puts the reference-oracle shim (tests/refshim) on sys.path: it loads the
  upstream reference sources with a minimal pybaseutils stand-in so golden
  parity tests can call the genuine reference implementation on CPU.
"""
import os
import sys

# Tests always run on the virtual CPU mesh (override any preset platform);
# real-TPU behavior is exercised by bench.py and the driver's dryrun.
# NOTE: jax may already be imported by a pytest plugin, and jax snapshots
# JAX_PLATFORMS at import time — so use jax.config.update, not os.environ.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("MPLBACKEND", "Agg")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_fft():
    """The genuine reference fft_analysis module (CPU, via the shim)."""
    import FFT.fft_analysis as ref
    return ref


@pytest.fixture(scope="session")
def ref_windows():
    import FFT.windows as refw
    return refw


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (multi-process) tests")


@pytest.fixture(scope="session")
def ref_hilbert():
    import FFT.hilbert as refh
    return refh


@pytest.fixture(scope="session")
def ref_doppler():
    import FFT.Doppler as refd
    return refd
