"""Test configuration.

Tests run hermetically on CPU with 8 virtual devices so that
multi-chip sharding (`tpusparse.parallel`) is exercised without TPU
hardware, mirroring how the driver validates `dryrun_multichip`.
Pallas kernels run in interpreter mode on CPU (see tpusparse.kernels).

Set RUN_TPU_TESTS=1 to run the tests on real TPU hardware instead.
"""

import os

_ON_TPU = bool(os.environ.get("RUN_TPU_TESTS"))
if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The ambient TPU plugin ignores the JAX_PLATFORMS env var, so
    # override through the config API before any backend is initialized.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpusparse.io import generators  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Default runs skip @pytest.mark.slow (the interpret-mode scale /
    solver tests that dominate the ~40 min full suite); the full suite
    runs with RUN_SLOW=1 (CI / driver) or an explicit ``-m slow``.
    Default run is ~10 min — see CLAUDE.md for both timings."""
    if os.environ.get("RUN_SLOW", "0") not in ("", "0", "false", "no"):
        return
    mexpr = config.getoption("-m", default="") or ""
    if "slow" in mexpr:
        return
    skip = pytest.mark.skip(
        reason="slow; set RUN_SLOW=1 (or -m slow) for the full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop JAX's compiled-executable caches at every module boundary.

    The full suite segfaults deterministically inside XLA-CPU's
    backend_compile_and_load after ~345 tests' worth of accumulated
    executables (the same test passes alone, both suite halves pass,
    RSS is modest at 3.7 GB / 126 GB, and a 64 MB stack reproduces it —
    cumulative backend state, not one bad kernel or stack depth).
    Clearing between modules keeps per-module compile reuse but bounds
    the accumulation."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_spd():
    """Small SPD matrix (CSR, host) for solver tests."""
    return generators.make_laplacian_grid2d(16).to_csr()


@pytest.fixture(scope="session")
def medium_spd():
    return generators.make_laplacian_grid3d(12).to_csr()
