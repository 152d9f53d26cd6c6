"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so sharding/multi-chip
paths are exercised without TPU hardware (SURVEY §4.5). The decode math is
integer-exact on every XLA backend, so CPU results equal TPU results.
Set LIBACM_TPU_TEST_PLATFORM=tpu to run against real hardware instead.
"""

import os
import pathlib
import shutil
import subprocess
import sys

# Must happen before jax is imported anywhere.
_plat = os.environ.get("LIBACM_TPU_TEST_PLATFORM", "cpu")
if _plat == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if _plat == "cpu":
    # The env var alone does not stop an out-of-tree TPU plugin (axon) from
    # registering itself as the default backend; the config update does.
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"
GOLDENS = pathlib.Path(__file__).resolve().parent / "goldens"


def _find_ref_acmtool():
    """Compiled C reference binary, if present (live-diff tests)."""
    for cand in (os.environ.get("ACMTOOL_REF"), "/tmp/refbuild/src/acmtool"):
        if cand and os.path.exists(cand) and os.access(cand, os.X_OK):
            return cand
    return None


@pytest.fixture(scope="session")
def ref_acmtool():
    path = _find_ref_acmtool()
    if path is None:
        pytest.skip("C reference acmtool not available")
    return path


@pytest.fixture(scope="session")
def fixtures_dir():
    if not FIXTURES.exists():
        pytest.skip("fixtures not generated (run tests/make_fixtures.py)")
    return FIXTURES


@pytest.fixture(scope="session")
def goldens_dir():
    if not GOLDENS.exists():
        pytest.skip("goldens not generated (run tests/make_fixtures.py)")
    return GOLDENS
