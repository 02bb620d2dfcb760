"""Test configuration.

Forces JAX onto CPU with 8 virtual devices so all mesh/sharding tests run
on any host (mirrors the reference's server-optional design where CI runs
unit-only; see reference tests/conftest.py:12-69 for the marker system).
"""

import os

# Must happen before jax is imported anywhere. Hard-set: the ambient
# environment may point JAX at a real TPU (e.g. JAX_PLATFORMS=axon), but
# the unit suite runs on a virtual 8-device CPU mesh; real-chip tests are
# marked `tpu` and run explicitly.
if "WF_TPU_TESTS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import urllib.request

import pytest

if "WF_TPU_TESTS" not in os.environ:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var set at runtime;
    # the config API is authoritative.
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: engine/server jit compiles dominate suite
# wall time (VERDICT r1 "test suite wall time"); repeat runs reuse them.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_tests")
)
import jax as _jax  # noqa: E402

_jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SERVER_MARKERS = {"integration", "kv_cache", "stress", "benchmark"}

# Fast tier: `pytest -m smoke` — no Engine construction, no torch import,
# compiles only tiny jits. Target < 60 s on the 1-CPU host.
SMOKE_FILES = {
    "test_configs.py",
    "test_convert.py",
    "test_lifecycle_and_utils.py",
    "test_sampling.py",
    "test_logit_bias.py",
    "test_validator.py",
}


def _server_alive(url: str) -> bool:
    try:
        with urllib.request.urlopen(f"{url.rstrip('/')}/health", timeout=2) as r:
            return r.status == 200
    except Exception:
        return False


@pytest.fixture(scope="session")
def inference_url():
    """Base URL of a live server, or skip (reference conftest.py:28-41)."""
    url = os.environ.get("INFERENCE_URL", "http://127.0.0.1:30000")
    if not _server_alive(url):
        pytest.skip(f"no live inference server at {url}")
    return url


def pytest_collection_modifyitems(config, items):
    """Auto-skip server-bound tests when no live server is reachable.

    Mirrors the reference mechanism (tests/conftest.py:50-69): the same
    suite is a unit suite in CI and an E2E suite against a live backend.
    """
    for item in items:
        if os.path.basename(str(item.fspath)) in SMOKE_FILES:
            item.add_marker(pytest.mark.smoke)
    url = os.environ.get("INFERENCE_URL")
    if url and _server_alive(url):
        return
    skip = pytest.mark.skip(reason="needs live server (set INFERENCE_URL)")
    for item in items:
        if SERVER_MARKERS & set(item.keywords):
            item.add_marker(skip)


_MODULES_SEEN = [0]


@pytest.fixture(autouse=True, scope="module")
def _module_cleanup():
    """Per-module GC + periodic jax.clear_caches(): the monolithic run
    accumulates live XLA executables across ~35 modules and eventually
    SEGFAULTS inside `backend.deserialize_executable` on a compile-cache
    read (reproduced twice at the same test after ~45% of the suite;
    the same test passes standalone, so the entry is fine — the
    accumulated native state is the trigger). Scheduler-thread leaks
    are fixed at the fixture level; the cache clear keeps the live
    executable count low, and the persistent compile cache makes the
    re-compiles cheap."""
    yield
    import gc

    gc.collect()
    _MODULES_SEEN[0] += 1
    if _MODULES_SEEN[0] % 4 == 0:
        _jax.clear_caches()
        gc.collect()
