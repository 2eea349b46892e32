"""Test configuration: force CPU with a virtual 8-device mesh, enable x64.

Mirrors the reference's CI strategy of testing distributed behaviour on a
single host (SURVEY.md §4): multi-chip sharding is exercised on virtual CPU
devices via ``xla_force_host_platform_device_count``.

Note: the environment may pre-import JAX (sitecustomize registering a TPU
backend) before this file runs, so ``os.environ['JAX_PLATFORMS']`` would be
ignored — we must go through ``jax.config`` instead, before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# opt in to the engine's in-sweep numerical self-checks for THIS repo's
# suite only (downstream users' pytest runs are unaffected — the simulator
# gates on this variable, not on the generic PYTEST_CURRENT_TEST)
os.environ["PYTDSCF_TPU_SELFCHECK"] = "1"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound XLA:CPU compile-cache growth over the full suite (each module
    traces many distinct shapes; clearing between modules keeps the
    single-process suite lean)."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _clear_jax_caches_each_test(request):
    """Suite-wide policy for the XLA:CPU accumulated-compilation crash.

    KNOWN UPSTREAM ISSUE (no external tracker reachable from this
    environment — documented here as the single source of truth):
    XLA:CPU's in-process JIT can segfault deterministically in
    ``backend_compile_and_load`` after many accumulated compilations in
    one process.  Reproducer: run ``tests/test_adaptive.py`` solo with
    this policy disabled — the 4th test crashes compiling its programs
    on top of the accumulated code heap.  Mitigation: modules whose
    tests trace many distinct shapes mark themselves with
    ``@pytest.mark.clear_jax_caches`` (module-level ``pytestmark``) and
    get a per-TEST cache clear; everything else keeps the cheaper
    per-module clear above."""
    yield
    if request.node.get_closest_marker("clear_jax_caches"):
        jax.clear_caches()
