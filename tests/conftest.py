"""Test environment: force JAX onto a virtual 8-device CPU platform so
sharding tests run without TPU hardware.

Note: this image pre-imports jax via a sitecustomize hook that registers a
TPU PJRT plugin, so setting JAX_PLATFORMS in os.environ is too late — the
platform must be overridden through jax.config before any backend
initializes.  XLA_FLAGS is still read at first backend init, so the
host-device-count flag works from here.
"""
import os

# AOT exported-module store (utils/aot.py) off by default under test:
# its digest keys on the release VERSION, not the source, so a blob
# written by an edited working tree would serve stale graph semantics
# to later test runs.  tests/test_aot.py opts back in with a tmp store.
os.environ.setdefault("GOOFER_TPU_AOT", "0")

if os.environ.get("GOOFER_TPU_TEST_PLATFORM") != "tpu":
    # default: virtual 8-CPU mesh.  Set GOOFER_TPU_TEST_PLATFORM=tpu to
    # keep the real chip (for the TPU-gated smoke tests, e.g.
    # test_pallas_pulse.py::test_pallas_compiled_on_tpu).
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # keep the persistent compilation cache OFF for the virtual-CPU
    # suite: tests drive cli.main()/the server in-process, which enable
    # the cache dir process-wide, and serializing the large universal
    # render executables on the forced-host platform aborts the
    # interpreter (SIGABRT inside compilation_cache.put_executable_
    # and_time at test_universal).  CPU compiles are fast; nothing is
    # lost.  The master switch survives cli._setup_compile_cache, which
    # only sets the cache dir.
    jax.config.update("jax_enable_compilation_cache", False)

    # XLA:CPU segfaults inside backend_compile when a large render graph
    # is compiled after enough jit/LLVM state has accumulated in one
    # process (~200+ tests; first seen at test_universal, then at
    # test_resampler as the suite grew — the same compiles succeed in a
    # fresh process and MALLOC_CHECK_ sees no heap corruption, so the
    # trigger is accumulated compiler state, not this repo's code).
    # The canonical full-suite path is tools/run_tests.sh, which bounds
    # per-process accumulation STRUCTURALLY by running the suite as four
    # fresh pytest processes.  For direct `pytest tests/` invocations,
    # keep this in-process defense: at each module boundary, if enough
    # tests have run since the last reset, drop JAX's caches.  Threshold
    # well under the ~180-test crash horizon; clearing costs only the few
    # cross-module graph recompiles (CPU compiles are fast).
    import gc

    import pytest

    _tests_since_clear = {"n": 0}

    @pytest.fixture(autouse=True)
    def _count_tests_for_compiler_reset():
        yield
        _tests_since_clear["n"] += 1

    @pytest.fixture(scope="module", autouse=True)
    def _bounded_compiler_state():
        if _tests_since_clear["n"] >= 80:
            jax.clear_caches()
            gc.collect()
            _tests_since_clear["n"] = 0
        yield
else:
    import jax

    # persistent XLA compilation cache (same one the CLI/bench use): the
    # TPU-backend oracle suite otherwise recompiles every production
    # graph from scratch each run (~45+ min on the tunnel toolchain).
    # TPU-only: enabling it for the virtual-CPU suite aborts the
    # interpreter inside the cache's executable serialization on this
    # image's forced-host platform (measured: SIGABRT at
    # compilation_cache.put_executable_and_time during test_universal).
    _cache_dir = os.path.expanduser("~/.cache/goofer_tpu/xla")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
