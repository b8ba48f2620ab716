"""Test environment: force JAX onto a virtual 8-device CPU platform so
sharding tests run without TPU hardware.

Note: this image pre-imports jax via a sitecustomize hook that registers a
TPU PJRT plugin, so setting JAX_PLATFORMS in os.environ is too late — the
platform must be overridden through jax.config before any backend
initializes.  XLA_FLAGS is still read at first backend init, so the
host-device-count flag works from here.
"""
import os

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
