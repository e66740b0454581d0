"""Test harness config (SURVEY §4.4).

Tests run hermetically on the CPU backend with 8 virtual devices so the
8-way SPMD semantics of config 5 are exercised without TPU hardware; the
real-chip performance path is covered by bench.py, not pytest.

NOTE this environment exports JAX_PLATFORMS=axon, and the axon plugin
re-asserts itself over an env-var override — only
``jax.config.update('jax_platforms', ...)`` AFTER import reliably wins.
XLA_FLAGS must still be set before the CPU client is first created.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}"
