"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the full sharded path
(mesh, collectives, boundary handling) is exercised without a TPU pod
(SURVEY.md §4.2 "Multi-device without a cluster"). bench.py does NOT import
this and runs on the real chip.

Must run before the first `import jax` anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset "axon" (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's sitecustomize prepends the 'axon' (TPU) PJRT plugin to
# jax_platforms regardless of the env var; override after import, before any
# backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
