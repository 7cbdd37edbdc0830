"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (row-sharded embedding tables, data-parallel
pjit) are exercised in CI without TPUs by spoofing 8 host-platform devices,
per SURVEY.md section 4.

Note: the environment may pre-register an accelerator backend via
sitecustomize before conftest runs, so setting JAX_PLATFORMS env alone is
not enough — we update jax.config directly (allowed any time before the
backend is first used).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
