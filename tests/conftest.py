"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); single-chip numerics are dtype-identical between CPU and
TPU f32 paths up to libm differences covered by the tolerances used.

The environment's sitecustomize registers an experimental TPU PJRT plugin
and pins jax to it programmatically, so setting the JAX_PLATFORMS env var is
not enough — we must override via jax.config before any backend is used.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
