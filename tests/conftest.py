"""Test configuration: run everything on a virtual 8-device CPU mesh.

This mirrors the strategy described in SURVEY.md §4: multi-device sharding is
validated on CPU via --xla_force_host_platform_device_count without needing a
pod slice.  The environment's sitecustomize pre-registers an accelerator
backend and forces jax_platforms; we override the config back to CPU before
any backend is initialised (backend init is lazy, so this works even though
jax was already imported at interpreter start).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
