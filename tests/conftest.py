# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Test harness config: force an 8-virtual-device CPU backend.

Must run before the first ``import jax`` anywhere in the test session so the
XLA flags take effect; pytest imports conftest first, which guarantees it.
Multi-chip sharding tests run on the virtual mesh (the real environment has
a single TPU chip; the driver separately dry-runs the multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the "axon" TPU backend
# and sets jax_platforms="axon,cpu" at interpreter start, overriding the
# env var — so tests would silently run over the (slow, single-chip) TPU
# tunnel. Override the *config* after import, before any backend
# initializes: tests must run on the 8-virtual-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.default_backend() == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
