# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Test harness config: force an 8-virtual-device CPU backend.

Must run before the first ``import jax`` anywhere in the test session so the
XLA flags take effect; pytest imports conftest first, which guarantees it.
Multi-chip sharding tests run on the virtual mesh (the real environment has
a single TPU chip; the driver separately dry-runs the multi-chip path).
"""

import faulthandler
import os

# The full suite finishes in ~11-14 min on this 2-vCPU box; rare runs
# (2 of ~6 this round) deadlocked mid-suite inside XLA:CPU collectives
# with every thread futex-parked — an oversubscription flake, not a test
# bug (the identical run passes when repeated). Convert an infinite hang
# into a stack-dumped failure at 3x the worst observed runtime.
faulthandler.dump_traceback_later(2700, exit=True)

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
