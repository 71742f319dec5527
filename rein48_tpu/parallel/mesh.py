# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Mesh construction and canonical shardings.

The reference's entire "distributed runtime" is one Python thread per CPU
core mutating a shared TF1 graph (``/root/reference/algorithm/a3c/a3c.py:
16-17,286-292``). The TPU-native replacement is SPMD over a
``jax.sharding.Mesh``:

* axis ``"dp"`` — data parallelism: the env batch (and replay/rollout
  batches) shard along it; gradient reduction rides ICI via the
  ``psum``s XLA inserts for replicated params.
* axis ``"tp"`` — optional tensor parallelism for wide models: Flax
  partitioning annotations map feature axes here (trivial at the
  reference's model sizes, present so the same code scales).

On a multi-host pod slice the same mesh spans all hosts'
``jax.devices()`` (see ``parallel/multihost.py``); env-batch collectives
stay on ICI because "dp" is laid out innermost across a host's chips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh shape; ``dp=None`` means "all remaining devices"."""

    dp: Optional[int] = None
    tp: int = 1


def make_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ``(dp, tp)`` mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    tp = config.tp
    dp = config.dp if config.dp is not None else len(devices) // tp
    if dp * tp != len(devices):
        raise ValueError(
            f"mesh {dp}x{tp} != {len(devices)} devices; pass devices or fix shape"
        )
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over "dp" (env batch, rollout batch, replay)."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_env_state(env_state, mesh: Mesh):
    """Place a batched EnvState with its batch axis over "dp".

    Every field of ``EnvState`` (boards, per-env keys, flags, accumulators)
    has the env batch as axis 0, so one spec fits all leaves.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), env_state)
