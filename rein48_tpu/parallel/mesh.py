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
* axis ``"tp"`` — optional tensor parallelism for wide models:
  :func:`shard_params` lays every dense/conv kernel's output-feature
  axis over "tp" (Megatron-style 1D sharding) and GSPMD propagates the
  activation shardings and inserts the collectives; every trainer
  routes its params/opt-state placement through it (replicated when
  tp=1). Proven equivalent to the unsharded update on a dp x tp CPU
  mesh in ``tests/test_parallel.py::TestTensorParallel``.

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


def param_specs(params, mesh: Mesh):
    """PartitionSpec tree for a param (or optimizer-state) pytree.

    Megatron-style 1D tensor parallelism: every ``kernel`` leaf (Flax's
    name for dense/conv weights) with rank >= 2 whose output-feature
    (last) axis divides the "tp" extent is sharded ``P(..., "tp")``;
    everything else — biases, norm scales, non-kernel state, and any
    kernel whose feature axis doesn't divide — stays replicated. GSPMD
    then propagates activation shardings through the matmuls and inserts
    the tp collectives; "dp" gradient reduction is unchanged.

    Optimizer states work through the same function because optax
    moment trees mirror the param tree (same ``.../kernel`` paths).
    With tp=1 every leaf maps to ``P()`` — exactly the replicated
    placement of a pure-dp mesh.
    """
    tp = dict(mesh.shape).get(TP_AXIS, 1)

    def spec(path, leaf):
        key = getattr(path[-1], "key", None) if path else None
        if (
            tp > 1
            and key == "kernel"
            and getattr(leaf, "ndim", 0) >= 2
            and leaf.shape[-1] % tp == 0
        ):
            return P(*([None] * (leaf.ndim - 1) + [TP_AXIS]))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place params (or opt state) per :func:`param_specs` on the mesh."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        param_specs(params, mesh),
    )


def shard_env_state(env_state, mesh: Mesh):
    """Place a batched EnvState with its batch axis over "dp".

    Every field of ``EnvState`` (boards, per-env keys, flags, accumulators)
    has the env batch as axis 0, so one spec fits all leaves.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), env_state)
