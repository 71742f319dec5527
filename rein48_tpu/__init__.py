# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""rein48-tpu: a TPU-native 2048 reinforcement-learning framework.

A ground-up JAX/XLA rebuild of the capabilities of ``nevertiree/Rein48``:
a lockstep vectorized 2048 engine (log2 boards + 65536-entry row LUT)
stepping tens of thousands of boards under ``jit``/``vmap``, on-device
batched actor-learner training (A3C, DQN, DDPG-style), gradients reduced
over ICI across a device mesh, and envs sharded across hosts of a pod
slice — with fixed-seed parity against the Python reference.
"""

__version__ = "0.1.0"

import jax as _jax

# Partitionable threefry: per-env key derivation lowers to shardable ops
# (no cross-batch gathers) so the env batch shards cleanly over a mesh.
# Set at import so tests and production generate IDENTICAL random streams.
_jax.config.update("jax_threefry_partitionable", True)

from rein48_tpu.env import Game  # noqa: F401
from rein48_tpu.spec import DEFAULT_SPEC, EnvSpec  # noqa: F401
