# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""FLOPs accounting and MFU (model FLOPs utilization) reporting.

VERDICT r4 item 3: every perf row was steps/s or frames/s with nothing
relating the dense families to the chip's peak. This module counts the
FLOPs of a jitted program with XLA's own cost analysis (no hand-counted
conv shapes to go stale) and converts measured rates into MFU.

The reference has no performance accounting at all (SURVEY.md §6 — it
publishes no numbers); this subsystem exists because the rebuild's bar
is measured hardware utilization, not just throughput.

Conventions:
* FLOPs come from ``jax.jit(fn).lower(*args).compile().cost_analysis()``
  on whatever backend the caller runs — on CPU this is the
  pre-backend-fusion HLO count, a faithful "model FLOPs" number in the
  MFU sense (algorithmic work, not what a clever backend elides).
  Matmul/conv FLOPs dominate every net here and count identically on
  all backends.
* MFU uses the bf16 peak of the chip the run was measured on. TPU v5e:
  197 TFLOP/s bf16 per chip (the public spec; f32 on the VPU is far
  lower, but all dense compute in models/nets.py runs bf16 on the MXU).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

# Public per-chip peak dense throughput, bf16, TPU v5e.
PEAK_BF16_V5E = 197e12


def program_flops(fn: Callable, *args, **kwargs) -> float:
    """FLOPs of ONE execution of ``fn(*args, **kwargs)`` per XLA.

    Lowers and compiles for the current default backend and reads the
    compiler's cost analysis. Works for whole training steps (env
    stepping + learning fused): the returned number is the program's
    algorithmic FLOPs, the numerator of MFU.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    # jax returns either a dict or a 1-element list of dicts by version.
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return float(analysis["flops"])


def model_forward_flops(
    model: Any,
    obs_encoding: str = "onehot",
    batch: int = 256,
    train: bool = False,
) -> float:
    """Per-SAMPLE forward FLOPs of a ``models/nets.py`` module.

    Uses a ``batch``-sized forward so per-call constants amortize away;
    conv/dense FLOPs scale linearly in batch, so the division is exact
    for the terms that matter.
    """
    from rein48_tpu.engine import core
    from rein48_tpu.train import common

    boards = jnp.zeros((batch, core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8)
    obs = common.encode_obs(boards, obs_encoding)
    params = jax.eval_shape(
        lambda: model.init(jax.random.key(0), obs)["params"]
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )

    def fwd(p, o):
        return model.apply({"params": p}, o, train=train)

    return program_flops(fwd, params, obs) / batch


def train_flops_per_frame(
    forward_flops: float,
    *,
    rollout_forwards: int = 1,
    reuse_passes: int = 0,
    extra_forward_flops: float = 0.0,
    extra_reuse_passes: int = 0,
) -> float:
    """Model FLOPs consumed per environment frame by a trainer.

    Standard accounting: a backward pass costs 2x the forward, so one
    fwd+bwd optimization pass = 3 forward-equivalents.

    Args:
        forward_flops: per-sample forward FLOPs of the policy net.
        rollout_forwards: acting forwards per frame (1 for on-policy
            trainers; DQN amortizes acting over ``acting_steps``).
        reuse_passes: fwd+bwd passes per frame through the policy net
            (PPO: num_epochs — every frame is in exactly one minibatch
            per epoch; A3C: 1; DQN: updates_per_frame x (online fwd+bwd
            + target fwd / 3 ...) — compute upstream and pass here).
        extra_forward_flops: per-sample forward FLOPs of a second net
            (afterstate critic, target net, ...).
        extra_reuse_passes: fwd+bwd passes per frame through that net.
    """
    return (
        forward_flops * (rollout_forwards + 3.0 * reuse_passes)
        + extra_forward_flops * 3.0 * extra_reuse_passes
    )


def mfu(
    frames_per_sec: float,
    flops_per_frame: float,
    peak: float = PEAK_BF16_V5E,
) -> float:
    """Model FLOPs utilization in [0, 1]: achieved / peak."""
    return frames_per_sec * flops_per_frame / peak
