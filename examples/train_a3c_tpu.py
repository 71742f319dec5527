# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Flagship training run: ResNet A3C at TPU scale, with eval at the end.

Usage:  python examples/train_a3c_tpu.py [num_updates]

Equivalent CLI:
    python -m rein48_tpu train --algo a3c --model resnet \
        --batch-size 8192 --unroll 32 --updates 10000 \
        --log-dir runs/a3c_tpu --checkpoint-dir ckpt/a3c_tpu
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.enable()

import jax

# Persist compiled executables locally: a relaunch of the same program
# must not pay the multi-minute remote compile again.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from rein48_tpu.train.a3c import A3CConfig, train_a3c
from rein48_tpu.train.evaluate import evaluate_policy
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

# Defaults (entropy_beta=0.01, gamma=0.99, adam 3e-4) — identical HLO to
# the profiled program, so the server-side compile cache is warm.
config = A3CConfig(batch_size=8192, unroll_len=32, model="resnet")

logger = MetricLogger(log_dir="runs/a3c_tpu")
ckpt = Checkpointer("ckpt/a3c_tpu", save_every=1000, max_to_keep=2)
state, history = train_a3c(
    config,
    num_updates=NUM_UPDATES,
    seed=0,
    log_every=25,
    logger=logger,
    checkpointer=ckpt,
)
ckpt.save(int(state.update_step), state)

model = config.make_model()
stats = evaluate_policy(
    state.params, model, num_envs=1024, num_steps=8192, seed=123, greedy=True
)
print("EVAL:", stats, flush=True)
logger.close()
