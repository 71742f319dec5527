# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Flagship-scale DQN run on one TPU chip, with first-episode eval.

VERDICT r2 item 6: DQN (the working realization of the reference's dead
DDPG/replay lineage, /root/reference/algorithm/ddpg/ddpg.py:12) had CPU
tests only — this records its TPU learning run (runs/dqn_tpu/) and
capability row for BASELINE.md.

Usage:  python examples/train_dqn_tpu.py [num_updates] [num_envs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.enable()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from rein48_tpu.train.dqn import DQNConfig, train_dqn
from rein48_tpu.train.evaluate import evaluate_policy
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

# BASELINE config #3: DQN, CNN-class net, on-device replay, 4k envs, one
# chip. acting_steps=4 keeps the replay growing 4 transitions/env/update.
config = DQNConfig(
    num_envs=NUM_ENVS,
    model="resnet",
    acting_steps_per_update=4,
    epsilon_decay_steps=50_000_000,
)

logger = MetricLogger(log_dir="runs/dqn_tpu")
ckpt = Checkpointer("ckpt/dqn_tpu", save_every=1000, max_to_keep=2)
t0 = time.perf_counter()
state, history = train_dqn(
    config,
    num_updates=NUM_UPDATES,
    seed=0,
    log_every=20,
    logger=logger,
    checkpointer=ckpt,
)
train_sec = time.perf_counter() - t0
ckpt.save(int(state.update_step), state)

model = config.make_model()
stats = evaluate_policy(
    state.params,
    model,
    obs_encoding=config.obs_encoding,
    num_envs=1024,
    num_steps=8192,
    seed=123,
    protocol="first",
)
print("EVAL:", stats, flush=True)
os.makedirs("runs/dqn_tpu", exist_ok=True)
with open("runs/dqn_tpu/eval.json", "w") as f:
    json.dump(
        {
            "updates": int(state.update_step),
            "train_sec": round(train_sec, 1),
            "steps_per_sec": (
                history[-1]["steps_per_sec"] if history else None
            ),
            "protocol": "first_episode",
            "eval": stats,
        },
        f,
        indent=2,
    )
print("wrote runs/dqn_tpu/eval.json", flush=True)
logger.close()
