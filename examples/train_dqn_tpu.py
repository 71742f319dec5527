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

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

# BASELINE config #3: DQN, CNN-class net, on-device replay, 4k envs, one
# chip. Round-3 lesson (VERDICT r3 weak 2): the recorded run sized the
# epsilon anneal to the whole budget (50M decay over a 49M-frame run),
# so the policy explored at eps >= 0.066 for its entire life and the
# eval row barely learned (frac_1024 0.003). Tuned: the anneal finishes
# in the first ~10% of the run (10M of ~98M frames), the floor is lower
# (0.03), and acting_steps=2 doubles the replay ratio (each update
# trains on 8192 samples per 8192 new frames instead of per 16384).
config = DQNConfig(
    num_envs=NUM_ENVS,
    model="resnet",
    acting_steps_per_update=2,
    epsilon_decay_steps=10_000_000,
    epsilon_end=0.03,
)

logger = MetricLogger(log_dir="runs/dqn_tpu")
# Fresh checkpoint dir per tuning generation: auto-resume would
# otherwise silently continue the round-3 run under the old anneal.
ckpt = Checkpointer("ckpt/dqn_tpu_r4", save_every=2000, max_to_keep=2)
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
            "config": {
                "num_envs": NUM_ENVS,
                "acting_steps_per_update": config.acting_steps_per_update,
                "epsilon_decay_steps": config.epsilon_decay_steps,
                "epsilon_end": config.epsilon_end,
            },
            "protocol": "first_episode",
            "eval": stats,
        },
        f,
        indent=2,
    )
print("wrote runs/dqn_tpu/eval.json", flush=True)
logger.close()
