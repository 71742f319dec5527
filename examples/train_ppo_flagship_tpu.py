# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Serious-budget PPO flagship run on one TPU chip (VERDICT r3 item 4).

The round-3 PPO row (runs/ppo_tpu/eval.json: 1200 updates, 13.4 min,
frac_2048 0.027) proved the trainer learns on hardware; this run gives
the actor-critic family a real budget — ~1.5h of chip time, B=8192,
gamma pushed to 0.997 (reaching 2048 takes ~1000 moves; gamma=0.99's
~100-step horizon caps how far ahead the critic can value), cosine lr
decay and entropy anneal so the policy can converge instead of churning.

Usage:  python examples/train_ppo_flagship_tpu.py [num_updates] [batch_size]

Artifacts: runs/ppo_flagship_tpu/ (metrics.csv, eval.json),
ckpt/ppo_flagship_tpu/ (resumable; save_every=1000).
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

from rein48_tpu.train.evaluate import evaluate_policy
from rein48_tpu.train.ppo import PPOConfig, train_ppo
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

config = PPOConfig(
    batch_size=BATCH,
    unroll_len=32,
    model="resnet",
    gamma=0.997,
    lr_decay_updates=NUM_UPDATES,
    lr_final_frac=0.1,
    entropy_beta=0.01,
    entropy_beta_final=0.002,
    entropy_decay_updates=max(1, int(NUM_UPDATES * 0.8)),
)

logger = MetricLogger(log_dir="runs/ppo_flagship_tpu")
ckpt = Checkpointer("ckpt/ppo_flagship_tpu", save_every=1000, max_to_keep=2)
t0 = time.perf_counter()
state, history = train_ppo(
    config,
    num_updates=NUM_UPDATES,
    seed=0,
    log_every=25,
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
    num_steps=16384,
    seed=123,
    protocol="first",
)
print("EVAL:", stats, flush=True)
os.makedirs("runs/ppo_flagship_tpu", exist_ok=True)
with open("runs/ppo_flagship_tpu/eval.json", "w") as f:
    json.dump(
        {
            "updates": int(state.update_step),
            "train_sec": round(train_sec, 1),
            "frames": int(state.update_step) * BATCH * 32,
            "steps_per_sec": (
                history[-1]["steps_per_sec"] if history else None
            ),
            "config": {
                "batch_size": BATCH,
                "gamma": config.gamma,
                "lr": config.learning_rate,
                "lr_decay_updates": config.lr_decay_updates,
                "entropy": [config.entropy_beta, config.entropy_beta_final],
            },
            "protocol": "first_episode",
            "eval": stats,
        },
        f,
        indent=2,
    )
print("wrote runs/ppo_flagship_tpu/eval.json", flush=True)
logger.close()
