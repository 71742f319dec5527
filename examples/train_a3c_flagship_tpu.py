# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Serious-budget A3C run with the PPO recipe (VERDICT r4 item 7).

A3C is the reference's actual algorithm (``/root/reference/algorithm/
a3c/a3c.py``), but its recorded capability row was still round 1's
frac_2048 0.021 — trained before the horizon fix (gamma 0.997) and the
lr/entropy schedules that took PPO from 0.027 to 0.651. This run gives
the synchronous-A2C family the identical recipe and model at a serious
budget, producing the measured final word on A3C-vs-PPO: same net, same
gamma, same schedules — the only remaining difference is PPO's
clipped-surrogate epoch reuse.

Usage: python examples/train_a3c_flagship_tpu.py [num_updates] [batch]
Artifacts: runs/a3c_flagship_tpu/ (metrics.csv, eval.json),
ckpt/a3c_flagship_tpu/ (resumable).
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

from rein48_tpu.train.a3c import A3CConfig, train_a3c
from rein48_tpu.train.evaluate import evaluate_policy
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

config = A3CConfig(
    batch_size=BATCH,
    unroll_len=32,
    model="resnet",
    gamma=0.997,  # the round-4 horizon fix (reaching 2048 ~ 1000 moves)
    learning_rate=3e-4,
    lr_decay_updates=NUM_UPDATES,
    lr_final_frac=0.1,
    entropy_beta=0.01,
    entropy_beta_final=0.002,
    entropy_decay_updates=max(1, int(NUM_UPDATES * 0.8)),
)

logger = MetricLogger(log_dir="runs/a3c_flagship_tpu")
ckpt = Checkpointer("ckpt/a3c_flagship_tpu", save_every=2000, max_to_keep=2)
t0 = time.perf_counter()
state, history = train_a3c(
    config,
    num_updates=NUM_UPDATES,
    seed=0,
    log_every=50,
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
os.makedirs("runs/a3c_flagship_tpu", exist_ok=True)
with open("runs/a3c_flagship_tpu/eval.json", "w") as f:
    json.dump(
        {
            "updates": int(state.update_step),
            "train_sec": round(train_sec, 1),
            "frames": int(state.update_step) * BATCH * 32,
            "steps_per_sec": history[-1]["steps_per_sec"] if history else None,
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
print("wrote runs/a3c_flagship_tpu/eval.json", flush=True)
logger.close()
