# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""DQN with n-step returns + long-horizon gamma (VERDICT r4 item 6).

The round-4 DQN row (runs/dqn_tpu/eval.json: frac_1024 0.350, frac_2048
0.012) was a pure 1-step double-DQN at gamma 0.99 — for 2048's ~1000-move
credit horizon a 1-step backup propagates value one move per update, the
known weak link of the replay family here. This rerun applies the two
horizon fixes together, at round-4 wall-clock:

* n_step=5 chains from the circular buffer's strided layout
  (``agents/replay.py::replay_sample_nstep``) — 5 moves of credit per
  backup;
* gamma 0.997 — the fix that took PPO from 0.027 to 0.651 (BASELINE.md
  round 4).

Usage:  python examples/train_dqn_nstep_tpu.py [num_updates] [num_envs]
Writes: runs/dqn_r5_tpu/eval.json, ckpt/dqn_tpu_r5/.
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
N_STEP = int(sys.argv[3]) if len(sys.argv) > 3 else 5
GAMMA = float(sys.argv[4]) if len(sys.argv) > 4 else 0.997
HUBER = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0
TAG = sys.argv[6] if len(sys.argv) > 6 else "dqn_r5_tpu"

config = DQNConfig(
    num_envs=NUM_ENVS,
    model="resnet",
    acting_steps_per_update=2,
    epsilon_decay_steps=10_000_000,
    epsilon_end=0.03,
    n_step=N_STEP,
    gamma=GAMMA,
    huber_delta=HUBER,
)

logger = MetricLogger(log_dir=f"runs/{TAG}")
ckpt = Checkpointer(f"ckpt/{TAG}", save_every=2000, max_to_keep=2)
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
os.makedirs(f"runs/{TAG}", exist_ok=True)
with open(f"runs/{TAG}/eval.json", "w") as f:
    json.dump(
        {
            "updates": int(state.update_step),
            "train_sec": round(train_sec, 1),
            "steps_per_sec": history[-1]["steps_per_sec"] if history else None,
            "config": {
                "num_envs": NUM_ENVS,
                "acting_steps_per_update": config.acting_steps_per_update,
                "epsilon_decay_steps": config.epsilon_decay_steps,
                "epsilon_end": config.epsilon_end,
                "n_step": config.n_step,
                "gamma": config.gamma,
                "huber_delta": config.huber_delta,
            },
            "protocol": "first_episode",
            "eval": stats,
        },
        f,
        indent=2,
    )
print(f"wrote runs/{TAG}/eval.json", flush=True)
logger.close()
