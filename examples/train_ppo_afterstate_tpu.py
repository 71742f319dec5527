# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Afterstate-critic PPO flagship run (VERDICT r4 items 1-2).

Round 4 measured the AlphaZero-style composition FAILING for the deep
family: depth-1 search over the PPO critic scored frac_2048 0.289 vs the
same checkpoint's greedy 0.651 (runs/ppo_flagship_tpu/eval_depth1.json)
— the critic is trained on post-spawn states while the planner's leaves
are pre-spawn afterstates. This run co-trains a SEPARATE afterstate
value net (train/ppo.py afterstate_critic) with TD(lambda) targets — the
n-tuple recipe (train/ntuple.py:209-251) applied to a ResNet — warm-
starting the policy from the round-4 flagship checkpoint (fine-tune lr),
then evaluates three ways:

  greedy            — the policy head alone (the 0.651 baseline row)
  after_greedy      — argmax_a [r(a) + gamma * V_after(after(s,a))]
  depth1_after      — one exact expectimax ply over V_after leaves

Done-bar: depth1_after >= greedy (the composition finally pays for
dense nets the way it pays +50% for tables).

Usage: python examples/train_ppo_afterstate_tpu.py [updates] [batch]
Artifacts: runs/ppo_afterstate_tpu/{metrics.csv,eval.json},
ckpt/ppo_afterstate_tpu/ (resumable).
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

from rein48_tpu.train.evaluate import evaluate_policy, evaluate_search
from rein48_tpu.train.ppo import PPOConfig, train_ppo
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

config = PPOConfig(
    batch_size=BATCH,
    unroll_len=32,
    model="resnet",
    gamma=0.997,
    # Fine-tune schedule: the policy arrives trained (round-4 flagship,
    # frac_2048 0.651); a fresh 3e-4 would churn it. The afterstate net
    # starts cold but converges within a few hundred updates.
    learning_rate=1.2e-4,
    lr_decay_updates=NUM_UPDATES,
    lr_final_frac=0.1,
    entropy_beta=0.003,
    entropy_beta_final=0.001,
    entropy_decay_updates=max(1, int(NUM_UPDATES * 0.8)),
    afterstate_critic=True,
    after_model="resnet",
)

# Warm start from the round-4 flagship policy unless this run already has
# its own checkpoint to resume.
own_ckpt = Checkpointer("ckpt/ppo_afterstate_tpu", save_every=500, max_to_keep=2)
warm = None
if own_ckpt.latest_step() is None:
    warm = Checkpointer("ckpt/ppo_flagship_tpu").restore_field("params")
    print("loaded round-4 flagship policy params for warm start", flush=True)

logger = MetricLogger(log_dir="runs/ppo_afterstate_tpu")
t0 = time.perf_counter()
state, history = train_ppo(
    config,
    num_updates=NUM_UPDATES,
    seed=0,
    log_every=25,
    logger=logger,
    checkpointer=own_ckpt,
    warm_start_policy=warm,
)
train_sec = time.perf_counter() - t0
own_ckpt.save(int(state.update_step), state)

model = config.make_model()
after_model = config.make_after_model()
out = {
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
        "afterstate_critic": True,
        "warm_start": "ckpt/ppo_flagship_tpu step 8000",
    },
    "protocol": "first_episode",
    "results": {},
}
os.makedirs("runs/ppo_afterstate_tpu", exist_ok=True)


def record(tag, stats):
    out["results"][tag] = stats
    with open("runs/ppo_afterstate_tpu/eval.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"EVAL {tag}:", stats, flush=True)


t0 = time.perf_counter()
stats = evaluate_policy(
    state.params["policy"],
    model,
    obs_encoding=config.obs_encoding,
    num_envs=1024,
    num_steps=16384,
    seed=123,
    protocol="first",
)
stats["wall_sec"] = round(time.perf_counter() - t0, 1)
record("greedy", stats)

t0 = time.perf_counter()
stats = evaluate_search(
    depth=0,
    num_envs=1024,
    num_steps=16384,
    seed=123,
    model=after_model,
    params=state.params["after"],
    obs_encoding=config.obs_encoding,
    gamma=config.gamma,
    reward_transform=config.reward_transform,
    protocol="first",
    launch_chunk=2048,
)
stats["wall_sec"] = round(time.perf_counter() - t0, 1)
record("after_greedy", stats)

t0 = time.perf_counter()
stats = evaluate_search(
    depth=1,
    num_envs=256,
    num_steps=16384,
    seed=123,
    model=after_model,
    params=state.params["after"],
    obs_encoding=config.obs_encoding,
    gamma=config.gamma,
    reward_transform=config.reward_transform,
    chance_chunk=4,
    protocol="first",
    launch_chunk=512,
)
stats["wall_sec"] = round(time.perf_counter() - t0, 1)
stats["num_envs"], stats["num_steps"] = 256, 16384
record("depth1_after", stats)
print("wrote runs/ppo_afterstate_tpu/eval.json", flush=True)
logger.close()
