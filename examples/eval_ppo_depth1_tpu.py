# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Value-guided depth-1 eval of the flagship PPO checkpoint (TPU).

VERDICT r3 item 4's second half: evaluate the actor-critic family both
greedy AND with one ply of exact expectimax over its own critic (the
AlphaZero-style composition, ``control/search.py``). Uses the
chance-chunked tree — the TPU-safe depth-1 shape.

Usage: python examples/eval_ppo_depth1_tpu.py [num_envs] [num_steps] [chunk]
Writes: runs/ppo_flagship_tpu/eval_depth1.json
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

from rein48_tpu.train.evaluate import evaluate_search
from rein48_tpu.train.ppo import PPOConfig, init_ppo
from rein48_tpu.utils.checkpoint import Checkpointer

NUM_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NUM_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 4
LAUNCH_CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 512

ckpt = Checkpointer("ckpt/ppo_flagship_tpu")
saved = ckpt.load_config() or {}
config = PPOConfig(
    batch_size=int(saved.get("batch_size", 8192)),
    model=saved.get("model", "resnet"),
    gamma=float(saved.get("gamma", 0.997)),
    reward_transform=saved.get("reward_transform", "log2"),
    obs_encoding=saved.get("obs_encoding", "onehot"),
)
state, model, _ = init_ppo(config, jax.random.key(0))
state = ckpt.restore(state)
print(f"restored PPO checkpoint step {int(state.update_step)}", flush=True)

out = {"checkpoint_step": int(state.update_step), "results": {}}
os.makedirs("runs/ppo_flagship_tpu", exist_ok=True)


def record(tag, stats):
    out["results"][tag] = stats
    with open("runs/ppo_flagship_tpu/eval_depth1.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"EVAL {tag}:", stats, flush=True)


# Cheap probe first (a crash loses 2 minutes, not the row).
t0 = time.perf_counter()
probe = evaluate_search(
    depth=1, num_envs=32, num_steps=256, seed=77,
    model=model, params=state.params,
    obs_encoding=config.obs_encoding, gamma=config.gamma,
    reward_transform=config.reward_transform,
    chance_chunk=CHUNK, protocol="window",
)
probe["wall_sec"] = round(time.perf_counter() - t0, 1)
# Not a capability measurement: a 256-step window completes ~no episodes
# (all-zero fracs). Labeled so tooling readers can't mistake it (VERDICT
# r4 weak item 4).
probe["probe"] = True
record("probe", probe)

t0 = time.perf_counter()
stats = evaluate_search(
    depth=1, num_envs=NUM_ENVS, num_steps=NUM_STEPS, seed=123,
    model=model, params=state.params,
    obs_encoding=config.obs_encoding, gamma=config.gamma,
    reward_transform=config.reward_transform,
    chance_chunk=CHUNK, protocol="first", launch_chunk=LAUNCH_CHUNK,
)
stats["wall_sec"] = round(time.perf_counter() - t0, 1)
stats["num_envs"], stats["num_steps"] = NUM_ENVS, NUM_STEPS
record("depth1_value_guided", stats)
print("wrote runs/ppo_flagship_tpu/eval_depth1.json", flush=True)
