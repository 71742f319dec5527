# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Deep afterstate-TD flagship run (VERDICT r4 item 1, final leg).

Round-5 measurements so far (runs/ppo_afterstate_tpu/eval.json): the
PPO-co-trained afterstate critic improved value-guided depth-1 from
0.289 to 0.617 frac_2048 — but both after_greedy (0.293) and depth-1
still lose to the policy head (0.776), because that critic evaluates
the PPO policy, not the policy the search induces. This run closes the
loop with ON-POLICY afterstate TD (train/afterstate.py): acting IS the
depth-0 planner, V_after regresses its own greedy policy's TD(lambda)
targets — approximate policy iteration, the n-tuple recipe on the
ResNet — warm-started from the PPO run's co-trained critic.

Done-bar: after_greedy and/or depth-1 over the final V_after >= the PPO
policy head's 0.776 greedy row.

Usage: python examples/train_afterstate_td_tpu.py [updates] [batch] [tag]
Artifacts: runs/<tag>/{metrics.csv,eval.json}, ckpt/<tag>/ (tag defaults
to afterstate_td_tpu). When the PPO donor checkpoint is absent the run
trains V_after from its fresh init — still strong, slower to converge.
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

from rein48_tpu.train.afterstate import AfterstateTDConfig, train_afterstate_td
from rein48_tpu.train.evaluate import evaluate_search
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
TAG = sys.argv[3] if len(sys.argv) > 3 else "afterstate_td_tpu"

config = AfterstateTDConfig(
    batch_size=BATCH,
    unroll_len=32,
    model="resnet",
    gamma=0.997,
    td_lambda=0.7,
    learning_rate=1e-4,
    lr_decay_updates=NUM_UPDATES,
    lr_final_frac=0.1,
    num_epochs=2,
    num_minibatches=4,
)

own_ckpt = Checkpointer(f"ckpt/{TAG}", save_every=500, max_to_keep=2)
warm = None
warm_src = "none (fresh init)"
if own_ckpt.latest_step() is None:
    try:
        donor = Checkpointer("ckpt/ppo_afterstate_tpu").restore_field("params")
        warm = donor["after"]
        warm_src = "ckpt/ppo_afterstate_tpu params['after']"
        print("warm start: ppo_afterstate co-trained critic", flush=True)
    except FileNotFoundError:
        print("no donor checkpoint; training V_after from fresh init", flush=True)

logger = MetricLogger(log_dir=f"runs/{TAG}")
t0 = time.perf_counter()
state, history = train_afterstate_td(
    config,
    num_updates=NUM_UPDATES,
    seed=0,
    log_every=25,
    logger=logger,
    checkpointer=own_ckpt,
    warm_start_params=warm,
)
train_sec = time.perf_counter() - t0
own_ckpt.save(int(state.update_step), state)

model = config.make_model()
out = {
    "updates": int(state.update_step),
    "train_sec": round(train_sec, 1),
    "frames": int(state.update_step) * BATCH * 32,
    "steps_per_sec": history[-1]["steps_per_sec"] if history else None,
    "config": {
        "batch_size": BATCH,
        "gamma": config.gamma,
        "td_lambda": config.td_lambda,
        "lr": config.learning_rate,
        "warm_start": warm_src,
    },
    "protocol": "first_episode",
    "results": {},
}
os.makedirs(f"runs/{TAG}", exist_ok=True)


def record(tag, stats):
    out["results"][tag] = stats
    with open(f"runs/{TAG}/eval.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"EVAL {tag}:", stats, flush=True)


t0 = time.perf_counter()
stats = evaluate_search(
    depth=0,
    num_envs=1024,
    num_steps=16384,
    seed=123,
    model=model,
    params=state.params,
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
    model=model,
    params=state.params,
    obs_encoding=config.obs_encoding,
    gamma=config.gamma,
    reward_transform=config.reward_transform,
    chance_chunk=4,
    protocol="first",
    launch_chunk=512,
)
stats["wall_sec"] = round(time.perf_counter() - t0, 1)
stats["num_envs"], stats["num_steps"] = 256, 16384
record("depth1", stats)
print(f"wrote runs/{TAG}/eval.json", flush=True)
logger.close()
