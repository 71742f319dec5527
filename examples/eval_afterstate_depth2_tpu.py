# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Depth-2 expectimax over the deep afterstate-TD net (VERDICT r4 item 3).

The depth-1 row over this net is the framework's best agent (avg 259k,
frac_2048 1.000, frac_16384 0.586, best 32768 —
runs/afterstate_td_tpu/eval.json); this driver pushes the exact tree
one ply deeper: 16,384 ResNet leaf evaluations per board per move
(control/search.py:19). ResNet leaves are MXU-dense, so depth 2 is
FASTER per leaf than the n-tuple's gather-bound tables — the measured
depth-1 eval ran 2.7M leaf-forwards/s; at that rate a 32-env depth-2
sweep is ~1 hour. Chance chunking serializes both spawn levels
(search._value_chance recurses the chunk) and launch chunking keeps
every launch far under the worker's ~6-8 min kill threshold.

Usage:
  python examples/eval_afterstate_depth2_tpu.py probe [envs] [launch]
  python examples/eval_afterstate_depth2_tpu.py run [envs] [steps] \
      [chance_chunk] [launch_chunk]
Writes: runs/afterstate_td_tpu/eval_depth2.json
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

from rein48_tpu.train.afterstate import AfterstateTDConfig
from rein48_tpu.train.evaluate import evaluate_search
from rein48_tpu.utils.checkpoint import Checkpointer

MODE = sys.argv[1] if len(sys.argv) > 1 else "probe"
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if MODE == "probe" else 32)
NUM_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
CHANCE_CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 8
LAUNCH_CHUNK = int(sys.argv[5]) if len(sys.argv) > 5 else 128

config = AfterstateTDConfig()
ckpt = Checkpointer("ckpt/afterstate_td_tpu")
params = jax.device_put(ckpt.restore_field("params"))
step_loaded = ckpt.latest_step()
print(f"restored afterstate-TD checkpoint step {step_loaded}", flush=True)

model = config.make_model()
kwargs = dict(
    depth=2,
    model=model,
    params=params,
    obs_encoding=config.obs_encoding,
    gamma=config.gamma,
    reward_transform=config.reward_transform,
    chance_chunk=CHANCE_CHUNK,
    protocol="first",
    launch_chunk=LAUNCH_CHUNK,
)

if MODE == "probe":
    for tag in ("compile+run", "steady"):
        t0 = time.perf_counter()
        evaluate_search(num_envs=NUM_ENVS, num_steps=LAUNCH_CHUNK, seed=99, **kwargs)
        dt = time.perf_counter() - t0
        per = dt / (LAUNCH_CHUNK * NUM_ENVS)
        print(
            f"PROBE {tag}: {NUM_ENVS} envs x {LAUNCH_CHUNK} steps in {dt:.1f}s "
            f"({1e3 * per:.2f} ms/env-step; {NUM_ENVS}x{NUM_STEPS} "
            f"~{per * NUM_ENVS * NUM_STEPS / 60:.0f} min)",
            flush=True,
        )
    sys.exit(0)

t0 = time.perf_counter()
stats = evaluate_search(num_envs=NUM_ENVS, num_steps=NUM_STEPS, seed=123, **kwargs)
wall = time.perf_counter() - t0
stats["wall_sec"] = round(wall, 1)
out = {
    "checkpoint_step": step_loaded,
    "depth": 2,
    "num_envs": NUM_ENVS,
    "num_steps": NUM_STEPS,
    "chance_chunk": CHANCE_CHUNK,
    "launch_chunk": LAUNCH_CHUNK,
    "sec_per_move_per_env": round(wall / (NUM_STEPS * NUM_ENVS), 6),
    "results": stats,
}
os.makedirs("runs/afterstate_td_tpu", exist_ok=True)
with open("runs/afterstate_td_tpu/eval_depth2.json", "w") as f:
    json.dump(out, f, indent=2)
print("EVAL depth2:", stats, flush=True)
print("wrote runs/afterstate_td_tpu/eval_depth2.json", flush=True)
