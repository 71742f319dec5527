# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Expectimax capability sweep over a trained n-tuple checkpoint.

Runs the greedy policy (depth 0) and the value-guided expectimax planner
(depth >= 1) on the latest ``ckpt/ntuple_tpu`` checkpoint and records the
attainment stats (frac_2048 ... frac_16384) under the unbiased
first-episode protocol (``train/evaluate.py _first_episode_rollout``).
Also times the full-state TPU restore through ``Checkpointer.restore``'s
batched host->device path — the measurement VERDICT r2 asked for.

Kept separate from ``train_ntuple_tpu.py`` because a depth-d sweep costs
~17^d x the depth-0 leaf work per env step; the training artifacts should
never wait on a planner sweep.

Usage:  python examples/eval_ntuple_tpu.py [max_depth] [num_envs] [num_steps]
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

from rein48_tpu.train.ntuple import (
    NTupleTrainConfig,
    evaluate_ntuple,
    init_ntuple,
)
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.profiling import force

MAX_DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
NUM_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20000

ckpt = Checkpointer("ckpt/ntuple_tpu")
saved = ckpt.load_config() or {}
kwargs = {}
if "tuples" in saved:  # JSON round-trips the tuple-of-tuples as lists
    kwargs["tuples"] = tuple(tuple(int(c) for c in t) for t in saved["tuples"])
for flag in ("symmetric", "tc"):
    if flag in saved:
        kwargs[flag] = saved[flag] in (True, "True")
if "batch_size" in saved:
    kwargs["batch_size"] = int(saved["batch_size"])
config = NTupleTrainConfig(**kwargs)
step = ckpt.latest_step()

# Timed full-state restore through the batched host->device path. The
# template env batch is tiny next to the ~800MB of tables; this is the
# resume path trainers use, measured end-to-end on the real chip.
t0 = time.perf_counter()
template, _ = init_ntuple(config, jax.random.key(0))
force(template.env.score)
t_init = time.perf_counter() - t0

t0 = time.perf_counter()
state = ckpt.restore(template)
t_restore_call = time.perf_counter() - t0
t0 = time.perf_counter()
force(state.params["t0"])  # fence: all transfers complete
t_restore_fence = time.perf_counter() - t0
nbytes = sum(v.nbytes for v in state.params.values())
print(
    f"checkpoint step {step}; tables: {sorted(state.params)}; "
    f"{nbytes / 1e6:.0f}MB params; init {t_init:.1f}s; "
    f"restore {t_restore_call:.1f}s + fence {t_restore_fence:.1f}s",
    flush=True,
)
params = state.params

os.makedirs("runs/ntuple_tpu", exist_ok=True)
results = {}
timings = {
    "restore_full_state_sec": round(t_restore_call + t_restore_fence, 2),
    "params_bytes": int(nbytes),
}
for depth in range(MAX_DEPTH + 1):
    # Deeper trees cost ~17x per level; shrink the sweep to compensate.
    envs = max(NUM_ENVS // (4**depth), 32)
    steps = max(NUM_STEPS // (2**depth), 1024)
    t0 = time.perf_counter()
    stats = evaluate_ntuple(
        params, config, depth=depth, num_envs=envs, num_steps=steps,
        seed=123 + depth, protocol="first",
    )
    stats["num_envs"], stats["num_steps"] = envs, steps
    stats["wall_sec"] = round(time.perf_counter() - t0, 1)
    results[f"depth{depth}"] = stats
    print(f"EVAL depth{depth} (envs={envs}, steps={steps}):", stats,
          flush=True)
    # Write incrementally: a crash in a deeper (17x costlier) sweep must
    # not lose the depths already measured.
    with open("runs/ntuple_tpu/eval.json", "w") as f:
        json.dump(
            {
                "checkpoint_step": step,
                "protocol": "first_episode",
                "timings": timings,
                "results": results,
            },
            f,
            indent=2,
        )
print("wrote runs/ntuple_tpu/eval.json", flush=True)
