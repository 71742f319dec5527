# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Depth-2 expectimax over the flagship n-tuple network (VERDICT r4 item 3).

Depth 2 expands 16,384 leaves per board (control/search.py:19) — exact
expectimax two spawns + two moves ahead. The machinery that made depth 1
TPU-safe composes: chance chunking serializes BOTH chance levels through
lax.map (search._value_chance recurses the chunk size), and launch
chunking keeps every jit launch far under the ~6-8 min worker kill
(BASELINE.md round 4). Cost scales 32x over depth 1 per env-step, so the
row runs fewer envs: each env still contributes one unbiased first
episode.

Usage:
  python examples/eval_ntuple_depth2_tpu.py probe [num_envs]
      two launches at probe scale -> projected wall-clock per 1k steps
  python examples/eval_ntuple_depth2_tpu.py run [num_envs] [num_steps] \
      [chance_chunk] [launch_chunk]
      full row -> runs/ntuple_tpu/eval_depth2.json

The checkpoint is the round-4 extended flagship (ckpt/ntuple_tpu).
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

MODE = sys.argv[1] if len(sys.argv) > 1 else "probe"
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else (8 if MODE == "probe" else 32)
NUM_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20480
CHANCE_CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 8
LAUNCH_CHUNK = int(sys.argv[5]) if len(sys.argv) > 5 else 128

# Restore exactly as the proven depth-1 driver does: rebuild the config
# from the persisted train_config, restore the FULL state through the
# template path (ONE batched device_put — orbax's direct placement
# serializes pathologically over this tunnel, BASELINE.md round 3).
ckpt = Checkpointer("ckpt/ntuple_tpu")
saved = ckpt.load_config() or {}
kwargs = {}
if "tuples" in saved:
    kwargs["tuples"] = tuple(tuple(int(c) for c in t) for t in saved["tuples"])
for flag in ("symmetric", "tc"):
    if flag in saved:
        kwargs[flag] = saved[flag] in (True, "True")
if "batch_size" in saved:
    kwargs["batch_size"] = int(saved["batch_size"])
config = NTupleTrainConfig(**kwargs)
step_loaded = ckpt.latest_step()
template, _ = init_ntuple(config, jax.random.key(0))
force(template.env.score)
t0 = time.perf_counter()
state = ckpt.restore(template)
force(state.params["t0"])
params = state.params
print(
    f"restored n-tuple checkpoint step {step_loaded} in "
    f"{time.perf_counter() - t0:.1f}s",
    flush=True,
)

if MODE == "probe":
    # Two short launches: the first includes compile, the second is the
    # steady-state cost. Projection sizes the real run.
    for tag, steps in (("compile+run", LAUNCH_CHUNK), ("steady", LAUNCH_CHUNK)):
        t0 = time.perf_counter()
        stats = evaluate_ntuple(
            params,
            config,
            depth=2,
            num_envs=NUM_ENVS,
            num_steps=steps,
            seed=99,
            protocol="first",
            chance_chunk=CHANCE_CHUNK,
            launch_chunk=LAUNCH_CHUNK,
        )
        dt = time.perf_counter() - t0
        per_env_step = dt / (steps * NUM_ENVS)
        print(
            f"PROBE {tag}: {NUM_ENVS} envs x {steps} steps in {dt:.1f}s "
            f"({1e6 * per_env_step:.1f} us/env-step; a {NUM_ENVS}x{NUM_STEPS} "
            f"run would take ~{per_env_step * NUM_ENVS * NUM_STEPS / 60:.0f} min)",
            flush=True,
        )
    sys.exit(0)

t0 = time.perf_counter()
stats = evaluate_ntuple(
    params,
    config,
    depth=2,
    num_envs=NUM_ENVS,
    num_steps=NUM_STEPS,
    seed=123,
    protocol="first",
    chance_chunk=CHANCE_CHUNK,
    launch_chunk=LAUNCH_CHUNK,
)
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
os.makedirs("runs/ntuple_tpu", exist_ok=True)
with open("runs/ntuple_tpu/eval_depth2.json", "w") as f:
    json.dump(out, f, indent=2)
print("EVAL depth2:", stats, flush=True)
print("wrote runs/ntuple_tpu/eval_depth2.json", flush=True)
