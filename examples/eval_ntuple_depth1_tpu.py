# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Depth-1 expectimax eval of the flagship checkpoint ON THE TPU.

Round 3's fully-fused depth-1 program reproducibly faulted this
environment's TPU worker (three identical crashes; the row was measured
on CPU instead — runs/ntuple_tpu/eval_depth1_cpu.json). This driver
retries on-chip with the chance-chunked tree (``search._value_chance``
``chance_chunk``): the 32-way spawn expansion runs through ``lax.map``
in groups of ``CHUNK`` children, so the per-step leaf stream is
``B * 4 * CHUNK * 4`` boards (CHUNK=4, B=256: 16k boards = 512k gather
elements per table-map-step) instead of the fused 131k boards / 4.2M
elements — inside the envelope the trainer exercises continuously.
Escalation protocol: a tiny probe sweep first (cheap to lose), then the
full row; results are written incrementally.

Usage: python examples/eval_ntuple_depth1_tpu.py [num_envs] [num_steps] [chunk]
Writes: runs/ntuple_tpu/eval_depth1_tpu.json
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

NUM_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NUM_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 4
# Host-side launch chunking: the worker dies under single launches that
# run many minutes (round-4 finding), so the sweep runs as short
# launches with the carry threaded on-device.
LAUNCH_CHUNK = int(sys.argv[4]) if len(sys.argv) > 4 else 512

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
step = ckpt.latest_step()

template, _ = init_ntuple(config, jax.random.key(0))
force(template.env.score)
t0 = time.perf_counter()
state = ckpt.restore(template)
force(state.params["t0"])
print(
    f"checkpoint step {step} restored on TPU in "
    f"{time.perf_counter() - t0:.1f}s",
    flush=True,
)
params = state.params

os.makedirs("runs/ntuple_tpu", exist_ok=True)
out = {
    "checkpoint_step": step,
    "protocol": "first_episode",
    "backend": "tpu",
    "chance_chunk": CHUNK,
    "results": {},
}


def record(tag, stats):
    out["results"][tag] = stats
    with open("runs/ntuple_tpu/eval_depth1_tpu.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"EVAL {tag}:", stats, flush=True)


# Probe sweep: tiny scale, short horizon — if the worker is going to
# fault, lose 2 minutes, not the row.
t0 = time.perf_counter()
probe = evaluate_ntuple(
    params, config, depth=1, num_envs=32, num_steps=512,
    seed=321, protocol="window", chance_chunk=CHUNK,
)
probe["wall_sec"] = round(time.perf_counter() - t0, 1)
record("probe_depth1", probe)

# The real row: the CPU-measured protocol (eval_depth1_cpu.json) at
# full scale, on the chip.
t0 = time.perf_counter()
stats = evaluate_ntuple(
    params, config, depth=1, num_envs=NUM_ENVS, num_steps=NUM_STEPS,
    seed=124, protocol="first", chance_chunk=CHUNK,
    launch_chunk=LAUNCH_CHUNK,
)
stats["wall_sec"] = round(time.perf_counter() - t0, 1)
stats["num_envs"], stats["num_steps"] = NUM_ENVS, NUM_STEPS
record("depth1", stats)
print("wrote runs/ntuple_tpu/eval_depth1_tpu.json", flush=True)
