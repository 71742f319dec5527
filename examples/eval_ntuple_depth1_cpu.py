# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Depth-1 expectimax capability eval of the flagship checkpoint, on CPU.

The depth-1 program reproducibly faults this environment's TPU worker
(three crashes at identical points, including with the chunked leaf that
caps per-op gather sizes — each costing ~1h of tunnel downtime), while
depth 0 runs clean at full scale. The tree itself is backend-agnostic
pure JAX, so the depth-1 row is measured here on the host CPU instead:
slower wall-clock, identical math, zero risk to the shared TPU.

Usage: python examples/eval_ntuple_depth1_cpu.py [num_envs] [num_steps]
Writes: runs/ntuple_tpu/eval_depth1_cpu.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from rein48_tpu.train.ntuple import (
    NTupleTrainConfig,
    evaluate_ntuple,
    init_ntuple,
)
from rein48_tpu.utils.checkpoint import Checkpointer

NUM_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NUM_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

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

template, _ = init_ntuple(config, jax.random.key(0))
state = ckpt.restore(template)
step = ckpt.latest_step()
print(f"checkpoint step {step} restored on CPU", flush=True)

t0 = time.perf_counter()
stats = evaluate_ntuple(
    state.params,
    config,
    depth=1,
    num_envs=NUM_ENVS,
    num_steps=NUM_STEPS,
    seed=124,
    protocol="first",
)
stats["wall_sec"] = round(time.perf_counter() - t0, 1)
stats["num_envs"], stats["num_steps"] = NUM_ENVS, NUM_STEPS
print("EVAL depth1 (CPU):", stats, flush=True)

os.makedirs("runs/ntuple_tpu", exist_ok=True)
with open("runs/ntuple_tpu/eval_depth1_cpu.json", "w") as f:
    json.dump(
        {"checkpoint_step": step, "protocol": "first_episode",
         "backend": "cpu", "results": {"depth1": stats}},
        f,
        indent=2,
    )
print("wrote runs/ntuple_tpu/eval_depth1_cpu.json", flush=True)
