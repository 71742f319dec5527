# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Capability run: full 4x6-tuple afterstate-TD network on one TPU chip.

Usage:  python examples/train_ntuple_tpu.py [num_updates] [batch_size] [mode]

``mode`` is "delayed" (default — windowed TD, the TPU-fast path) or
"step" (classic per-step TD; ~116k steps/s on a v5e chip because every
step pays an argsort + scatter against the tables).

Equivalent CLI:
    python -m rein48_tpu train --algo ntuple --update-mode delayed \
        --batch-size 4096 --unroll 128 --updates 2000 \
        --log-dir runs/ntuple_tpu --checkpoint-dir ckpt/ntuple_tpu
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.enable()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from rein48_tpu.train.ntuple import (
    NTupleTrainConfig,
    evaluate_ntuple,
    train_ntuple,
)
from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
MODE = sys.argv[3] if len(sys.argv) > 3 else "delayed"

config = NTupleTrainConfig(
    batch_size=BATCH, steps_per_update=128, update_mode=MODE
)

logger = MetricLogger(log_dir="runs/ntuple_tpu")
# Saves (device->host) cost ~25-40s for the ~800MB state; every 500
# updates keeps the overhead <10% at B=1024 while bounding crash loss
# to ~6 min.
ckpt = Checkpointer("ckpt/ntuple_tpu", save_every=500, max_to_keep=2)
state, history = train_ntuple(
    config,
    num_updates=NUM_UPDATES,
    seed=0,
    log_every=20,
    logger=logger,
    checkpointer=ckpt,
)
ckpt.save(int(state.update_step), state)

# Quick in-process capability check with the live device params. The
# authoritative eval artifact (depth sweep + timed 805MB restore — 10.7s
# through Checkpointer.restore's batched host->device path) is written
# by examples/eval_ntuple_tpu.py from the saved checkpoint.
import json

results = {}
for depth, envs, steps in ((0, 1024, 16384), (1, 256, 16384)):
    # chance_chunk + launch_chunk: the worker dies under multi-minute
    # single launches (round-4 finding), and depth>=1 needs the chunked
    # chance expansion; both are mathematically identical.
    stats = evaluate_ntuple(
        state.params, config, depth=depth, num_envs=envs, num_steps=steps,
        seed=123 + depth, protocol="first",
        chance_chunk=4 if depth else None, launch_chunk=1024 if depth else 4096,
    )
    results[f"depth{depth}"] = stats
    print(f"EVAL depth{depth} (envs={envs}, steps={steps}):", stats,
          flush=True)
with open("runs/ntuple_tpu/eval.json", "w") as f:
    json.dump({"checkpoint_step": int(state.update_step),
               "results": results}, f, indent=2)
print("wrote runs/ntuple_tpu/eval.json", flush=True)
logger.close()
