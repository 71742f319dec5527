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

Usage (both modes share the argv layout):
  python examples/eval_afterstate_depth2_tpu.py {probe|run} [envs] \
      [steps] [chance_chunk] [launch_chunk] [tag]
probe runs one launch_chunk-step launch twice (compile + steady) and
prints the ms/env-step rate plus the projected full-run wall time.
``tag`` names the checkpoint/run dir (default afterstate_td_tpu).
Writes: runs/<tag>/eval_depth2.json — progressively after every launch
chunk (lower-bound stats + ``partial: true``), so a worker crash an hour
in still leaves a citable row; the sweep stops early once every first
episode has finished.
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
TAG = sys.argv[6] if len(sys.argv) > 6 else "afterstate_td_tpu"

config = AfterstateTDConfig()
ckpt = Checkpointer(f"ckpt/{TAG}")
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

OUT_PATH = f"runs/{TAG}/eval_depth2.json"
os.makedirs(f"runs/{TAG}", exist_ok=True)
t0 = time.perf_counter()


def _write(stats, *, steps_done, partial):
    wall = time.perf_counter() - t0
    out = {
        "checkpoint_step": step_loaded,
        "depth": 2,
        "num_envs": NUM_ENVS,
        "num_steps": NUM_STEPS,
        "steps_done": steps_done,
        "partial": partial,
        "chance_chunk": CHANCE_CHUNK,
        "launch_chunk": LAUNCH_CHUNK,
        "wall_sec": round(wall, 1),
        "sec_per_move_per_env": round(wall / (steps_done * NUM_ENVS), 6),
        "results": stats,
    }
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)


progress = {"steps_done": NUM_STEPS}


def on_chunk(steps_done, stats):
    progress["steps_done"] = steps_done
    _write(stats, steps_done=steps_done, partial=True)
    print(
        f"  [{steps_done}/{NUM_STEPS}] unfinished {stats['unfinished']:.0f} "
        f"avg_score {stats['avg_score']:.0f} best {stats['best_tile']:.0f}",
        flush=True,
    )
    return stats["unfinished"] == 0.0  # all first episodes done: stop early


stats = evaluate_search(
    num_envs=NUM_ENVS, num_steps=NUM_STEPS, seed=123, on_chunk=on_chunk, **kwargs
)
wall = time.perf_counter() - t0
stats["wall_sec"] = round(wall, 1)
_write(stats, steps_done=progress["steps_done"], partial=False)
print("EVAL depth2:", stats, flush=True)
print(f"wrote {OUT_PATH}", flush=True)
