# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Run the ACTUAL reference A3C (/root/reference/algorithm/a3c/a3c.py).

The reference cannot run unmodified: its env import is stale
(``a3c.py:8`` names ``game.game_cli``; the module is ``game/GameClient.py``)
and it is written against TF1 APIs including the long-removed
``tf.contrib.layers.xavier_initializer`` (``a3c.py:138``). This harness
supplies exactly the missing glue — a module alias for the stale import
and a ``tf.compat.v1`` + contrib-xavier shim — and then drives the
reference's own classes through the same construction sequence as its
``__main__`` block (``a3c.py:259-295``): Session, RMSProp opts,
GlobalAgent singleton, one Worker(+LocalAgent) per thread, Coordinator
join. No reference code is modified or copied; the reference modules are
imported from /root/reference and run as-is.

Output: runs/a3c_reference/scores.json — the reference's own SCORE list
(``np.sum(state)`` per episode, ``a3c.py:214``), i.e. its real learning
curve under its real training budget (MAX_EPISODE_TIME=10000 global env
steps, ``a3c.py:18,192,212``). Used by BASELINE.md to discharge the
"A3C learning curve matches within seed variance" bar with measured
reference data instead of an argument.

Usage: python examples/reference_a3c_harness.py [n_workers] [budget]
"""

import json
import os
import sys
import threading
import types

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

import multiprocessing

# Default = the reference's own setting (a3c.py:17).
N_WORKERS = int(sys.argv[1]) if len(sys.argv) > 1 else multiprocessing.cpu_count()
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

# --- TF1 compatibility shim -------------------------------------------------
import tensorflow.compat.v1 as tf1

tf1.disable_eager_execution()
tf1.disable_v2_behavior()

# tf.contrib died with TF1; xavier_initializer IS glorot_uniform.
contrib = types.ModuleType("tensorflow.contrib")
contrib.layers = types.SimpleNamespace(
    xavier_initializer=tf1.glorot_uniform_initializer
)
tf1.contrib = contrib

# Keras 3 removed tf.compat.v1.layers; re-supply the two calls the
# reference makes (a3c.py:142-166) with their exact TF1 semantics:
# dense = get_variable kernel/bias under a variable scope (so the params
# land in TRAINABLE_VARIABLES for get_network_params/pull/push), and
# dropout with the TF1 default training=False — an IDENTITY, which is
# precisely the reference's no-op-dropout quirk (SURVEY.md §2.10).
def _dense(inputs, units, activation=None, kernel_initializer=None, name=None):
    with tf1.variable_scope(name, default_name="dense"):
        in_dim = int(inputs.shape[-1])
        kernel = tf1.get_variable(
            "kernel", [in_dim, units], initializer=kernel_initializer
        )
        bias = tf1.get_variable(
            "bias", [units], initializer=tf1.zeros_initializer()
        )
        y = tf1.nn.bias_add(tf1.matmul(inputs, kernel), bias)
        return activation(y) if activation is not None else y


def _dropout(inputs, rate=0.5, name=None, training=False):
    if not training:  # TF1 tf.layers.dropout default: inference = identity
        return tf1.identity(inputs, name=name)
    return tf1.nn.dropout(inputs, rate=rate, name=name)


tf1.layers = types.SimpleNamespace(dense=_dense, dropout=_dropout)
sys.modules["tensorflow"] = tf1
sys.modules["tensorflow.contrib"] = contrib

# --- stale-import fix (a3c.py:8) --------------------------------------------
sys.path.insert(0, REFERENCE)
import importlib

gc_mod = importlib.import_module("game.GameClient")
alias = types.ModuleType("game.game_cli")
alias.__dict__.update(gc_mod.__dict__)
sys.modules["game.game_cli"] = alias

# FileWriter writes (and rmtree-resets) ./log — keep that out of both repos.
workdir = "/tmp/ref_a3c_run"
os.makedirs(workdir, exist_ok=True)
os.chdir(workdir)

ref_a3c = importlib.import_module("algorithm.a3c.a3c")

# --- drive the reference's own __main__ sequence (a3c.py:259-295) -----------
ref_a3c.MAX_EPISODE_TIME = BUDGET
SESS = tf1.Session()
ref_a3c.SESS = SESS

with tf1.device("/cpu:0"):
    ref_a3c.OPT_A = tf1.train.RMSPropOptimizer(ref_a3c.LR_A, name="RMSPropA")
    ref_a3c.OPT_C = tf1.train.RMSPropOptimizer(ref_a3c.LR_C, name="RMSPropC")
    global_agent = ref_a3c.GlobalAgent()
    workers = [
        ref_a3c.Worker("Worker_%i" % i, global_agent) for i in range(N_WORKERS)
    ]

COORD = tf1.train.Coordinator()
ref_a3c.COORD = COORD
SESS.run(tf1.global_variables_initializer())

threads = []
for worker in workers:
    t = threading.Thread(target=worker.work)
    t.start()
    threads.append(t)
COORD.join(threads)

scores = [float(s) for s in ref_a3c.SCORE]
out = {
    "n_workers": N_WORKERS,
    "budget_env_steps": BUDGET,
    "episodes": len(scores),
    "scores": scores,
    "mean": sum(scores) / max(len(scores), 1),
    "max": max(scores, default=0.0),
    "min": min(scores, default=0.0),
}
os.makedirs(os.path.join(REPO, "runs/a3c_reference"), exist_ok=True)
with open(os.path.join(REPO, "runs/a3c_reference/scores.json"), "w") as f:
    json.dump(out, f, indent=2)
print(
    f"reference A3C: {len(scores)} episodes, mean score {out['mean']:.1f}, "
    f"max {out['max']:.0f}",
    flush=True,
)
