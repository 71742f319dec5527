# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""A3C reference-parity learning-curve experiment (CPU, minutes).

Closes BASELINE.md's "A3C learning curve matches within seed variance"
bar with measured data on BOTH sides:

* the REAL reference curve comes from ``reference_a3c_harness.py``
  (the reference's own code, run under its own budget);
* this script trains ``A3CConfig.reference_parity()`` — the reference's
  exact regime: reward identically zero (``GameClient.py:138``), raw
  board obs, MLP, no legal mask, gamma 0.9, RMSProp 1e-3, the
  dropped-last-reward return quirk (``a3c.py:251``) — across several
  seeds, then scores episodes under the REFERENCE protocol: stochastic
  softmax policy, episodes capped at MAX_STEP_NUM=100 steps
  (``a3c.py:20,201``), score = final board tile sum (``a3c.py:214``).

With the reward channel identically zero neither system has a learning
signal; the meaningful "curve match" is that both stay at the
random-play score level with no trend, which is exactly what the data
shows (runs/a3c_parity/parity.json + BASELINE.md paragraph).

Usage: python examples/a3c_parity_curve.py [num_updates] [seeds]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rein48_tpu.engine import vector
from rein48_tpu.train import common
from rein48_tpu.train.a3c import A3CConfig, train_a3c

NUM_UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CAP = 100  # reference MAX_STEP_NUM (a3c.py:20)
EVAL_EPISODES = 256


def capped_episode_scores(policy_logits_fn, key, num_envs=EVAL_EPISODES):
    """Reference scoring protocol: stochastic softmax play, first episode
    per env, capped at 100 steps; score = board tile sum at the end
    (finished or not — the reference scores the capped board the same
    way, a3c.py:201,214)."""
    k_env, k_roll = jax.random.split(key)
    state = vector.reset_batch(k_env, num_envs)

    def body(carry, _):
        st, k, finished, score = carry
        k, k_act = jax.random.split(k)
        logits = policy_logits_fn(st.boards)
        actions = jax.random.categorical(k_act, logits)
        st2, out = vector.step_autoreset(st, actions)
        first = out.done & ~finished
        score = jnp.where(first, out.episode_tile_sum, score)
        return (st2, k, finished | out.done, score), None

    B = num_envs
    init = (
        state,
        k_roll,
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.float32),
    )
    (final, _, finished, score), _ = jax.lax.scan(
        jax.jit(body), init, None, length=CAP
    )
    live = jnp.sum(
        jnp.where(final.boards > 0, jnp.exp2(final.boards.astype(jnp.float32)), 0.0),
        axis=(-2, -1),
    )
    return np.asarray(jnp.where(finished, score, live))


def model_logits_fn(model, params, obs_encoding):
    def fn(boards):
        logits, _ = model.apply(
            {"params": params}, common.encode_obs(boards, obs_encoding)
        )
        return logits

    return fn


results = {"config": "A3CConfig.reference_parity", "seeds": {}}
for seed in range(SEEDS):
    cfg = A3CConfig.reference_parity()
    state, hist = train_a3c(cfg, num_updates=NUM_UPDATES, seed=seed, log_every=1)
    model = cfg.make_model()
    trained = capped_episode_scores(
        model_logits_fn(model, state.params, cfg.obs_encoding),
        jax.random.key(1000 + seed),
    )
    results["seeds"][seed] = {
        "curve": hist,
        "capped_scores_mean": float(trained.mean()),
        "capped_scores_std": float(trained.std()),
        "capped_scores_max": float(trained.max()),
        "env_steps_trained": NUM_UPDATES * cfg.batch_size * cfg.unroll_len,
    }
    print(
        f"seed {seed}: trained capped score {trained.mean():.1f} "
        f"± {trained.std():.1f} (max {trained.max():.0f}); "
        f"entropy {hist[-1]['entropy']:.3f}",
        flush=True,
    )

# Uniform-random baseline under the identical protocol.
rand = capped_episode_scores(
    lambda boards: jnp.zeros(boards.shape[:-2] + (4,), jnp.float32),
    jax.random.key(7777),
)
results["random_baseline"] = {
    "capped_scores_mean": float(rand.mean()),
    "capped_scores_std": float(rand.std()),
    "capped_scores_max": float(rand.max()),
}
print(f"random baseline: {rand.mean():.1f} ± {rand.std():.1f}", flush=True)

# Pull in the measured reference replicas if the harness has run.
ref_dir = "runs/a3c_reference"
refs = []
if os.path.isdir(ref_dir):
    for name in sorted(os.listdir(ref_dir)):
        if name.startswith("scores"):
            with open(os.path.join(ref_dir, name)) as f:
                data = json.load(f)
            scores = np.asarray(data["scores"], np.float64)
            refs.append(
                {
                    "file": name,
                    "episodes": len(scores),
                    "mean": float(scores.mean()),
                    "std": float(scores.std()),
                    "max": float(scores.max()),
                    # Trend = is there any learning? slope of score vs
                    # episode index, in score units per 100 episodes.
                    "slope_per_100eps": float(
                        np.polyfit(np.arange(len(scores)), scores, 1)[0] * 100
                    ),
                }
            )
results["reference_replicas"] = refs

os.makedirs("runs/a3c_parity", exist_ok=True)
with open("runs/a3c_parity/parity.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote runs/a3c_parity/parity.json", flush=True)
