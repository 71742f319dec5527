# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for batched policy evaluation and the workload presets."""

import jax
import numpy as np

from rein48_tpu import configs
from rein48_tpu.models import nets
from rein48_tpu.models.obs import encode_onehot
from rein48_tpu.train.evaluate import evaluate_policy


def test_evaluate_random_init_policy():
    model = nets.ResNetPolicy(channels=8, num_blocks=1)
    params = model.init(
        jax.random.key(0), encode_onehot(np.zeros((1, 4, 4), np.uint8))
    )["params"]
    stats = evaluate_policy(
        params, model, num_envs=32, num_steps=400, seed=0, greedy=False
    )
    assert stats["episodes"] > 0
    assert stats["avg_tile_sum"] > 0
    assert stats["best_tile"] >= 16
    assert 0.0 <= stats["frac_2048"] <= 1.0


def test_greedy_masked_never_stalls():
    """Greedy over legal actions always progresses (no-op moves barred)."""
    model = nets.ResNetPolicy(channels=8, num_blocks=1)
    params = model.init(
        jax.random.key(1), encode_onehot(np.zeros((1, 4, 4), np.uint8))
    )["params"]
    stats = evaluate_policy(
        params, model, num_envs=16, num_steps=600, seed=1, greedy=True
    )
    # A greedy policy restricted to legal moves must finish episodes.
    assert stats["episodes"] > 0


def test_presets_exist_and_build():
    assert set(configs.PRESETS) == {
        "parity-single",
        "vector-16k",
        "dqn-4k",
        "a3c-8chip",
        "multihost",
    }
    dqn = configs.dqn_4k()
    assert dqn.num_envs == 4096
    a3c = configs.a3c_8chip()
    assert a3c.batch_size % 8 == 0
    assert configs.multihost(1024).batch_size == 1024


def test_qnetwork_evaluates():
    """Q-nets (no value head) run through the same eval path as policies."""
    model = nets.QNetwork(channels=(8, 16), hidden=32)
    params = model.init(
        jax.random.key(2), encode_onehot(np.zeros((1, 4, 4), np.uint8))
    )["params"]
    stats = evaluate_policy(
        params, model, num_envs=16, num_steps=300, seed=2, greedy=True
    )
    assert stats["episodes"] > 0


def test_restore_field_params_only(tmp_path):
    """Eval-time params restore needs no env/replay shape agreement.

    Regression: `Checkpointer.restore` requires a template state whose env
    batch matches training's; `restore_field("params")` must load params
    from a checkpoint written with a DIFFERENT batch size.
    """
    import jax.numpy as jnp

    from rein48_tpu.train.a3c import A3CConfig, init_a3c
    from rein48_tpu.utils.checkpoint import Checkpointer

    config = A3CConfig(batch_size=32, unroll_len=4, model="mlp")
    state, _, _ = init_a3c(config, jax.random.key(3))
    ckpt = Checkpointer(str(tmp_path / "ckpt"), save_every=1)
    ckpt.save(1, state)

    params = ckpt.restore_field("params")
    expect = jax.tree.leaves(state.params)
    got = jax.tree.leaves(params)
    assert len(expect) == len(got)
    for e, g in zip(expect, got):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(g))
    ckpt.close()


def test_search_policy_is_cached_per_config():
    """Identical search configs must reuse ONE policy object.

    The policy is a static jit argument of the search rollout; a fresh
    closure per evaluate_search call would recompile the rollout every
    time (minutes on TPU). Flax modules are frozen dataclasses, so equal
    configs hit the lru_cache (regression for ADVICE.md round-1 #1).
    """
    from rein48_tpu.train import evaluate

    # Heuristic path: keyed by depth only.
    p1 = evaluate._get_search_policy(1, None, "onehot", 0.99, "log2")
    p2 = evaluate._get_search_policy(1, None, "onehot", 0.99, "log2")
    assert p1 is p2
    assert evaluate._get_search_policy(2, None, "onehot", 0.99, "log2") is not p1

    # Value-guided path: two equal model instances hash/compare equal.
    m1 = nets.make_model("mlp")
    m2 = nets.make_model("mlp")
    v1 = evaluate._get_search_policy(1, m1, "onehot", 0.99, "log2")
    v2 = evaluate._get_search_policy(1, m2, "onehot", 0.99, "log2")
    assert v1 is v2
    assert evaluate._get_search_policy(1, m1, "onehot", 0.9, "log2") is not v1


def test_first_episode_protocol_counts_every_env_once():
    """protocol="first": exactly num_envs episodes, no completion bias;
    a long-enough sweep leaves nothing unfinished for random play."""
    from rein48_tpu.agents.ntuple import TINY_2X3
    from rein48_tpu.train.ntuple import (
        NTupleTrainConfig, evaluate_ntuple, init_ntuple,
    )

    cfg = NTupleTrainConfig(tuples=TINY_2X3, batch_size=8)
    state, net = init_ntuple(cfg, jax.random.key(0))
    stats = evaluate_ntuple(
        state.params, cfg, num_envs=32, num_steps=2048, seed=5,
        protocol="first",
    )
    assert stats["episodes"] == 32.0
    assert stats["unfinished"] == 0.0  # random-ish play dies well within 2048
    assert 0.0 <= stats["frac_512"] <= 1.0
    assert stats["avg_length"] > 10
    assert stats["avg_score"] > 0

    # A sweep too short to finish still scores every env (lower bound).
    short = evaluate_ntuple(
        state.params, cfg, num_envs=16, num_steps=8, seed=5, protocol="first",
    )
    assert short["episodes"] == 16.0
    assert short["avg_tile_sum"] > 0  # live boards credited


def test_first_episode_on_chunk_progress_and_early_stop():
    """``on_chunk`` fires once per launch chunk with lower-bound stats
    (Python floats) and a truthy return stops the sweep — the partial-row
    persistence contract long on-chip depth-2 evals rely on (round 5)."""
    from rein48_tpu.train.evaluate import evaluate_search

    calls = []

    def stop_after_two(done, stats):
        calls.append((done, stats["episodes"], stats["unfinished"]))
        assert isinstance(stats["avg_score"], float)
        return len(calls) >= 2

    s = evaluate_search(
        depth=0, num_envs=4, num_steps=1000, seed=3, protocol="first",
        launch_chunk=64, on_chunk=stop_after_two,
    )
    assert [c[0] for c in calls] == [64, 128]  # stopped after the 2nd chunk
    assert all(c[1] == 4.0 for c in calls)
    assert s["episodes"] == 4.0  # early-stopped stats still well-formed
    assert s["unfinished"] == calls[-1][2]  # final == last partial


def test_evaluate_ntuple_default_steps_by_protocol(monkeypatch):
    """num_steps=None defaults to 16384 for protocol="first" (a strong
    agent's first episode runs ~17k moves — a short default would
    silently truncate it, VERDICT r4 weak item 5) and 4096 for "window".
    Pinned via the rollout entry points so no real sweep runs."""
    from rein48_tpu.agents.ntuple import TINY_2X3
    from rein48_tpu.train import evaluate
    from rein48_tpu.train.ntuple import NTupleTrainConfig, evaluate_ntuple, init_ntuple

    cfg = NTupleTrainConfig(tuples=TINY_2X3, batch_size=8)
    state, _ = init_ntuple(cfg, jax.random.key(0))
    seen = {}

    def fake_first(params, st, *, policy_fn, num_steps, launch_chunk=None):
        seen["first"] = num_steps
        raise _Stop

    def fake_window(params, st, *, policy_fn, num_steps):
        seen["window"] = num_steps
        raise _Stop

    class _Stop(Exception):
        pass

    monkeypatch.setattr(evaluate, "_first_episode_rollout", fake_first)
    monkeypatch.setattr(evaluate, "_search_rollout", fake_window)
    for protocol in ("first", "window"):
        try:
            evaluate_ntuple(state.params, cfg, num_envs=4, protocol=protocol)
        except _Stop:
            pass
    assert seen == {"first": 16384, "window": 4096}
