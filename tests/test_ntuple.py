# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""N-tuple network and afterstate-TD trainer tests (CPU, small tables).

The reference has no n-tuple learner (its approximators are the A3C MLP
and DDPG CNN); this agent is the framework's capability workhorse, so
the math is pinned here: symmetry invariance of the value, exact tabular
TD semantics of the scatter update, and learning progress of the full
loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.agents import ntuple as ntuple_lib
from rein48_tpu.agents.ntuple import NTupleConfig, NTupleNetwork, TINY_2X3, SJ_2X4
from rein48_tpu.engine import core
from rein48_tpu.train.ntuple import (
    NTupleTrainConfig,
    evaluate_ntuple,
    init_ntuple,
    make_ntuple_step,
    train_ntuple,
)


def _random_boards(key, n):
    k1, k2 = jax.random.split(key)
    exps = jax.random.randint(k1, (n, 4, 4), 1, 12).astype(jnp.uint8)
    keep = jax.random.bernoulli(k2, 0.5, (n, 4, 4))
    return jnp.where(keep, exps, 0).astype(jnp.uint8)


class TestNetwork:
    def test_table_sizes(self):
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        assert net.table_sizes == (16**3, 16**3)
        assert net.num_lookups == 2 * 8

    def test_indices_in_range_and_deterministic(self):
        net = NTupleNetwork(NTupleConfig(tuples=SJ_2X4))
        boards = _random_boards(jax.random.key(0), 64)
        idx = net.indices(boards)
        for i, table_idx in enumerate(idx):
            assert table_idx.shape == (64, 8)
            assert int(table_idx.min()) >= 0
            assert int(table_idx.max()) < net.table_sizes[i]
        idx2 = net.indices(boards)
        for a, b in zip(idx, idx2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_value_is_symmetry_invariant(self):
        """Shared tables over the 8 symmetry images make V invariant to
        board rotation/reflection — the whole point of the expansion."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        params = jax.tree.map(
            lambda t: jax.random.normal(jax.random.key(1), t.shape),
            net.init(),
        )
        boards = _random_boards(jax.random.key(2), 16)
        v = np.asarray(net.value(params, boards))
        b = np.asarray(boards)
        for op in (
            lambda x: np.rot90(x, 1, axes=(-2, -1)),
            lambda x: np.rot90(x, 2, axes=(-2, -1)),
            lambda x: x[..., ::-1],
            lambda x: np.swapaxes(x, -1, -2),
        ):
            tb = jnp.asarray(np.ascontiguousarray(op(b)))
            np.testing.assert_allclose(
                np.asarray(net.value(params, tb)), v, rtol=1e-5
            )

    def test_asymmetric_network_has_one_lookup_per_tuple(self):
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3, symmetric=False))
        assert net.num_lookups == 2
        boards = _random_boards(jax.random.key(3), 4)
        for table_idx in net.indices(boards):
            assert table_idx.shape == (4, 1)

    def test_td_apply_sum_exact_tabular_semantics(self):
        """collision="sum": one update moves V(board) by exactly
        alpha*err/L * sum_entries(count^2) — with all-distinct lookups
        that is alpha*err; duplicated entries contribute quadratically
        (hit `count` times by the scatter AND read `count` times by the
        value)."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        params = net.init()
        board = jnp.asarray(
            np.arange(1, 17, dtype=np.uint8).reshape(1, 4, 4) % 12
        )
        sq_counts = 0.0
        for table_idx in net.indices(board):
            _, counts = np.unique(np.asarray(table_idx), return_counts=True)
            sq_counts += float(np.sum(counts.astype(np.float64) ** 2))
        err, alpha = 2.0, 0.5
        new = net.td_apply(
            params, board, jnp.asarray([err]), alpha=alpha, collision="sum"
        )
        v = float(net.value(new, board)[0])
        expect = alpha * err / net.num_lookups * sq_counts
        assert np.isclose(v, expect), (v, expect)

    def test_td_apply_mean_moves_value_by_exactly_alpha_err(self):
        """collision="mean": a single board's update moves V(board) by
        exactly alpha*err — per-entry averaging cancels the quadratic
        collision artifact of the summing update."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        params = net.init()
        board = jnp.asarray(
            np.arange(1, 17, dtype=np.uint8).reshape(1, 4, 4) % 12
        )
        err, alpha = 2.0, 0.5
        new = net.td_apply(params, board, jnp.asarray([err]), alpha=alpha)
        v = float(net.value(new, board)[0])
        assert np.isclose(v, alpha * err), v

    def test_td_apply_sum_accumulates_duplicates_mean_does_not(self):
        """A batch of identical boards: "sum" scales the per-entry delta
        with the batch (the large-batch divergence mechanism), "mean"
        keeps it constant — THE stability property for lockstep TD."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        params = net.init()
        board = _random_boards(jax.random.key(4), 1)
        many = jnp.concatenate([board] * 64, axis=0)
        errs = jnp.ones((64,))
        summed = net.td_apply(params, many, errs, alpha=0.1, collision="sum")
        meaned = net.td_apply(params, many, errs, alpha=0.1, collision="mean")
        single = net.td_apply(
            params, board, jnp.asarray([1.0]), alpha=0.1, collision="sum"
        )
        v_sum = float(net.value(summed, board)[0])
        v_mean = float(net.value(meaned, board)[0])
        v_single = float(net.value(single, board)[0])
        assert np.isclose(v_sum, 64 * v_single)
        assert v_mean <= v_single * (1 + 1e-5)
        assert v_mean > 0

    def test_td_apply_mean_ignores_masked_zero_errors(self):
        """err=0 rows (masked backups) must not dilute colliding means."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        params = net.init()
        board = _random_boards(jax.random.key(6), 1)
        pair = jnp.concatenate([board, board], axis=0)
        with_zero = net.td_apply(
            params, pair, jnp.asarray([1.0, 0.0]), alpha=0.1
        )
        alone = net.td_apply(params, board, jnp.asarray([1.0]), alpha=0.1)
        np.testing.assert_allclose(
            float(net.value(with_zero, board)[0]),
            float(net.value(alone, board)[0]),
            rtol=1e-6,
        )


class TestTrainer:
    def test_step_shapes_and_counters(self):
        cfg = NTupleTrainConfig(
            batch_size=8, steps_per_update=4, tuples=TINY_2X3
        )
        state, _ = init_ntuple(cfg, jax.random.key(0))
        step = jax.jit(make_ntuple_step(cfg))
        state2, metrics = step(state)
        assert int(state2.update_step) == 1
        assert float(metrics["env_steps"]) == 8 * 4
        assert np.isfinite(float(metrics["td_abs_err"]))
        # Tables actually moved.
        delta = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree.leaves(state.params), jax.tree.leaves(state2.params)
            )
        )
        assert delta > 0

    def test_greedy_actions_always_change_board(self):
        """The argmax over legal Q never picks a no-op move, so every
        step progresses (the reference could spin forever on no-ops,
        GameClient.py:48-49)."""
        cfg = NTupleTrainConfig(
            batch_size=16, steps_per_update=8, tuples=TINY_2X3
        )
        state, _ = init_ntuple(cfg, jax.random.key(1))
        step = jax.jit(make_ntuple_step(cfg))
        for _ in range(4):
            prev_steps = np.asarray(state.env.steps).copy()
            prev_boards = np.asarray(state.env.boards).copy()
            state, m = step(state)
        # steps grew (or reset at episode ends) — boards must differ.
        assert not np.array_equal(np.asarray(state.env.boards), prev_boards)

    def test_learning_improves_play(self):
        """A few thousand games of TD on the small S&J net must clearly
        beat the untrained (all-zero tables => greedy-reward) policy."""
        cfg = NTupleTrainConfig(
            batch_size=128, steps_per_update=64, tuples=SJ_2X4, alpha=0.25
        )
        state, _ = init_ntuple(cfg, jax.random.key(2))
        base = evaluate_ntuple(
            state.params, cfg, num_envs=64, num_steps=400, seed=9
        )
        step = jax.jit(make_ntuple_step(cfg), donate_argnums=(0,))
        for _ in range(120):
            state, m = step(state)
        trained = evaluate_ntuple(
            state.params, cfg, num_envs=64, num_steps=400, seed=9
        )
        assert trained["avg_score"] > base["avg_score"] * 1.4, (
            base["avg_score"],
            trained["avg_score"],
        )

    def test_train_driver_history_and_checkpoint(self, tmp_path):
        from rein48_tpu.utils.checkpoint import Checkpointer

        cfg = NTupleTrainConfig(
            batch_size=16, steps_per_update=8, tuples=TINY_2X3
        )
        ckpt = Checkpointer(str(tmp_path / "ckpt"), save_every=2)
        state, hist = train_ntuple(
            cfg, num_updates=4, log_every=2, checkpointer=ckpt
        )
        assert len(hist) == 2
        assert ckpt.latest_step() == 4
        saved = ckpt.load_config()
        assert tuple(tuple(t) for t in saved["tuples"]) == TINY_2X3
        # Resume restores the full state (tables + env + TD carry).
        state2, _ = train_ntuple(
            cfg, num_updates=0 + 1, log_every=1, checkpointer=ckpt
        )
        assert int(state2.update_step) == 5
        ckpt.close()

    def test_mesh_training_compiles_and_runs(self):
        """dp-sharded envs + replicated tables on the 8-device CPU mesh."""
        from rein48_tpu.parallel import mesh as mesh_lib

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU fixture")
        mesh = mesh_lib.make_mesh()
        cfg = NTupleTrainConfig(
            batch_size=16, steps_per_update=4, tuples=TINY_2X3
        )
        state, hist = train_ntuple(cfg, num_updates=2, mesh=mesh, log_every=1)
        assert np.isfinite(hist[-1]["td_abs_err"])


class TestPlannerComposition:
    def test_depth1_at_least_matches_greedy_on_average(self):
        """Expectimax over the learned V should not hurt (smoke-level:
        same eval protocol, depth 1 vs 0 after brief training)."""
        cfg = NTupleTrainConfig(
            batch_size=64, steps_per_update=32, tuples=TINY_2X3, alpha=0.25
        )
        state, _ = init_ntuple(cfg, jax.random.key(5))
        step = jax.jit(make_ntuple_step(cfg), donate_argnums=(0,))
        for _ in range(10):
            state, _ = step(state)
        g = evaluate_ntuple(
            state.params, cfg, depth=0, num_envs=32, num_steps=250, seed=3
        )
        p = evaluate_ntuple(
            state.params, cfg, depth=1, num_envs=32, num_steps=250, seed=3
        )
        assert p["avg_score"] > 0.7 * g["avg_score"], (g, p)


class TestDelayedUpdate:
    """Windowed ("delayed") TD — agents/ntuple.py td_apply_delayed and the
    update_mode="delayed" trainer path (Jaskowski's TCIAIG-2017 scheme,
    the TPU-fast variant: no per-step sorts)."""

    def test_single_window_matches_plain_mean(self):
        """One window of distinct boards: the dense S/C mean must equal
        the sort-based collision-mean update exactly."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        boards = _random_boards(jax.random.key(20), 8)
        errs = jnp.linspace(-2.0, 2.0, 8)
        a = net.td_apply(net.init(), boards, errs, alpha=0.5, collision="mean")
        b = net.td_apply_delayed(net.init(), boards, errs, alpha=0.5, tc=False)
        probe = _random_boards(jax.random.key(21), 16)
        np.testing.assert_allclose(
            np.asarray(net.value(a, probe)),
            np.asarray(net.value(b, probe)),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_single_window_matches_tc(self):
        """Same equivalence for the temporal-coherence rule (weights AND
        E/A accumulators)."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        boards = _random_boards(jax.random.key(22), 8)
        errs = jnp.linspace(0.5, 4.0, 8)
        # Two sequential windows so the second sees nonzero E/A.
        a = net.init_tc()
        b = net.init_tc()
        for _ in range(2):
            a = net.td_apply_tc(a, boards, errs, alpha=0.5)
            b = net.td_apply_delayed(b, boards, errs, alpha=0.5, tc=True)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6
            ), k

    def test_masked_zero_errors_ignored(self):
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = _random_boards(jax.random.key(23), 1)
        pair = jnp.concatenate([board, board], axis=0)
        with_zero = net.td_apply_delayed(
            net.init(), pair, jnp.asarray([1.0, 0.0]), alpha=0.1, tc=False
        )
        alone = net.td_apply_delayed(
            net.init(), board, jnp.asarray([1.0]), alpha=0.1, tc=False
        )
        np.testing.assert_allclose(
            float(net.value(with_zero, board)[0]),
            float(net.value(alone, board)[0]),
            rtol=1e-6,
        )

    def test_window_of_one_matches_step_mode_trainer(self):
        """steps_per_update=1 collapses the two trainer modes to the same
        algorithm: identical trajectories and near-identical tables."""
        kw = dict(batch_size=16, tuples=TINY_2X3, steps_per_update=1)
        cfg_s = NTupleTrainConfig(update_mode="step", **kw)
        cfg_d = NTupleTrainConfig(update_mode="delayed", **kw)
        st_s, _ = init_ntuple(cfg_s, jax.random.key(24))
        st_d, _ = init_ntuple(cfg_d, jax.random.key(24))
        step_s = jax.jit(make_ntuple_step(cfg_s))
        step_d = jax.jit(make_ntuple_step(cfg_d))
        for _ in range(12):
            st_s, _ = step_s(st_s)
            st_d, _ = step_d(st_d)
            np.testing.assert_array_equal(
                np.asarray(st_s.env.boards), np.asarray(st_d.env.boards)
            )
        for k in st_s.params:
            np.testing.assert_allclose(
                np.asarray(st_s.params[k]),
                np.asarray(st_d.params[k]),
                rtol=1e-5,
                atol=1e-6,
            )

    def test_delayed_trainer_learns(self):
        cfg = NTupleTrainConfig(
            batch_size=128,
            steps_per_update=64,
            tuples=SJ_2X4,
            alpha=1.0,
            update_mode="delayed",
        )
        state, _ = init_ntuple(cfg, jax.random.key(25))
        base = evaluate_ntuple(
            state.params, cfg, num_envs=64, num_steps=400, seed=9
        )
        step = jax.jit(make_ntuple_step(cfg), donate_argnums=(0,))
        for _ in range(120):
            state, m = step(state)
        trained = evaluate_ntuple(
            state.params, cfg, num_envs=64, num_steps=400, seed=9
        )
        assert trained["avg_score"] > base["avg_score"] * 1.4, (
            base["avg_score"],
            trained["avg_score"],
        )

    def test_unknown_update_mode_raises(self):
        cfg = NTupleTrainConfig(tuples=TINY_2X3, update_mode="bogus")
        with pytest.raises(ValueError, match="update_mode"):
            make_ntuple_step(cfg)


class TestTemporalCoherence:
    def test_first_update_matches_plain_mean(self):
        """Untouched entries have modulation 1, so the first TC update
        moves V(board) exactly like the plain collision-mean update."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = _random_boards(jax.random.key(7), 1)
        err = jnp.asarray([3.0])
        plain = net.td_apply(net.init(), board, err, alpha=0.5)
        tc = net.td_apply_tc(net.init_tc(), board, err, alpha=0.5)
        np.testing.assert_allclose(
            float(net.value(tc, board)[0]),
            float(net.value(plain, board)[0]),
            rtol=1e-6,
        )

    def test_oscillating_errors_damp_to_zero_rate(self):
        """+e then -e zeroes the signed accumulator E, so the THIRD
        update's modulation |E|/A is 0 and weights stop moving."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = _random_boards(jax.random.key(8), 1)
        p = net.init_tc()
        p = net.td_apply_tc(p, board, jnp.asarray([2.0]), alpha=1.0)
        p = net.td_apply_tc(p, board, jnp.asarray([-2.0]), alpha=1.0)
        v_before = float(net.value(p, board)[0])
        p = net.td_apply_tc(p, board, jnp.asarray([5.0]), alpha=1.0)
        assert np.isclose(float(net.value(p, board)[0]), v_before, atol=1e-6)

    def test_consistent_errors_keep_full_rate(self):
        """Same-sign errors keep |E|/A = 1: the second update moves V as
        much as the first (tabular full-rate learning)."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = _random_boards(jax.random.key(9), 1)
        p = net.init_tc()
        p = net.td_apply_tc(p, board, jnp.asarray([2.0]), alpha=0.5)
        v1 = float(net.value(p, board)[0])
        p = net.td_apply_tc(p, board, jnp.asarray([2.0]), alpha=0.5)
        v2 = float(net.value(p, board)[0])
        assert np.isclose(v2 - v1, v1, rtol=1e-5)

    def test_accumulators_ignore_masked_errors(self):
        """err=0 rows must leave E/A (and weights) untouched."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = _random_boards(jax.random.key(10), 1)
        p = net.td_apply_tc(net.init_tc(), board, jnp.asarray([0.0]), alpha=1.0)
        for k, v in p.items():
            assert float(jnp.sum(jnp.abs(v))) == 0.0, k

    def test_tc_trainer_runs_and_learns(self):
        cfg = NTupleTrainConfig(
            batch_size=64, steps_per_update=32, tuples=TINY_2X3, tc=True
        )
        state, _ = init_ntuple(cfg, jax.random.key(11))
        assert "t0_E" in state.params
        step = jax.jit(make_ntuple_step(cfg), donate_argnums=(0,))
        for _ in range(5):
            state, m = step(state)
        assert np.isfinite(float(m["td_abs_err"]))
