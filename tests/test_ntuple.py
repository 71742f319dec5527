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

    def test_mesh_training_delayed_mode(self):
        """update_mode="delayed" on the 8-device CPU mesh: the window
        scan stacks backups along a new leading axis and reshapes across
        the sharded batch axis before dense scatter-adds into replicated
        tables — a distinct lowering from step mode that deserves its own
        mesh coverage (ADVICE r2)."""
        from rein48_tpu.parallel import mesh as mesh_lib

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU fixture")
        mesh = mesh_lib.make_mesh()
        cfg = NTupleTrainConfig(
            batch_size=16,
            steps_per_update=8,
            tuples=TINY_2X3,
            update_mode="delayed",
            delay_window=4,
        )
        state, hist = train_ntuple(cfg, num_updates=3, mesh=mesh, log_every=1)
        assert np.isfinite(hist[-1]["td_abs_err"])
        assert all(np.all(np.isfinite(v)) for v in state.params.values())
        # Same env-step accounting as step mode, and the tables moved.
        assert int(state.update_step) == 3
        assert float(jnp.sum(jnp.abs(state.params["t0"]))) > 0.0


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

    def test_chunked_leaf_matches_direct(self):
        """make_leaf's lax.map chunking (which caps the per-op gather
        size that crashed the TPU worker at depth-1 eval scale) is
        bit-identical to the single-call path, including ragged tails
        and high-rank leading axes."""
        from rein48_tpu.train.ntuple import get_network

        cfg = NTupleTrainConfig(tuples=TINY_2X3)
        net = get_network(cfg.network_config())
        params = {
            k: jax.random.normal(jax.random.key(i), v.shape)
            for i, (k, v) in enumerate(sorted(net.init().items()))
        }
        boards = jax.random.randint(
            jax.random.key(9), (5, 7, 3, 4, 4), 0, 8, dtype=jnp.uint8
        )
        direct = net.make_leaf(params, max_batch=1 << 30)(boards)
        chunked = net.make_leaf(params, max_batch=16)(boards)  # 105 boards
        assert direct.shape == chunked.shape == (5, 7, 3)
        np.testing.assert_array_equal(
            np.asarray(direct), np.asarray(chunked)
        )


class TestDelayedUpdate:
    """Windowed ("delayed") TD — agents/ntuple.py td_apply_delayed and the
    update_mode="delayed" trainer path (Jaskowski's TCIAIG-2017 scheme,
    the TPU-fast variant: no per-step sorts)."""

    def test_single_hit_matches_td_apply(self):
        """A board whose 16 cells hold 16 distinct exponents touches
        every entry exactly once (no two symmetry images read the same
        ordered cell triple), so the saturating rule reduces to exactly
        one plain TD step."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = jnp.arange(16, dtype=jnp.uint8).reshape(1, 4, 4)
        errs = jnp.asarray([1.7])
        a = net.td_apply(net.init(), board, errs, alpha=0.5, collision="mean")
        b = net.td_apply_delayed(net.init(), board, errs, alpha=0.5, tc=False)
        probe = _random_boards(jax.random.key(21), 16)
        np.testing.assert_allclose(
            np.asarray(net.value(a, probe)),
            np.asarray(net.value(b, probe)),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_single_hit_matches_tc(self):
        """Same h=1 equivalence for the temporal-coherence rule (weights
        AND E/A accumulators), across two sequential windows so the
        second sees nonzero E/A."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = jnp.arange(16, dtype=jnp.uint8).reshape(1, 4, 4)
        errs = jnp.asarray([2.5])
        a = net.init_tc()
        b = net.init_tc()
        for _ in range(2):
            a = net.td_apply_tc(a, board, errs, alpha=0.5)
            b = net.td_apply_delayed(b, board, errs, alpha=0.5, tc=True)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6
            ), k

    def test_saturating_hot_entries(self):
        """An entry hit h times with the same error moves by the closed
        form of h sequential TD steps, (1-(1-alpha)^h)*err/L — NOT by
        h*alpha*err/L (divergent sum) or alpha*err/L (starved mean)."""
        net = NTupleNetwork(NTupleConfig(tuples=TINY_2X3))
        board = jnp.arange(16, dtype=jnp.uint8).reshape(1, 4, 4)
        h, alpha, e = 8, 0.3, 1.3
        boards = jnp.repeat(board, h, axis=0)
        errs = jnp.full((h,), e)
        new = net.td_apply_delayed(net.init(), boards, errs, alpha, tc=False)
        got = float(net.value(new, board)[0])
        want = (1.0 - (1.0 - alpha) ** h) * e
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # TC accumulators receive the full per-hit sums.
        new_tc = net.td_apply_delayed(
            net.init_tc(), boards, errs, alpha, tc=True
        )
        idx0 = np.asarray(net.indices(board)[0][0])
        np.testing.assert_allclose(
            np.asarray(new_tc["t0_E"])[idx0], h * e, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_tc["t0_A"])[idx0], h * abs(e), rtol=1e-6
        )

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

    def test_delay_window_splits_update(self):
        """delay_window < steps_per_update refreshes tables mid-update:
        the split run must differ from the whole-update freeze (the
        windows see fresher bootstraps) while both trainers stay finite
        and step the same number of env steps.

        (The two modes no longer coincide at window=1: step mode
        resolves batch collisions by the per-step mean, the delayed rule
        by the saturating sequential-equivalent step — see
        agents/ntuple.py td_apply_delayed.)"""
        kw = dict(
            batch_size=16, tuples=TINY_2X3, steps_per_update=8,
            update_mode="delayed",
        )
        cfg_whole = NTupleTrainConfig(delay_window=None, **kw)
        cfg_split = NTupleTrainConfig(delay_window=4, **kw)
        st_w, _ = init_ntuple(cfg_whole, jax.random.key(24))
        st_s, _ = init_ntuple(cfg_split, jax.random.key(24))
        step_w = jax.jit(make_ntuple_step(cfg_whole))
        step_s = jax.jit(make_ntuple_step(cfg_split))
        for _ in range(6):
            st_w, m_w = step_w(st_w)
            st_s, m_s = step_s(st_s)
        assert float(m_w["env_steps"]) == float(m_s["env_steps"])
        diff = 0.0
        for k in st_w.params:
            assert np.isfinite(np.asarray(st_w.params[k])).all(), k
            assert np.isfinite(np.asarray(st_s.params[k])).all(), k
            diff += float(
                jnp.sum(jnp.abs(st_w.params[k] - st_s.params[k]))
            )
        assert diff > 0.0

    def test_delay_window_must_divide(self):
        cfg = NTupleTrainConfig(
            tuples=TINY_2X3, steps_per_update=12, delay_window=5,
            update_mode="delayed",
        )
        with pytest.raises(ValueError, match="delay_window"):
            make_ntuple_step(cfg)

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

    def test_delayed_plain_alpha_above_one_rejected(self):
        """The windowed update saturates at alpha=1 for tc=False; a
        larger alpha must error, not silently clamp (ADVICE r2)."""
        cfg = NTupleTrainConfig(
            tuples=TINY_2X3, update_mode="delayed", tc=False, alpha=1.5,
            delay_window=4,
        )
        with pytest.raises(ValueError, match="alpha"):
            make_ntuple_step(cfg)
        # tc=True modulates large alphas per-entry: allowed.
        make_ntuple_step(
            NTupleTrainConfig(
                tuples=TINY_2X3, update_mode="delayed", tc=True, alpha=1.5,
                delay_window=4,
            )
        )


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


class TestMXUBackend:
    """The ops/tables.py one-hot-matmul lowering must be numerically
    equivalent to the XLA scatter path (run here via the Mosaic
    interpreter on CPU; the TPU speed claim lives in
    benchmarks/bench_tables.py)."""

    def _nets(self, tuples=TINY_2X3):
        xla = NTupleNetwork(NTupleConfig(tuples=tuples, backend="xla"))
        mxu = NTupleNetwork(NTupleConfig(tuples=tuples, backend="mxu"))
        return xla, mxu

    def _assert_params_close(self, a, b):
        assert sorted(a) == sorted(b)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6
            )

    def test_value_matches(self):
        xla, mxu = self._nets()
        boards = _random_boards(jax.random.key(0), 64)
        params = {
            k: jax.random.normal(jax.random.key(i), v.shape)
            for i, (k, v) in enumerate(sorted(xla.init().items()))
        }
        np.testing.assert_allclose(
            np.asarray(xla.value(params, boards)),
            np.asarray(mxu.value(params, boards)),
            rtol=1e-5,
        )

    def test_td_apply_matches_both_collision_modes(self):
        xla, mxu = self._nets()
        boards = _random_boards(jax.random.key(1), 32)
        err = jax.random.normal(jax.random.key(2), (32,))
        err = err.at[::5].set(0.0)  # masked backups
        for collision in ("mean", "sum"):
            a = xla.td_apply(xla.init(), boards, err, 0.3, collision=collision)
            b = mxu.td_apply(mxu.init(), boards, err, 0.3, collision=collision)
            self._assert_params_close(a, b)

    def test_td_apply_tc_matches(self):
        xla, mxu = self._nets()
        boards = _random_boards(jax.random.key(3), 32)
        err = jax.random.normal(jax.random.key(4), (32,))
        a, b = xla.init_tc(), mxu.init_tc()
        for step in range(3):  # accumulators evolve across steps
            a = xla.td_apply_tc(a, boards, err + step, 0.5)
            b = mxu.td_apply_tc(b, boards, err + step, 0.5)
            # Serialize dispatch: Pallas interpret mode's shared-memory
            # race detector runs io_callbacks on a worker thread, and
            # issuing the next traced op while the previous kernel is
            # still in async dispatch can deadlock the interpreter
            # (observed: update_clocks_for_device_barrier wedged against
            # the main thread's next jnp op — upstream jax issue, CPU
            # interpret mode only).
            jax.block_until_ready(b)
        self._assert_params_close(a, b)

    def test_td_apply_delayed_matches(self):
        xla, mxu = self._nets()
        boards = _random_boards(jax.random.key(5), 48)
        err = jax.random.normal(jax.random.key(6), (48,))
        err = err.at[::3].set(0.0)
        for tc in (False, True):
            pa = xla.init_tc() if tc else xla.init()
            pb = mxu.init_tc() if tc else mxu.init()
            a = xla.td_apply_delayed(pa, boards, err, 0.4, tc=tc)
            b = mxu.td_apply_delayed(pb, boards, err, 0.4, tc=tc)
            self._assert_params_close(a, b)

    def test_big_tables_rejected(self):
        with pytest.raises(ValueError, match="mxu"):
            NTupleNetwork(NTupleConfig(tuples=((0, 1, 2, 3, 4, 5),), backend="mxu"))

    def test_trainer_learns_with_mxu_backend(self):
        cfg = NTupleTrainConfig(
            batch_size=64,
            steps_per_update=16,
            tuples=TINY_2X3,
            table_backend="mxu",
            update_mode="delayed",
            delay_window=4,
        )
        state, net = init_ntuple(cfg, jax.random.key(0))
        base = evaluate_ntuple(
            state.params, cfg, num_envs=64, num_steps=400, seed=9
        )
        step = jax.jit(make_ntuple_step(cfg))
        for _ in range(150):
            state, m = step(state)
        trained = evaluate_ntuple(
            state.params, cfg, num_envs=64, num_steps=400, seed=9
        )
        assert trained["avg_score"] > base["avg_score"] * 1.3, (
            base["avg_score"], trained["avg_score"],
        )

    def test_auto_backend_resolution(self):
        small = NTupleTrainConfig(tuples=TINY_2X3, table_backend="auto")
        big = NTupleTrainConfig(table_backend="auto")  # 6-cell flagship
        # On CPU auto resolves to xla either way; big tuples always xla.
        assert big.network_config().backend == "xla"
        assert small.network_config().backend in ("xla", "mxu")


class TestCachedBackend:
    """backend="cached" (hot-prefix permuted tables, ops/hbm_tables.py)
    must train BIT-IDENTICALLY to the xla backend — the permutation is a
    relabeling of the table domain and the kernel gather is exact."""

    BASE = dict(
        tuples=ntuple_lib.SJ_2X4,
        batch_size=8,
        steps_per_update=8,
    )

    def _logical(self, params, i):
        from rein48_tpu.ops import hbm_tables

        n = params[f"t{i}"].shape[0]
        phys = hbm_tables.physical_index(
            params[f"t{i}_rm"], jnp.arange(n, dtype=jnp.int32)
        )
        return np.asarray(params[f"t{i}"])[np.asarray(phys)]

    @pytest.mark.parametrize(
        "mode,window", [("delayed", 4), ("step", None)]
    )
    def test_training_equivalence(self, mode, window):
        from rein48_tpu.train.ntuple import NTupleTrainConfig, train_ntuple

        cfg_x = NTupleTrainConfig(
            **self.BASE, update_mode=mode, delay_window=window,
            table_backend="xla",
        )
        cfg_c = NTupleTrainConfig(
            **self.BASE, update_mode=mode, delay_window=window,
            table_backend="cached", cache_prefix_rows=32,
            cache_refresh_every=2,
        )
        sx, hx = train_ntuple(cfg_x, num_updates=3, seed=5, log_every=1)
        sc, hc = train_ntuple(cfg_c, num_updates=3, seed=5, log_every=1)
        # Identical trajectories (the policy saw identical values)...
        np.testing.assert_array_equal(
            np.asarray(sx.env.boards), np.asarray(sc.env.boards)
        )
        # ...and identical learned tables under the logical view.
        # Step mode routes through the same XLA ops (bit-exact); delayed
        # mode's hot stats come from the kernel's bf16-limb matmuls,
        # whose collision sums are reassociated relative to an XLA
        # scatter-add — exact per contribution, last-ulp on sums (same
        # caveat as ops/tables.py mxu_scatter_sum).
        exact = mode == "step"
        for i in range(2):
            a = np.asarray(sx.params[f"t{i}"])
            b = self._logical(sc.params, i)
            if exact:
                np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_value_equals_across_refresh(self):
        from rein48_tpu.engine import vector
        from rein48_tpu.train.ntuple import (
            NTupleTrainConfig,
            get_network,
            init_ntuple,
        )

        cfg = NTupleTrainConfig(
            **self.BASE, table_backend="cached", cache_prefix_rows=32
        )
        net = get_network(cfg.network_config())
        state, _ = init_ntuple(cfg, jax.random.key(0))
        params = dict(state.params)
        for i in range(2):
            n = params[f"t{i}"].shape[0]
            params[f"t{i}"] = jax.random.normal(
                jax.random.key(10 + i), (n,), jnp.float32
            )
            params[f"t{i}_A"] = jax.random.uniform(
                jax.random.key(20 + i), (n,)
            )
        boards = vector.reset_batch(jax.random.key(1), 64).boards
        v0 = np.asarray(net.value(params, boards))
        params2 = net.refresh_cache(params)
        v1 = np.asarray(net.value(params2, boards))
        np.testing.assert_array_equal(v0, v1)
