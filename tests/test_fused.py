# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for the fused Pallas rollout kernel (``engine/fused.py``).

Strategy: the kernel's step body (``fused_step_soa``) is a plain jnp
function, so its move/spawn/done/reset semantics are proven directly
against the independently-tested engine primitives (``core.move_boards``,
``core.place_tile``, ``core.is_game_over``) on thousands of random boards.
The ``pallas_call`` wrapper is then exercised in interpreter mode for
determinism and state-validity invariants; the real-TPU path is covered by
``bench.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.engine import core, fused, vector


def _random_boards(key, batch):
    """Realistic + adversarial boards: engine-played mixed with uniform."""
    k1, k2, k3 = jax.random.split(key, 3)
    state = vector.reset_batch(k1, batch)
    state, _ = vector.rollout_random(state, 40)
    played = state.boards
    uniform = jax.random.randint(k2, (batch, 4, 4), 0, 8, dtype=jnp.int32).astype(jnp.uint8)
    take_played = jax.random.bernoulli(k3, 0.5, (batch,))
    return jnp.where(take_played[:, None, None], played, uniform)


class TestLayout:
    def test_soa_roundtrip(self):
        key = jax.random.key(0)
        boards = jax.random.randint(key, (256, 4, 4), 0, 16, dtype=jnp.int32).astype(jnp.uint8)
        soa = fused.boards_to_soa(boards)
        assert soa.shape == (16, 2, 128)
        np.testing.assert_array_equal(np.asarray(fused.soa_to_boards(soa)), np.asarray(boards))

    def test_soa_cell_order_row_major(self):
        # Cell plane 4*r + c must hold board position (r, c).
        boards = jnp.arange(16, dtype=jnp.uint8).reshape(1, 4, 4)
        boards = jnp.tile(boards, (128, 1, 1))
        soa = fused.boards_to_soa(boards)
        for i in range(16):
            assert int(soa[i, 0, 0]) == i


class TestFusedStepEquivalence:
    """fused_step_soa == the proven engine primitives, bit for bit."""

    BATCH = 4096

    @pytest.fixture(scope="class")
    def step_io(self):
        key = jax.random.key(42)
        kb, kbits, ks = jax.random.split(key, 3)
        boards = _random_boards(kb, self.BATCH)
        bits = jax.random.bits(kbits, (5, self.BATCH), dtype=jnp.uint32)
        score = jax.random.randint(ks, (self.BATCH,), 0, 1000, dtype=jnp.int32)
        steps = jnp.full((self.BATCH,), 7, dtype=jnp.int32)

        cells = [boards.reshape(self.BATCH, 16)[:, i].astype(jnp.int32) for i in range(16)]
        new_cells, new_score, new_steps, aux = jax.jit(fused.fused_step_soa)(
            cells, score, steps, list(bits)
        )
        new_boards = jnp.stack(new_cells, axis=-1).reshape(self.BATCH, 4, 4).astype(jnp.uint8)
        return boards, bits, score, steps, new_boards, new_score, new_steps, aux

    def _expected(self, boards, bits, score, steps):
        action = (bits[0] & 3).astype(jnp.int32)
        moved, merge_score, changed = core.move_boards(boards, action)
        merge_score = merge_score.astype(jnp.int32)

        n_blanks = jnp.sum(moved == 0, axis=(-1, -2)).astype(jnp.int32)
        rank = core.spawn_rank_from_bits(bits[1], n_blanks)
        value = core.spawn_exp_from_bits(bits[2])
        spawned = core.place_tile(moved, rank, value, changed)

        done = core.is_game_over(spawned)
        episode_score = score + merge_score
        episode_length = steps + 1

        r_rank = core.spawn_rank_from_bits(bits[3], jnp.asarray(16))
        r_val = core.spawn_exp_from_bits(bits[4])
        fresh = core.place_tile(
            jnp.zeros_like(spawned), r_rank, r_val, jnp.ones_like(done)
        )
        final = jnp.where(done[:, None, None], fresh, spawned)
        new_score = jnp.where(done, 0, episode_score)
        new_steps = jnp.where(done, 0, episode_length)
        return dict(
            final=final,
            new_score=new_score,
            new_steps=new_steps,
            done=done,
            changed=changed,
            reward=merge_score,
            episode_score=episode_score,
            episode_length=episode_length,
            board_max_exp=jnp.max(spawned, axis=(-1, -2)).astype(jnp.int32),
        )

    def test_board_transition(self, step_io):
        boards, bits, score, steps, new_boards, _, _, _ = step_io
        exp = self._expected(boards, bits, score, steps)
        np.testing.assert_array_equal(np.asarray(new_boards), np.asarray(exp["final"]))

    def test_score_steps(self, step_io):
        boards, bits, score, steps, _, new_score, new_steps, _ = step_io
        exp = self._expected(boards, bits, score, steps)
        np.testing.assert_array_equal(np.asarray(new_score), np.asarray(exp["new_score"]))
        np.testing.assert_array_equal(np.asarray(new_steps), np.asarray(exp["new_steps"]))

    def test_aux_outputs(self, step_io):
        boards, bits, score, steps, _, _, _, aux = step_io
        exp = self._expected(boards, bits, score, steps)
        for name in ("done", "changed", "reward", "episode_score", "episode_length", "board_max_exp"):
            np.testing.assert_array_equal(
                np.asarray(aux[name]), np.asarray(exp[name]), err_msg=name
            )

    def test_transitions_are_nontrivial(self, step_io):
        # Guard against vacuous equality: the sample must exercise moves,
        # spawns, merges and at least a few terminal boards.
        _, _, _, _, _, _, _, aux = step_io
        assert int(jnp.sum(aux["changed"])) > self.BATCH // 2
        assert int(jnp.sum(aux["reward"] > 0)) > self.BATCH // 10
        assert int(jnp.sum(aux["done"])) > 0


class TestFusedRolloutInterpret:
    """pallas_call plumbing in interpreter mode (CPU), via injected bits.

    The Mosaic interpreter stubs the hardware PRNG to zeros, so these tests
    inject a jax.random bit stream and compare the FULL kernel (block specs
    across a multi-program grid, fori_loop, stat accumulation, output
    writes) bit-for-bit against the jnp scan reference. The hardware-PRNG
    path differs only in the two prng_* calls and is exercised on the real
    chip by ``bench.py``.
    """

    def _run(self, num_steps=250, batch=256, block_envs=128, seed=3):
        state = vector.reset_batch(jax.random.key(seed), batch)
        bits = jax.random.bits(jax.random.key(seed + 1), (num_steps, 5, batch), dtype=jnp.uint32)
        pallas_out = fused.rollout_random_fused(
            state, 0, num_steps, block_envs=block_envs, interpret=True, bits=bits
        )
        ref_out = fused.rollout_bits_reference(state, bits)
        return pallas_out, ref_out

    def test_kernel_matches_reference_multiblock(self):
        # batch 256 / block 128 -> 2 grid programs: exercises index maps.
        (ps, pst), (rs, rst) = self._run(num_steps=50)
        np.testing.assert_array_equal(np.asarray(ps.boards), np.asarray(rs.boards))
        np.testing.assert_array_equal(np.asarray(ps.score), np.asarray(rs.score))
        np.testing.assert_array_equal(np.asarray(ps.steps), np.asarray(rs.steps))
        for field in ("episodes", "episode_length_sum", "episode_score_sum", "max_exponent"):
            np.testing.assert_array_equal(
                np.asarray(getattr(pst, field)), np.asarray(getattr(rst, field)), err_msg=field
            )

    def test_state_validity_and_stats(self):
        (state, stats), _ = self._run(num_steps=250)
        boards = np.asarray(state.boards)
        assert boards.min() >= 0 and boards.max() <= core.MAX_EXPONENT
        # Every live board has at least one tile.
        assert (boards.reshape(boards.shape[0], -1).sum(axis=1) > 0).all()
        assert (np.asarray(state.score) >= 0).all()
        assert (np.asarray(state.steps) >= 0).all()
        # Random play over 250 steps finishes episodes in most envs.
        episodes = np.asarray(stats.episodes)
        assert episodes.sum() > 0
        lengths = np.asarray(stats.episode_length_sum)
        done_envs = episodes > 0
        mean_len = lengths[done_envs].sum() / episodes[done_envs].sum()
        # Random 2048 games (counting no-op moves) last ~50-250 steps.
        assert 20 < mean_len < 260
        assert np.asarray(stats.max_exponent).max() >= 4  # reached a 16 tile
        # Scores are consistent: positive where episodes ended.
        assert (np.asarray(stats.episode_score_sum)[done_envs] > 0).all()

    def test_reference_rollout_agrees_with_jnp_engine_shape(self):
        # Sanity: the reference rollout's mean episode length is in the same
        # ballpark as the threefry engine's on the same board count.
        (state, stats), _ = self._run(num_steps=250)
        st2 = vector.reset_batch(jax.random.key(9), 256)
        _, outs = vector.rollout_random(st2, 250)
        eng_eps = np.asarray(outs.done).sum()
        fused_eps = np.asarray(stats.episodes).sum()
        assert eng_eps > 0 and fused_eps > 0
        ratio = fused_eps / eng_eps
        assert 0.5 < ratio < 2.0


class TestFusedRolloutSharded:
    """The fused kernel composes with shard_map over a device mesh.

    Per-env randomness is injected (sharded along the same batch axis), so
    the 8-device run must be bit-identical to the single-device reference —
    the multi-chip scaling story for the headline bench is just dp-sharding
    the batch over the mesh with zero collectives.
    """

    def test_sharded_matches_reference(self):
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
        B, T = 1024, 6
        state = vector.reset_batch(jax.random.key(0), B)
        bits = jax.random.bits(jax.random.key(1), (T, 5, B), dtype=jnp.uint32)

        def local_roll(st, bt):
            return fused.rollout_random_fused(
                st, 0, T, block_envs=128, interpret=True, bits=bt
            )

        specs_state = jax.tree.map(lambda _: P("dp"), state)
        specs_stats = fused.FusedRolloutStats(P("dp"), P("dp"), P("dp"), P("dp"))
        sharded = jax.shard_map(
            local_roll,
            mesh=mesh,
            in_specs=(specs_state, P(None, None, "dp")),
            out_specs=(specs_state, specs_stats),
            check_vma=False,
        )
        s_sh, st_sh = jax.jit(sharded)(state, bits)
        s_ref, st_ref = fused.rollout_bits_reference(state, bits)
        np.testing.assert_array_equal(np.asarray(s_sh.boards), np.asarray(s_ref.boards))
        np.testing.assert_array_equal(np.asarray(s_sh.score), np.asarray(s_ref.score))
        np.testing.assert_array_equal(
            np.asarray(st_sh.episodes), np.asarray(st_ref.episodes)
        )
