# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Sharding/SPMD tests on the 8-virtual-device CPU mesh.

The distributed claims the engine makes — sharding-invariance of env
stepping, auto-inserted gradient all-reduce matching the single-device
update, explicit shard_map+psum equivalence — are all testable without
TPUs (conftest forces 8 CPU devices), which is exactly the "fake backend"
testing layer the reference lacked (SURVEY.md §4-5).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from rein48_tpu.engine import vector
from rein48_tpu.parallel import mesh as mesh_lib
from rein48_tpu.parallel import spmd
from rein48_tpu.train.a3c import A3CConfig, init_a3c, make_a3c_step

TINY_RESNET = (("channels", 8), ("num_blocks", 1))


def _mesh():
    return mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=8, tp=1))


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = _mesh()
        assert mesh.shape == {"dp": 8, "tp": 1}

    def test_bad_shape_raises(self):
        import pytest

        with pytest.raises(ValueError):
            mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=3, tp=2))

    def test_shard_env_state_places_batch_axis(self):
        mesh = _mesh()
        st = vector.reset_batch(jax.random.key(0), 64)
        sharded = mesh_lib.shard_env_state(st, mesh)
        shard_shapes = [
            s.data.shape for s in sharded.boards.addressable_shards
        ]
        assert all(shape == (8, 4, 4) for shape in shard_shapes)


class TestShardingInvariance:
    def test_rollout_identical_sharded_vs_local(self):
        """Sharding the env batch must not change a single bit."""
        mesh = _mesh()
        st = vector.reset_batch(jax.random.key(3), 64)
        final_local, out_local = vector.rollout_random(st, 20)

        st_sharded = mesh_lib.shard_env_state(st, mesh)
        final_shard, out_shard = vector.rollout_random(st_sharded, 20)

        np.testing.assert_array_equal(
            np.asarray(final_local.boards), np.asarray(final_shard.boards)
        )
        np.testing.assert_array_equal(
            np.asarray(out_local.reward), np.asarray(out_shard.reward)
        )
        np.testing.assert_array_equal(
            np.asarray(out_local.done), np.asarray(out_shard.done)
        )


class TestA3CSharded:
    def test_sharded_update_matches_single_device(self):
        """Auto-SPMD (jit + NamedSharding) == unsharded update, bit-wise on
        the loss and near-exact on params."""
        cfg = A3CConfig(
            batch_size=16, unroll_len=3, model="resnet", model_kwargs=TINY_RESNET
        )
        state, model, opt = init_a3c(cfg, jax.random.key(0))
        step = jax.jit(make_a3c_step(cfg, model, opt))
        ref_state, ref_metrics = step(state)

        mesh = _mesh()
        sharded = dataclasses.replace(
            state,
            env=mesh_lib.shard_env_state(state.env, mesh),
            params=jax.device_put(
                state.params, mesh_lib.replicated_sharding(mesh)
            ),
            opt_state=jax.device_put(
                state.opt_state, mesh_lib.replicated_sharding(mesh)
            ),
        )
        sh_state, sh_metrics = step(sharded)

        np.testing.assert_allclose(
            float(ref_metrics["loss"]), float(sh_metrics["loss"]), rtol=1e-5
        )
        ref_leaves = jax.tree.leaves(ref_state.params)
        sh_leaves = jax.tree.leaves(sh_state.params)
        for a, b in zip(ref_leaves, sh_leaves):
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32),
                np.asarray(b, dtype=np.float32),
                atol=1e-5,
                rtol=1e-4,
            )


class TestTensorParallel:
    """The "tp" axis is wired: kernels shard over it and training still
    computes the single-device answer (VERDICT r3 weak item 4)."""

    def _mesh24(self):
        return mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=2, tp=4))

    def test_param_specs_shard_feature_axes(self):
        mesh = self._mesh24()
        cfg = A3CConfig(batch_size=8, unroll_len=2, model="mlp")
        state, _, _ = init_a3c(cfg, jax.random.key(0))
        specs = mesh_lib.param_specs(state.params, mesh)
        # hidden=64 divides tp=4 -> tower kernels shard; the 1-unit
        # critic head and all biases stay replicated.
        assert specs["actor_fc"]["kernel"] == P(None, "tp")
        assert specs["actor_out"]["kernel"] == P(None, "tp")  # 4 % 4 == 0
        assert specs["critic_out"]["kernel"] == P()  # 1 unit, indivisible
        assert specs["actor_fc"]["bias"] == P()
        # Optimizer moments mirror the param specs through the same fn.
        opt_specs = mesh_lib.param_specs(
            state.opt_state, mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=2, tp=4))
        )
        flat = jax.tree.leaves(opt_specs)
        assert any(s == P(None, "tp") for s in flat)

    def test_tp_sharded_update_matches_single_device(self):
        """dp=2 x tp=4: GSPMD-partitioned matmuls + collectives produce
        the same update as one device (f32 MLP, so only reduction-order
        rounding differs)."""
        cfg = A3CConfig(batch_size=16, unroll_len=3, model="mlp")
        state, model, opt = init_a3c(cfg, jax.random.key(0))
        step = jax.jit(make_a3c_step(cfg, model, opt))
        ref_state, ref_metrics = step(state)

        mesh = self._mesh24()
        sharded = dataclasses.replace(
            state,
            env=mesh_lib.shard_env_state(state.env, mesh),
            params=mesh_lib.shard_params(state.params, mesh),
            opt_state=mesh_lib.shard_params(state.opt_state, mesh),
        )
        # The placement really is tensor-parallel: 4-way split kernels.
        kernel = sharded.params["actor_fc"]["kernel"]
        full = kernel.shape  # [flat_obs, hidden]
        assert {s.data.shape for s in kernel.addressable_shards} == {
            (full[0], full[1] // 4)
        }

        sh_state, sh_metrics = step(sharded)
        np.testing.assert_allclose(
            float(ref_metrics["loss"]), float(sh_metrics["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32),
                np.asarray(b, dtype=np.float32),
                atol=1e-5,
                rtol=1e-4,
            )

    def test_tp1_is_replicated(self):
        mesh = _mesh()  # dp=8, tp=1
        cfg = A3CConfig(batch_size=8, unroll_len=2, model="mlp")
        state, _, _ = init_a3c(cfg, jax.random.key(0))
        specs = mesh_lib.param_specs(state.params, mesh)
        assert all(s == P() for s in jax.tree.leaves(specs))


class TestShardMapExplicit:
    def test_psum_mean_grads_equals_global_mean(self):
        """Explicit shard_map + psum == single-program grad of global mean."""
        mesh = _mesh()

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        w = jnp.ones((4, 2))
        x = jax.device_put(
            jax.random.normal(jax.random.key(0), (32, 4)),
            mesh_lib.batch_sharding(mesh),
        )
        want = jax.grad(loss)(w, x)

        def local_step(w, x_local):
            g = jax.grad(loss)(w, x_local)
            return spmd.psum_mean_grads(g)

        got = jax.jit(
            jax.shard_map(
                local_step,
                mesh=mesh,
                in_specs=(P(), P("dp")),
                out_specs=P(),
                check_vma=False,
            )
        )(w, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6
        )
