# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Real multi-process (simulated multi-host) distributed tests on CPU.

Launches 2 controller processes that join via
``jax.distributed.initialize`` on localhost, build the slice-wide mesh
(2 processes x 4 local CPU devices = dp 8), run a sharded train step,
and verify every process computes the identical replicated metric — the
single-controller-per-host SPMD pattern of BASELINE config #5, minus the
real DCN. Covered trainers: A3C (grad psum), PPO (shard-friendly
minibatch permutation), DQN (sharded replay buffer), and n-tuple TD
(replicated-table scatter all-reduce). This is
the distributed test layer the reference lacks entirely (its
"distribution" is Python threads, SURVEY.md §2.14).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

PREAMBLE = textwrap.dedent(
    """
    import os, sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.devices()

    import dataclasses
    from rein48_tpu.parallel import mesh as mesh_lib, multihost

    mesh = multihost.global_mesh()
    assert mesh.shape == {"dp": 8, "tp": 1}

    def shard_batch(x, pid, num=2):
        # Every process built the same full global state from the same
        # seed; each contributes ITS slice as process-local data of the
        # global array.
        half = x.shape[0] // num
        return jax.make_array_from_process_local_data(
            mesh_lib.batch_sharding(mesh), x[pid * half : (pid + 1) * half]
        )
    """
)

A3C_WORKER = PREAMBLE + textwrap.dedent(
    """
    from rein48_tpu.train.a3c import A3CConfig, init_a3c, make_a3c_step

    config = A3CConfig(
        batch_size=16, unroll_len=2, model="mlp", obs_encoding="onehot"
    )
    state, model, optimizer = init_a3c(config, jax.random.key(0))
    state = dataclasses.replace(
        state,
        env=jax.tree.map(lambda x: shard_batch(x, pid), state.env),
        params=jax.device_put(state.params, mesh_lib.replicated_sharding(mesh)),
        opt_state=jax.device_put(
            state.opt_state, mesh_lib.replicated_sharding(mesh)
        ),
    )
    step = jax.jit(make_a3c_step(config, model, optimizer))
    state, metrics = step(state)
    # Every process must agree on the (replicated) loss.
    print(f"METRIC {pid} {float(metrics['loss']):.9f}", flush=True)
    """
)

PPO_WORKER = PREAMBLE + textwrap.dedent(
    """
    from rein48_tpu.train.ppo import PPOConfig, init_ppo, make_ppo_step

    # unroll 4 / minibatches 2 exercises the shard-friendly per-env time
    # permutation (train/ppo.py): every minibatch gather must stay inside
    # the local "dp" shard — the one mesh-specific PPO algorithm.
    config = PPOConfig(
        batch_size=16,
        unroll_len=4,
        num_epochs=2,
        num_minibatches=2,
        model="mlp",
    )
    assert config.shard_friendly_perm
    state, model, optimizer = init_ppo(config, jax.random.key(0))
    state = dataclasses.replace(
        state,
        env=jax.tree.map(lambda x: shard_batch(x, pid), state.env),
        params=jax.device_put(state.params, mesh_lib.replicated_sharding(mesh)),
        opt_state=jax.device_put(
            state.opt_state, mesh_lib.replicated_sharding(mesh)
        ),
    )
    step = jax.jit(make_ppo_step(config, model, optimizer))
    state, metrics = step(state)
    state, metrics = step(state)
    # Every process must agree on the (replicated) loss and KL.
    print(
        f"METRIC {pid} {float(metrics['loss']):.9f}"
        f" {float(metrics['approx_kl_last']):.9f}",
        flush=True,
    )
    """
)

DQN_WORKER = PREAMBLE + textwrap.dedent(
    """
    from rein48_tpu.train.dqn import DQNConfig, init_dqn, make_dqn_step

    config = DQNConfig(
        num_envs=16,
        model="mlp",
        replay_capacity=256,
        learn_batch_size=32,
        min_replay_before_learn=16,
        acting_steps_per_update=2,
    )

    # Build the global state INSIDE jit with out_shardings — the SPMD
    # init pattern for state that is not process-local data (the typed
    # PRNG key and replay scalars cannot ride device_put onto a
    # non-addressable sharding): every process traces the same program,
    # XLA materializes each leaf directly into its target sharding.
    def mk():
        state, _, _ = init_dqn(config, jax.random.key(0))
        return state

    batch = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated_sharding(mesh)
    template = jax.eval_shape(mk)

    def shard_for(path, leaf):
        name = jax.tree_util.keystr(path)
        # Env batch and the replay capacity axis shard over dp
        # (train/dqn.py mesh path); params/opt/scalars replicate.
        if len(leaf.shape) > 0 and (
            name.startswith(".env.") or name.startswith(".replay")
        ):
            return batch
        return repl

    shardings = jax.tree_util.tree_map_with_path(shard_for, template)
    state = jax.jit(mk, out_shardings=shardings)()
    model = config.make_model()
    from rein48_tpu.train import common
    optimizer = common.make_optimizer(
        config.optimizer, config.learning_rate,
        max_grad_norm=config.max_grad_norm,
    )
    step = jax.jit(make_dqn_step(config, model, optimizer))
    for _ in range(3):
        state, metrics = step(state)
    print(
        f"METRIC {pid} {float(metrics['loss']):.9f}"
        f" {float(metrics['replay_size']):.1f}",
        flush=True,
    )
    """
)

NTUPLE_WORKER = PREAMBLE + textwrap.dedent(
    """
    from rein48_tpu.agents import ntuple as ntuple_lib
    from rein48_tpu.train.ntuple import (
        NTupleTrainConfig, init_ntuple, make_ntuple_step
    )

    # Both update modes in one worker: the per-step scatter path and the
    # windowed dense-apply path both all-reduce replicated tables.
    for mode, window in (("step", None), ("delayed", 4)):
        config = NTupleTrainConfig(
            batch_size=16,
            steps_per_update=8,
            tuples=ntuple_lib.TINY_2X3,
            update_mode=mode,
            delay_window=window,
        )
        state, net = init_ntuple(config, jax.random.key(0))
        state = dataclasses.replace(
            state,
            env=jax.tree.map(lambda x: shard_batch(x, pid), state.env),
            prev_after=shard_batch(state.prev_after, pid),
            prev_valid=shard_batch(state.prev_valid, pid),
            params=jax.device_put(
                state.params, mesh_lib.replicated_sharding(mesh)
            ),
        )
        step = jax.jit(make_ntuple_step(config))
        state, metrics = step(state)
        state, metrics = step(state)
        table_sum = float(jax.numpy.sum(state.params["t0"]))
        print(
            f"METRIC-{mode} {pid} {table_sum:.9f}"
            f" {float(metrics['td_abs_err']):.9f}",
            flush=True,
        )
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, worker_src, metric_prefixes=("METRIC",)):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""),
    )
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            env=env,
            cwd="/root/repo",
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(out)
    for prefix in metric_prefixes:
        vals = {}
        for out in outs:
            for line in out.splitlines():
                if line.startswith(prefix + " "):
                    _, pid, *val = line.split()
                    vals[pid] = tuple(val)
        assert set(vals) == {"0", "1"}, (prefix, outs)
        assert vals["0"] == vals["1"], (prefix, vals)


@pytest.mark.slow
def test_two_process_distributed_a3c(tmp_path):
    _run_two_process(tmp_path, A3C_WORKER)


@pytest.mark.slow
def test_two_process_distributed_ppo(tmp_path):
    _run_two_process(tmp_path, PPO_WORKER)


@pytest.mark.slow
def test_two_process_distributed_dqn(tmp_path):
    _run_two_process(tmp_path, DQN_WORKER)


@pytest.mark.slow
def test_two_process_distributed_ntuple(tmp_path):
    _run_two_process(
        tmp_path, NTUPLE_WORKER, metric_prefixes=("METRIC-step", "METRIC-delayed")
    )


LATE_INIT_WORKER = textwrap.dedent(
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jnp.zeros(3).block_until_ready()  # backend now initialized

    from rein48_tpu.parallel import multihost

    try:
        multihost.initialize(coordinator_address="127.0.0.1:1")
    except RuntimeError as e:
        assert "before" in str(e), e
        print("ORDERING-GUARD-OK", flush=True)
    else:
        print("ORDERING-GUARD-MISSED", flush=True)
    """
)


def test_initialize_after_backend_raises(tmp_path):
    """A late multihost.initialize must raise, not silently no-op.

    ``jax.process_count()`` on an uninitialized backend *initializes* it,
    so the old ``process_count() == 1`` guard would turn a mis-ordered
    real multi-host join into a silent single-process run (VERDICT r2).
    """
    script = tmp_path / "late.py"
    script.write_text(LATE_INIT_WORKER)
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""),
    )
    out = subprocess.run(
        [sys.executable, str(script)],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, f"{out.stdout}\n{out.stderr}"
    assert "ORDERING-GUARD-OK" in out.stdout, out.stdout
