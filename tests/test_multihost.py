# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Real multi-process (simulated multi-host) distributed test on CPU.

Launches 2 controller processes that join via
``jax.distributed.initialize`` on localhost, build the slice-wide mesh
(2 processes x 4 local CPU devices = dp 8), run the sharded A3C train
step, and verify every process computes the identical loss — the
single-controller-per-host SPMD pattern of BASELINE config #5, minus the
real DCN. This is the distributed test layer the reference lacks
entirely (its "distribution" is Python threads, SURVEY.md §2.14).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
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
    from rein48_tpu.train.a3c import A3CConfig, init_a3c, make_a3c_step

    mesh = multihost.global_mesh()
    assert mesh.shape == {"dp": 8, "tp": 1}

    config = A3CConfig(
        batch_size=16, unroll_len=2, model="mlp", obs_encoding="onehot"
    )
    state, model, optimizer = init_a3c(config, jax.random.key(0))
    # Every process built the same full global state from the same seed;
    # each contributes ITS half as process-local data of the global array.
    half = config.batch_size // 2
    state = dataclasses.replace(
        state,
        env=jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                mesh_lib.batch_sharding(mesh),
                x[pid * half : (pid + 1) * half],
            ),
            state.env,
        ),
        params=jax.device_put(state.params, mesh_lib.replicated_sharding(mesh)),
        opt_state=jax.device_put(
            state.opt_state, mesh_lib.replicated_sharding(mesh)
        ),
    )
    step = jax.jit(make_a3c_step(config, model, optimizer))
    state, metrics = step(state)
    # Every process must agree on the (replicated) loss.
    print(f"LOSS {pid} {float(metrics['loss']):.9f}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_a3c(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""),
    )
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
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
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS"):
                _, pid, val = line.split()
                losses[pid] = val
    assert set(losses) == {"0", "1"}, outs
    assert losses["0"] == losses["1"], losses
