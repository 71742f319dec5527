# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Multi-host SPMD initialization and sharded-run helpers.

The reference's only notion of scale is one process with
``cpu_count()`` threads (``/root/reference/algorithm/a3c/a3c.py:16-17``).
The TPU-native scale-out story (BASELINE.md config #5):

* one controller process per host, joined with
  ``jax.distributed.initialize`` (coordinator address from env/flags);
* ONE global mesh over every chip of the slice; env batch sharded over
  the global "dp" axis, so each chip owns B/num_devices boards and steps
  them entirely locally (the engine's per-env keys make this
  collective-free — see ``engine/vector.py``);
* the learner's gradient all-reduce is the only recurring collective; XLA
  routes the intra-host legs over ICI and inter-host legs over DCN from
  the same ``psum``;
* host 0 owns logging/checkpointing (orbax handles distributed arrays).

Single-process multi-device (one host, 8 chips — config #4) needs none of
this: ``make_mesh()`` over ``jax.devices()`` suffices.

Everything here is exercised in CI via the 8-virtual-device CPU backend;
real multi-host runs only add the ``initialize()`` call.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

from rein48_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class HostTopology:
    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int

    @property
    def is_primary(self) -> bool:
        return self.process_index == 0


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostTopology:
    """Join (or skip joining) the multi-host job; return the topology.

    No-ops in single-process settings: call it unconditionally at program
    start. Arguments default to the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS`` etc.), so launchers can configure via
    environment only.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is not None:
        # Ordering matters: jax.distributed.initialize must run before the
        # local backend comes up, and merely ASKING jax.process_count()
        # initializes that backend — so a late call would silently no-op a
        # real multi-host join (every host would think it is a 1-process
        # job). Detect the states without touching the backend and fail
        # loudly on the ordering bug instead.
        from jax._src import distributed as _dist
        from jax._src import xla_bridge as _bridge

        if _dist.global_state.coordinator_address is not None:
            pass  # already joined — idempotent re-call
        elif _bridge.backends_are_initialized():
            raise RuntimeError(
                "multihost.initialize() called after the JAX backend was "
                "already initialized (some jax computation or device query "
                "ran first). jax.distributed.initialize cannot take effect "
                "now; call multihost.initialize() at program start, before "
                "any other JAX use."
            )
        else:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=num_processes,
                process_id=process_id,
            )
    return HostTopology(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def global_mesh(tp: int = 1) -> jax.sharding.Mesh:
    """The slice-wide (dp, tp) mesh.

    ``jax.devices()`` in a multi-process job returns ALL devices in a
    host-major order, so the dp axis is laid out with each host's chips
    contiguous: batch shards land on local chips and the gradient
    all-reduce's ring crosses DCN the minimum number of times.
    """
    return mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=None, tp=tp))


def host_local_batch(global_batch: int) -> int:
    """Per-host share of a global env batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} % {n} hosts != 0")
    return global_batch // n
