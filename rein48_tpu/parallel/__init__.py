# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Device-mesh parallelism: mesh construction, shardings, SPMD learners."""

from rein48_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_env_state,
)
from rein48_tpu.parallel.spmd import psum_mean_grads  # noqa: F401
