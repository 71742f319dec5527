# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Explicit-collective SPMD helpers (shard_map learners).

Two ways to run the batched actor-learner over a mesh:

1. **Auto-SPMD (default)** — ``jax.jit`` with ``NamedSharding``s on inputs:
   params replicated, env batch on "dp". XLA's partitioner inserts the
   gradient ``all-reduce`` itself. This is the idiomatic path and what
   ``train/`` uses.
2. **Explicit (this module)** — ``jax.shard_map`` with a hand-placed
   ``jax.lax.psum`` over "dp", mirroring what the compiler does so the
   communication pattern is visible, testable, and swappable (e.g. to
   ``psum_scatter`` for very large models). This replaces the reference's
   cross-thread shared-variable "communication"
   (``/root/reference/algorithm/a3c/a3c.py:69-86``).

Both produce bit-identical updates on the same mesh (tested in
``tests/test_parallel.py``).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from rein48_tpu.parallel.mesh import DP_AXIS


def psum_mean_grads(grads, axis_name: str = DP_AXIS):
    """All-reduce-mean a gradient pytree across the data-parallel axis.

    Inside ``shard_map``/``pmap``: each shard contributes its local-batch
    mean gradient; the psum + divide yields the global-batch mean, keeping
    updates identical to the single-device program.
    """
    n = jax.lax.psum(1, axis_name)
    return jax.tree.map(lambda g: jax.lax.psum(g, axis_name) / n, grads)


def replicate_spec(tree):
    """Pytree of ``P()`` (fully replicated) matching ``tree``."""
    return jax.tree.map(lambda _: P(), tree)


def dp_batch_spec(tree):
    """Pytree of ``P('dp')`` (leading-axis sharded) matching ``tree``."""
    return jax.tree.map(lambda _: P(DP_AXIS), tree)
