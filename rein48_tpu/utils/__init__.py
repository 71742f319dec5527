# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Observability, checkpointing, and debugging utilities."""

from rein48_tpu.utils.checkpoint import Checkpointer  # noqa: F401
from rein48_tpu.utils.metrics import MetricLogger  # noqa: F401
