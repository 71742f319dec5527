# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""TPU-native custom ops (Pallas kernels and MXU reformulations)."""

from rein48_tpu.ops.tables import (  # noqa: F401
    MXU_TABLE_MAX,
    mxu_gather,
    mxu_scatter_stats,
    mxu_scatter_sum,
    supports_mxu,
)
