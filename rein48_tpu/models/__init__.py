# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Policy/value networks (TPU-native Flax rebuilds of the reference nets)."""

from rein48_tpu.models.nets import (  # noqa: F401
    A3CMLP,
    CNNPolicy,
    QNetwork,
    ResNetPolicy,
    count_params,
    make_model,
)
from rein48_tpu.models.obs import (  # noqa: F401
    NUM_PLANES,
    encode_onehot,
    encode_raw,
)
