# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Training-curve plots from metrics.csv.

The reference pops interactive matplotlib windows of SCORE/TD_ERROR at
exit (``/root/reference/algorithm/a3c/a3c.py:297-308``) — useless on a
headless TPU host. Here curves render to PNG from the CSV the
MetricLogger writes, decoupled from training:

    python -m rein48_tpu.utils.plot runs/a3c_tpu/metrics.csv
"""

from __future__ import annotations

import csv
import os
import sys
from typing import List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

DEFAULT_COLUMNS = (
    "avg_episode_tile_sum",
    "best_tile",
    "loss",
    "entropy",
    "steps_per_sec",
)


def plot_metrics(
    csv_path: str,
    out_path: Optional[str] = None,
    columns: Optional[List[str]] = None,
) -> str:
    """Render selected metric columns vs update index to a PNG."""
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise ValueError(f"{csv_path} is empty")
    cols = [
        c
        for c in (columns or DEFAULT_COLUMNS)
        if c in rows[0] and any(r.get(c) not in (None, "") for r in rows)
    ]
    x = [float(r.get("update", i)) for i, r in enumerate(rows)]

    fig, axes = plt.subplots(
        len(cols), 1, figsize=(8, 2.2 * len(cols)), sharex=True
    )
    if len(cols) == 1:
        axes = [axes]
    for ax, c in zip(axes, cols):
        ys = [float(r[c]) if r.get(c) not in (None, "") else float("nan") for r in rows]
        ax.plot(x, ys, lw=1.2)
        ax.set_ylabel(c)
        ax.grid(True, alpha=0.3)
    axes[-1].set_xlabel("update")
    fig.tight_layout()
    out_path = out_path or os.path.join(
        os.path.dirname(os.path.abspath(csv_path)), "curves.png"
    )
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m rein48_tpu.utils.plot <metrics.csv> [out.png]")
        return 2
    out = plot_metrics(argv[0], argv[1] if len(argv) > 1 else None)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
