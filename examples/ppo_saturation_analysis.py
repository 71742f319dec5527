# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Saturation analysis of the PPO flagship lineage (VERDICT r4 item 2).

Item 2's done-bar is "greedy frac_2048 >= 0.85, OR a measured saturation
analysis (training curve flat over the last N x 1e8 frames)". This tool
concatenates the round-4 flagship run (8000 updates from scratch) with
the round-5 afterstate fine-tune (6000 more updates on the same policy)
and quantifies the trend of the training-time episode quality signal
(avg_episode_tile_sum under the stochastic behavior policy) over
windowed means, in frames.

CPU-only; reads runs/*/metrics.csv, writes
runs/ppo_afterstate_tpu/saturation.json.
"""

import csv
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAMES_PER_UPDATE = 8192 * 32


def load(path, update_offset=0):
    rows = []
    with open(os.path.join(ROOT, path)) as f:
        for r in csv.DictReader(f):
            rows.append(
                {
                    "update": int(float(r["update"])) + update_offset,
                    "tile_sum": float(r["avg_episode_tile_sum"]),
                    "entropy": float(r["entropy"]),
                }
            )
    return rows


def window_means(rows, n_windows=10):
    out = []
    per = max(1, len(rows) // n_windows)
    for i in range(0, len(rows), per):
        w = rows[i : i + per]
        out.append(
            {
                "updates": [w[0]["update"], w[-1]["update"]],
                "frames_end": w[-1]["update"] * FRAMES_PER_UPDATE,
                "mean_tile_sum": sum(r["tile_sum"] for r in w) / len(w),
                "mean_entropy": sum(r["entropy"] for r in w) / len(w),
            }
        )
    return out


def main():
    r4 = load("runs/ppo_flagship_tpu/metrics.csv")
    r5 = load("runs/ppo_afterstate_tpu/metrics.csv", update_offset=8000)
    rows = r4 + r5
    windows = window_means(rows, n_windows=14)
    # Trend over the final quarter of the combined run, in frames.
    q = max(2, len(windows) // 4)
    last = windows[-q:]
    first_of_last, end = last[0], last[-1]
    frames_span = end["frames_end"] - first_of_last["frames_end"]
    rel_change = (
        end["mean_tile_sum"] / first_of_last["mean_tile_sum"] - 1.0
        if first_of_last["mean_tile_sum"]
        else 0.0
    )
    out = {
        "signal": "avg_episode_tile_sum (stochastic behavior policy)",
        "frames_per_update": FRAMES_PER_UPDATE,
        "total_updates": rows[-1]["update"],
        "total_frames": rows[-1]["update"] * FRAMES_PER_UPDATE,
        "windows": windows,
        "final_quarter": {
            "frames_span": frames_span,
            "rel_change": round(rel_change, 4),
        },
    }
    dst = os.path.join(ROOT, "runs/ppo_afterstate_tpu/saturation.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    for w in windows:
        print(
            f"updates {w['updates'][0]:>5}-{w['updates'][1]:>5} "
            f"({w['frames_end'] / 1e9:5.2f}B frames): tile_sum "
            f"{w['mean_tile_sum']:7.0f}  entropy {w['mean_entropy']:.3f}"
        )
    print(
        f"final-quarter trend: {100 * rel_change:+.1f}% over "
        f"{frames_span / 1e9:.2f}B frames"
    )
    print("wrote", dst)


if __name__ == "__main__":
    main()
