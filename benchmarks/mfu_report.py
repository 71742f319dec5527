# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""MFU accounting for the recorded dense-family runs (VERDICT r4 item 5).

Reads the recorded frames/s from each run artifact under runs/, counts
the nets' forward FLOPs with XLA cost analysis (utils/flops.py), applies
per-family pass accounting, and writes benchmarks/mfu_r5.json with an
MFU column against the TPU v5e bf16 peak (197 TFLOP/s).

Pass accounting per frame (bwd = 2x fwd, the standard convention):
* A3C: 1 acting fwd + 1 reuse fwd+bwd               =  4 fwd-equiv
* PPO: 1 acting fwd + num_epochs fwd+bwd            = 13 at epochs=4
* PPO+afterstate: + num_epochs fwd+bwd of the after net (equal size)
* DQN: 1 acting fwd + (learn_batch/frames_per_update) x
       (2 extra fwd [online s', target s'] + 1 fwd+bwd [online s])

CPU-only (cost analysis needs no TPU): run with PALLAS_AXON_POOL_IPS=.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from rein48_tpu.models import nets
from rein48_tpu.utils import flops as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _steps_per_sec(path, *keys):
    try:
        with open(os.path.join(ROOT, path)) as f:
            d = json.load(f)
    except FileNotFoundError:
        return None, None
    v = d
    for k in keys:
        v = v.get(k) if isinstance(v, dict) else None
        if v is None:
            return None, d
    return float(v), d


def main():
    resnet_fwd = F.model_forward_flops(nets.make_model("resnet"))
    rows = []

    def add(family, artifact, fps, flops_per_frame, bound):
        if fps is None:
            print(f"[skip] {family}: no recorded frames/s in {artifact}")
            return
        m = F.mfu(fps, flops_per_frame)
        rows.append(
            {
                "family": family,
                "artifact": artifact,
                "frames_per_sec": fps,
                "model_flops_per_frame": flops_per_frame,
                "achieved_tflops": fps * flops_per_frame / 1e12,
                "mfu_vs_v5e_bf16_peak": round(m, 4),
                "bound": bound,
            }
        )

    # --- A3C (ResNet, B=8192, T=32): 1 acting fwd + 1 fwd+bwd ---------
    fps, _ = _steps_per_sec("runs/a3c_flagship_tpu/eval.json", "steps_per_sec")
    if fps is None:  # fall back to the round-1 recorded rate
        fps = 1.48e6
        art = "BASELINE.md round-1 (1.48M frames/s)"
    else:
        art = "runs/a3c_flagship_tpu/eval.json"
    add(
        "a3c",
        art,
        fps,
        F.train_flops_per_frame(resnet_fwd, reuse_passes=1),
        "env+acting bound: 1 learner pass per frame leaves the MXU idle "
        "between rollout forwards; raise reuse (PPO) or batch to push it",
    )

    # --- PPO flagship r4 (epochs=4) -----------------------------------
    fps, d = _steps_per_sec("runs/ppo_flagship_tpu/eval.json", "steps_per_sec")
    add(
        "ppo",
        "runs/ppo_flagship_tpu/eval.json",
        fps,
        F.train_flops_per_frame(resnet_fwd, reuse_passes=4),
        "learner bound: 12 of 13 fwd-equiv are the epoch reuse; minibatch "
        "[65536, 4, 4, C] convs tile the MXU well, rest is rollout env+fwd",
    )

    # --- PPO + afterstate critic r5 (epochs=4 on both nets) ------------
    fps, d = _steps_per_sec("runs/ppo_afterstate_tpu/eval.json", "steps_per_sec")
    add(
        "ppo_afterstate",
        "runs/ppo_afterstate_tpu/eval.json",
        fps,
        F.train_flops_per_frame(
            resnet_fwd,
            reuse_passes=4,
            extra_forward_flops=resnet_fwd,
            extra_reuse_passes=4,
        ),
        "learner bound: two equal ResNets in the epoch loop (25 fwd-equiv "
        "per frame); highest-MFU config in the suite",
    )

    # --- Deep afterstate-TD r5 (acting = 4 afterstate fwds/frame, ------
    # --- learn = num_epochs(2) fwd+bwd per frame) ----------------------
    fps, d = _steps_per_sec("runs/afterstate_td_tpu/eval.json", "steps_per_sec")
    add(
        "afterstate_td",
        "runs/afterstate_td_tpu/eval.json",
        fps,
        F.train_flops_per_frame(resnet_fwd, rollout_forwards=4, reuse_passes=2),
        "acting bound: the depth-0 planner evaluates all 4 afterstates "
        "per move (4x the policy-gradient acting batch); highest "
        "capability per chip-second in the deep suite",
    )

    # --- DQN r4/r5 (learn_batch == frames per update) ------------------
    for tag, path in (
        ("dqn", "runs/dqn_tpu/eval.json"),
        ("dqn_nstep", "runs/dqn_r5_tpu/eval.json"),
    ):
        fps, d = _steps_per_sec(path, "steps_per_sec")
        if fps is None:
            print(f"[skip] {tag}: no artifact at {path}")
            continue
        cfg = (d or {}).get("config", {})
        frames_per_update = cfg.get("num_envs", 4096) * cfg.get(
            "acting_steps_per_update", 2
        )
        ratio = 8192.0 / frames_per_update  # learn_batch_size default
        # acting fwd + ratio * (2 extra fwd + 1 fwd + bwd = 5 fwd-equiv)
        add(
            tag,
            path,
            fps,
            resnet_fwd * (1.0 + 5.0 * ratio),
            "acting+replay bound: only 1 learner minibatch per 2 acting "
            "steps; raise learn_batch or updates-per-step for more MXU",
        )

    out = {"peak": "TPU v5e bf16 197 TFLOP/s", "resnet_fwd_flops": resnet_fwd,
           "rows": rows}
    dst = os.path.join(ROOT, "benchmarks", "mfu_r5.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    for r in rows:
        print(
            f"{r['family']:16s} {r['frames_per_sec']:>12,.0f} f/s  "
            f"{r['achieved_tflops']:6.1f} TFLOP/s  MFU "
            f"{100 * r['mfu_vs_v5e_bf16_peak']:5.1f}%"
        )
    print("wrote", dst)


if __name__ == "__main__":
    main()
