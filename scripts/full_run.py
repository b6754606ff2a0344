"""Full-schedule experiment driver: train, then evaluate vs SPS, one process.

Runs the complete reference schedule (e.g. 250,002 slots for the 4ue_3r toy,
main_test.py:119 / config_...dis_07.yaml:4) on the attached device, then
greedy-evaluates the trained policy against the SPS baseline
(train/evaluate.py) without a checkpoint round-trip.  Writes a JSON summary
next to the run artifacts.

Usage: python scripts/full_run.py <config.yaml> <workdir> [--slots N]
       [--seed S] [--eval-steps N] [--eval-envs N]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("workdir")
    p.add_argument("--slots", type=int, default=None)
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-steps", type=int, default=500)
    p.add_argument("--eval-envs", type=int, default=16)
    p.add_argument("--dtype", default=None,
                   help="network compute dtype override (e.g. bfloat16)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from diral_tpu.config import load_config
    from diral_tpu.train.runner import train_experiment
    from diral_tpu.train.evaluate import compare_drqn_vs_sps

    cfg = load_config(args.config)
    if args.slots:
        cfg = dataclasses.replace(cfg, time_slots=args.slots)
    cfg = dataclasses.replace(cfg, save_model=True)
    if args.num_envs:
        cfg = dataclasses.replace(
            cfg,
            engine=dataclasses.replace(cfg.engine, num_envs=args.num_envs))
    if args.dtype:
        cfg = dataclasses.replace(
            cfg, agent=dataclasses.replace(
                cfg.agent, network=dataclasses.replace(
                    cfg.agent.network, compute_dtype=args.dtype)))
    os.makedirs(args.workdir, exist_ok=True)
    print(f"devices: {jax.devices()}", flush=True)

    t0 = time.time()
    carry, logs = train_experiment(cfg, workdir=args.workdir, seed=args.seed)
    train_s = time.time() - t0
    sr = logs["sum_reward"][:, 0]
    n10 = max(1, len(sr) // 10)
    curve = [round(float(sr[i * n10:(i + 1) * n10].mean()), 3)
             for i in range(10) if i * n10 < len(sr)]
    print(f"train done in {train_s:.0f}s; curve(deciles)={curve}", flush=True)

    t0 = time.time()
    eval_cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=args.eval_envs))
    comp = compare_drqn_vs_sps(eval_cfg, carry.learner, jax.random.PRNGKey(1),
                               steps=args.eval_steps)
    summary = {
        "config": args.config,
        "time_slots": cfg.time_slots,
        "train_seconds": round(train_s, 1),
        "slots_per_sec": round(cfg.time_slots / train_s, 1),
        "reward_curve_deciles": curve,
        "compare_vs_sps": comp,
        "eval_seconds": round(time.time() - t0, 1),
    }
    out = os.path.join(args.workdir, "summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
