"""Reproduce the reference's complete experiment suite on TPU.

Trains every YAML in /root/reference/configs/4ue_3r_toy/ -- the gamma sweep
{0.3, 0.5, 0.7, 0.95} and the num_bins sweep {10, 20, 40} that constitute
the reference's published experiment set (main_test.py:279-283 hardcodes
this list) -- each under its full 250,002-slot schedule, loading the
reference's own config files verbatim.  Greedy-evaluates each trained
policy against the SPS baseline and writes one JSON summary.

Usage: python scripts/ref_sweep.py [outdir] [--eval-steps N] [--eval-envs N]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_CONFIG_DIR = "/root/reference/configs/4ue_3r_toy"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("outdir", nargs="?", default="runs/ref_sweep")
    p.add_argument("--eval-steps", type=int, default=500)
    p.add_argument("--eval-envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--slots", type=int, default=None,
                   help="override time_slots (smoke testing)")
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

    os.makedirs(args.outdir, exist_ok=True)
    print(f"devices: {jax.devices()}", flush=True)
    rows = []
    for path in sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "*.yaml"))):
        name = (os.path.basename(path)
                .removeprefix("config_toy_4ue_3r_tests_db_")
                .removesuffix(".yaml")) or "unnamed"
        cfg = load_config(path)
        # result artifacts are per-config; model checkpoints not needed here
        cfg = dataclasses.replace(cfg, save_model=False,
                                  experiment_name=name)
        if args.slots:
            cfg = dataclasses.replace(cfg, time_slots=args.slots)
        t0 = time.time()
        carry, logs = train_experiment(
            cfg, workdir=os.path.join(args.outdir, name), seed=args.seed,
            verbose=False)
        train_s = time.time() - t0
        sr = logs["sum_reward"][:, 0]
        n10 = max(1, len(sr) // 10)
        curve = [round(float(sr[i * n10:(i + 1) * n10].mean()), 3)
                 for i in range(10) if i * n10 < len(sr)]
        eval_cfg = dataclasses.replace(
            cfg,
            engine=dataclasses.replace(cfg.engine, num_envs=args.eval_envs))
        comp = compare_drqn_vs_sps(eval_cfg, carry.learner,
                                   jax.random.PRNGKey(1),
                                   steps=args.eval_steps)
        row = {
            "config": name,
            "gamma": cfg.agent.gamma,
            "num_bins": cfg.env.state.num_bins,
            "state_space": cfg.env.state_space,
            "train_seconds": round(train_s, 1),
            "slots_per_sec": round(cfg.time_slots / train_s, 1),
            "reward_curve_deciles": curve,
            "final_mean_sum_reward": curve[-1],
            "drqn_prr": round(comp["drqn"]["mean_prr"], 4),
            "sps_prr": round(comp["sps"]["mean_prr"], 4),
            "prr_improvement": round(comp["prr_improvement"], 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(os.path.join(args.outdir, "sweep.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote", os.path.join(args.outdir, "sweep.json"), flush=True)


if __name__ == "__main__":
    main()
