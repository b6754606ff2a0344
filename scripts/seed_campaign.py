"""Seed-replication campaign: N full-schedule runs + SPS comparison each.

Round-3 verdict: the congested/dynamic/scale headline PRR results were
single seeds while the toy 8-seed sweep proved seed variance is real and
large (2/8 collapse).  This driver reruns a config's FULL schedule for
``--seeds`` seeds in one process (device/tunnel init amortized), greedy-
evaluates each trained policy against the SPS baseline with the same
protocol as scripts/full_run.py, and writes one JSON artifact with the
per-seed rows and the distribution summary that RESULTS.md tables render
from (scripts/render_results.py).

Usage: python scripts/seed_campaign.py <config.yaml> <out.json>
       [--seeds 5] [--slots N] [--eval-steps 500] [--eval-envs 16]
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
    p.add_argument("out")
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--slots", type=int, default=None)
    p.add_argument("--eval-steps", type=int, default=500)
    p.add_argument("--eval-envs", type=int, default=16)
    p.add_argument("--dtype", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from diral_tpu.config import load_config
    from diral_tpu.train.evaluate import compare_drqn_vs_sps
    from diral_tpu.train.runner import train_experiment

    cfg = load_config(args.config)
    if args.slots:
        cfg = dataclasses.replace(cfg, time_slots=args.slots)
    # campaign runs skip disk artifacts: the product is the distribution
    cfg = dataclasses.replace(cfg, save_model=False, save_results=False,
                              save_positions=False)
    if args.dtype:
        cfg = dataclasses.replace(
            cfg, agent=dataclasses.replace(
                cfg.agent, network=dataclasses.replace(
                    cfg.agent.network, compute_dtype=args.dtype)))
    print(f"devices: {jax.devices()}", flush=True)
    eval_cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=args.eval_envs))

    rows = []
    for seed in range(args.seeds):
        t0 = time.time()
        carry, logs = train_experiment(cfg, workdir="/tmp/seed_campaign_wd",
                                       seed=seed, verbose=False)
        train_s = time.time() - t0
        sr = logs["sum_reward"][:, 0]
        n10 = max(1, len(sr) // 10)
        curve = [round(float(sr[i * n10:(i + 1) * n10].mean()), 3)
                 for i in range(10) if i * n10 < len(sr)]
        comp = compare_drqn_vs_sps(eval_cfg, carry.learner,
                                   jax.random.PRNGKey(1),
                                   steps=args.eval_steps)
        row = {
            "seed": seed,
            "train_seconds": round(train_s, 1),
            "slots_per_sec": round(cfg.time_slots / train_s, 1),
            "final_decile_sum_reward": curve[-1],
            "reward_curve_deciles": curve,
            "drqn_prr": round(comp["drqn"]["mean_prr"], 4),
            "sps_prr": round(comp["sps"]["mean_prr"], 4),
            "prr_improvement": round(comp["prr_improvement"], 4),
        }
        rows.append(row)
        print(f"seed {seed}: {json.dumps(row)}", flush=True)

    imp = np.array([r["prr_improvement"] for r in rows])
    summary = {
        "config": args.config,
        "time_slots": cfg.time_slots,
        "seeds": args.seeds,
        "eval_steps": args.eval_steps,
        "eval_envs": args.eval_envs,
        "cli": (f"python scripts/seed_campaign.py {args.config} {args.out} "
                f"--seeds {args.seeds}"),
        "rows": rows,
        "prr_improvement_mean": round(float(imp.mean()), 4),
        "prr_improvement_std": round(float(imp.std(ddof=1)), 4)
        if len(imp) > 1 else 0.0,
        "prr_improvement_min": round(float(imp.min()), 4),
        "prr_improvement_max": round(float(imp.max()), 4),
        # "collapse" = the trained policy fails to beat SPS at all (the
        # toy sweep's degenerate-equilibrium failure mode)
        "n_below_sps": int((imp <= 0).sum()),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}),
          flush=True)


if __name__ == "__main__":
    main()
