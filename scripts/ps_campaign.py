"""In-process PS-DQN / PS-DRQN results campaign (round-5 VERDICT #4).

Trains both parameter-shared flavors with the IN-PROCESS vmapped loop
(train/ps_loop.py) on the toy 4ue/3r scenario under a full-length episode
schedule, then greedy-evaluates each trained policy against the SPS
baseline with the same protocol every other headline uses (500 slots x 16
envs, train/evaluate.py).  Hyperparameters follow the reference PS agents'
own defaults where they differ from the DRQN driver: batch_size 64,
training_freq 1, target_update 1000 gradient steps (ps_dqn.py:58-61),
unroll_step 8 (ps_drqn.py:34).

Writes results/ps_campaign.json, rendered into RESULTS.md by
scripts/render_results.py (make results).

Usage: python scripts/ps_campaign.py [--seeds 3] [--episodes N] [--cpu]
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
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--episodes", type=int, default=None,
                   help="default: the toy schedule's time_slots/interval")
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--eval-steps", type=int, default=500)
    p.add_argument("--out", default="results/ps_campaign.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from diral_tpu.config import toy_4ue_3r
    from diral_tpu.train import ps_loop
    from diral_tpu.train.evaluate import compare_ps_vs_sps

    cfg = toy_4ue_3r(save_positions=False)
    cfg = dataclasses.replace(
        cfg,
        engine=dataclasses.replace(cfg.engine, num_envs=args.num_envs),
        agent=dataclasses.replace(cfg.agent, batch_size=64,
                                  target_update=1000))
    episodes = args.episodes or cfg.time_slots // cfg.episode_interval
    L = cfg.episode_interval
    print(f"devices: {jax.devices()}; {episodes} episodes x {L} slots, "
          f"{args.num_envs} envs", flush=True)

    out = {"config": "toy_4ue_3r + PS defaults (batch 64, target_update "
                     "1000, training_freq 1, unroll 8)",
           "episodes": episodes, "num_envs": args.num_envs,
           "eval_steps": args.eval_steps, "runs": []}
    for algo in ("ps-dqn", "ps-drqn"):
        _, _, run = ps_loop.make_ps_functions(cfg, algo)
        for seed in range(args.seeds):
            t0 = time.time()
            carry, logs = run(jax.random.PRNGKey(seed), episodes)
            r = np.asarray(logs["mean_sum_reward"], np.float64)
            float(r[-1])  # force completion (axon: scalar transfer)
            train_s = time.time() - t0
            n10 = max(1, len(r) // 10)
            curve = [round(float(r[i * n10:(i + 1) * n10].mean()), 3)
                     for i in range(10) if i * n10 < len(r)]
            comp = compare_ps_vs_sps(cfg, carry.learner,
                                     jax.random.PRNGKey(100 + seed),
                                     steps=args.eval_steps, algo=algo)
            slots_s = episodes * L / train_s
            row = {"algo": algo, "seed": seed,
                   "train_s": round(train_s, 1),
                   "slots_per_sec": round(slots_s, 1),
                   "curve_deciles": curve,
                   "final_decile_sum_r": curve[-1],
                   "compare_vs_sps": comp}
            out["runs"].append(row)
            print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
