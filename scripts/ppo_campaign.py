"""PPO evidence campaign (round-5 VERDICT #5): seed distribution + greedy
PRR-vs-SPS eval for the PS-PPO slice, holding it to the same claim frame
as every other headline (the reference scopes its claim as PRR vs SPS,
/root/reference/README.md:5).

Runs >=3 seeds of configs/ppo_congested.yaml under the full schedule, each
followed by a greedy (argmax-logit) eval against SPS (500 slots x 16 envs,
train/evaluate.compare_ppo_vs_sps).  Writes results/ppo_seeds.json,
rendered into RESULTS.md by scripts/render_results.py.

Usage: python scripts/ppo_campaign.py [--seeds 3] [--episodes N] [--cpu]
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
    p.add_argument("--config", default="configs/ppo_congested.yaml")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--episodes", type=int, default=None)
    p.add_argument("--eval-steps", type=int, default=500)
    p.add_argument("--eval-envs", type=int, default=16)
    p.add_argument("--out", default="results/ppo_seeds.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from diral_tpu.config import load_config
    from diral_tpu.train import ppo_loop
    from diral_tpu.train.evaluate import compare_ppo_vs_sps

    cfg = load_config(args.config)
    episodes = args.episodes or cfg.time_slots // cfg.episode_interval
    run = ppo_loop.make_ppo_functions(cfg)
    print(f"devices: {jax.devices()}; {episodes} episodes, "
          f"{cfg.engine.num_envs} envs", flush=True)

    out = {"config": args.config, "episodes": episodes,
           "eval_steps": args.eval_steps, "eval_envs": args.eval_envs,
           "runs": []}
    for seed in range(args.seeds):
        t0 = time.time()
        learner, logs = run(jax.random.PRNGKey(seed), episodes)
        r = np.asarray(logs["mean_sum_reward"], np.float64)
        float(r[-1])
        train_s = time.time() - t0
        first = round(float(r[:100].mean()), 3)
        last = round(float(r[-100:].mean()), 3)
        eval_cfg = dataclasses.replace(
            cfg, engine=dataclasses.replace(cfg.engine,
                                            num_envs=args.eval_envs))
        comp = compare_ppo_vs_sps(eval_cfg, learner,
                                  jax.random.PRNGKey(100 + seed),
                                  steps=args.eval_steps)
        row = {"seed": seed, "train_s": round(train_s, 1),
               "slots_per_sec": round(episodes * cfg.episode_interval
                                      / train_s, 1),
               "sum_r_first100": first, "sum_r_last100": last,
               "compare_vs_sps": comp}
        out["runs"].append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
