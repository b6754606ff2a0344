"""Command-line interface.

Replaces the reference's hardcoded experiment list in ``__main__``
(main_test.py:267-295) with subcommands over config files:

    python -m diral_tpu train     <config.yaml> [--slots N] [--mesh SPEC] ...
    python -m diral_tpu train-ppo <config.yaml> [--episodes N]
    python -m diral_tpu train-ps  <config.yaml> [--algo ps-dqn|ps-drqn]
    python -m diral_tpu eval      <config.yaml> [--checkpoint DIR] [--steps N]
    python -m diral_tpu compare-sps <config.yaml> [--steps N]
    python -m diral_tpu serve     [--mode drqn|drqn-rssi|sps|compare] ...
    python -m diral_tpu bench
    python -m diral_tpu profile   <config.yaml> [--slots N] [--dtype D]

Reference YAMLs load as-is; the ``realness`` flag routes to the interop
gateway env (the reference driver hard-disables that path,
main_test.py:291-293 -- here it is a real capability, see diral_tpu.interop).
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def _load(args):
    from diral_tpu.config import load_config

    cfg = load_config(args.config)
    over = {}
    if getattr(args, "slots", None):
        over["time_slots"] = args.slots
    if over:
        cfg = dataclasses.replace(cfg, **over)
    if getattr(args, "num_envs", None):
        cfg = dataclasses.replace(
            cfg, engine=dataclasses.replace(cfg.engine, num_envs=args.num_envs)
        )
    return cfg


def cmd_train(args):
    if args.coordinator:
        # multi-process SPMD: every process runs this same command with
        # its own --process-id; the mesh below spans all processes' devices
        from diral_tpu.parallel.distributed import initialize

        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)
    cfg = _load(args)
    from diral_tpu.train.runner import run_all_simulations

    kw = dict(workdir=args.workdir, seed=args.seed, resume=args.resume,
              mesh=args.mesh)
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            run_all_simulations(cfg, **kw)
        print(f"profiler trace written to {args.profile}")
    else:
        run_all_simulations(cfg, **kw)


def cmd_train_ppo(args):
    cfg = _load(args)
    from diral_tpu.train.ppo_loop import run_ppo

    learner, logs = run_ppo(cfg, seed=args.seed or 0,
                            num_episodes=args.episodes)
    sr = np.asarray(logs["mean_sum_reward"])
    print(json.dumps({
        "episodes": int(sr.shape[0]),
        "mean_sum_reward_first100": float(sr[:100].mean()),
        "mean_sum_reward_last100": float(sr[-100:].mean()),
    }))


def cmd_train_ps(args):
    cfg = _load(args)
    algo = args.algo or cfg.agent.algorithm
    from diral_tpu.train.ps_loop import run_ps

    carry, logs = run_ps(cfg, algo, seed=args.seed or 0,
                         num_episodes=args.episodes)
    sr = np.asarray(logs["mean_sum_reward"])
    print(json.dumps({
        "algo": algo.lower(),
        "episodes": int(sr.shape[0]),
        "mean_sum_reward_first100": float(sr[:100].mean()),
        "mean_sum_reward_last100": float(sr[-100:].mean()),
        "final_eps": float(np.asarray(logs["eps"])[-1]),
    }))


def cmd_train_sweep(args):
    import jax

    cfg = _load(args)
    from diral_tpu.train.evaluate import compare_drqn_vs_sps
    from diral_tpu.train.sweep import run_seed_sweep, split_seed

    seeds = list(range(args.seeds))
    carries, logs = run_seed_sweep(cfg, seeds)
    sr = logs["sum_reward"][:, :, 0]          # [S, T]
    tail = sr[:, -max(1, sr.shape[1] // 10):].mean(axis=1)
    rows = []
    for i, s in enumerate(seeds):
        comp = compare_drqn_vs_sps(cfg, split_seed(carries, i).learner,
                                   jax.random.PRNGKey(1),
                                   steps=args.eval_steps)
        rows.append({"seed": s, "final_mean_sum_reward": round(float(tail[i]), 3),
                     "drqn_prr": round(comp["drqn"]["mean_prr"], 4),
                     "sps_prr": round(comp["sps"]["mean_prr"], 4),
                     "prr_improvement": round(comp["prr_improvement"], 4)})
    print(json.dumps(rows))


def _ckpt_dir(args):
    """--best swaps in the best-metric snapshot the runner keeps alongside
    the rolling checkpoints (the pre-greedy-collapse policy)."""
    if getattr(args, "best", False):
        return args.checkpoint.rstrip("/") + "_best"
    return args.checkpoint


def cmd_eval(args):
    import jax

    cfg = _load(args)
    from diral_tpu.agents import drqn
    from diral_tpu.train import checkpoint as ckpt
    from diral_tpu.train.evaluate import evaluate_drqn
    from diral_tpu.train.loop import make_train_functions

    init_carry, _, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(args.seed or 0))
    learner = carry.learner
    if args.checkpoint:
        mgr = ckpt.checkpoint_manager(_ckpt_dir(args))
        carry, step = ckpt.restore(mgr, carry)
        learner = carry.learner
        print(f"loaded checkpoint at slot {step}")
    print(json.dumps(evaluate_drqn(cfg, learner, jax.random.PRNGKey(1),
                                   steps=args.steps)))


def cmd_compare_sps(args):
    import jax

    cfg = _load(args)
    from diral_tpu.train import checkpoint as ckpt
    from diral_tpu.train.evaluate import compare_drqn_vs_sps
    from diral_tpu.train.loop import make_train_functions

    init_carry, _, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(args.seed or 0))
    if args.checkpoint:
        mgr = ckpt.checkpoint_manager(_ckpt_dir(args))
        carry, _ = ckpt.restore(mgr, carry)
    print(json.dumps(compare_drqn_vs_sps(cfg, carry.learner,
                                         jax.random.PRNGKey(1),
                                         steps=args.steps)))


def cmd_serve(args):
    """Online serving against the in-repo C++ RealNeS stand-in: the
    reference's intended-but-never-runnable external-simulator mode
    (main_test.py:291-293 hard-disables it), live here."""
    from diral_tpu.config import load_config, toy_4ue_3r

    if args.config:
        acfg = load_config(args.config).agent
    else:
        # defaults tuned on the 8-user/6-channel world: beats SPS by
        # +16.6 PRR points at 2500 rounds (RESULTS.md, online comparison)
        acfg = toy_4ue_3r().agent
        acfg = dataclasses.replace(
            acfg, batch_size=16, unroll_step=8, target_update=32,
            network=dataclasses.replace(acfg.network, use_lstm_input=False,
                                        use_dueling=False, layers=(64, 64)),
        )

    from diral_tpu.interop.gateway_env import GatewayEnv
    from diral_tpu.interop.serve import (compare_sps_over_gateway,
                                         serve_and_learn,
                                         serve_and_learn_dqn, serve_sps)

    seed = args.seed or 0
    if args.mode == "compare":
        print(json.dumps(compare_sps_over_gateway(
            acfg, sim_users=args.users, sim_channels=args.channels,
            rounds=args.rounds, train_every=args.train_every,
            n_batches=args.n_batches, eps=args.eps,
            eps_final=args.eps_final, seed=seed,
            transport=args.transport)))
        return

    sim_mode = {"drqn": "dist", "drqn-rssi": "syn", "ps-dqn": "syn",
                "sps": "sps"}[args.mode]
    env = GatewayEnv(port=args.port, sim_start=True, sim_users=args.users,
                     sim_channels=args.channels, sim_rounds=args.rounds + 5,
                     sim_seed=seed, sim_mode=sim_mode, state_design=2,
                     pos_dist=2, reward_design=args.reward_design,
                     distance_based_reward=args.distance_reward,
                     sim_transport=args.transport)
    try:
        if args.mode == "sps":
            print(json.dumps(serve_sps(env, args.rounds, seed=seed)))
        elif args.mode == "ps-dqn":
            _, stats = serve_and_learn_dqn(
                env, acfg, args.rounds, train_every=args.train_every,
                n_batches=args.n_batches, eps=args.eps,
                eps_final=args.eps_final, seed=seed)
            stats["losses"] = stats["losses"][-5:]
            print(json.dumps(stats))
        else:
            _, stats = serve_and_learn(
                env, acfg, args.rounds, train_every=args.train_every,
                n_batches=args.n_batches, eps=args.eps,
                eps_final=args.eps_final, seed=seed, mode=sim_mode)
            stats["losses"] = stats["losses"][-5:]
            print(json.dumps(stats))
    finally:
        env.close()


def cmd_bench(args):
    import bench

    bench.main()


def cmd_profile(args):
    """Per-op device profile of the training loop (train/profiling.py):
    steady-state slots/s + xplane op-attribution table."""
    from diral_tpu.train.profiling import profile_training

    print(json.dumps(profile_training(
        args.config, envs=args.num_envs or 16, slots=args.slots or 100,
        top=args.top, dtype=args.dtype, trace_dir=args.trace_dir)))


def main(argv=None):
    p = argparse.ArgumentParser(prog="diral_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, config=True):
        if config:
            sp.add_argument("config")
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--num-envs", type=int, default=None)

    sp = sub.add_parser("train", help="off-policy DRQN training (marl_test)")
    common(sp)
    sp.add_argument("--slots", type=int, default=None)
    sp.add_argument("--workdir", default=".")
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace into DIR")
    sp.add_argument("--mesh", default=None, metavar="SPEC",
                    help='device mesh, e.g. "data=8" or "data=4,model=2": '
                         "envs shard over data, net hidden dims over model")
    sp.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="jax.distributed coordinator for multi-process runs")
    sp.add_argument("--num-processes", type=int, default=None)
    sp.add_argument("--process-id", type=int, default=None)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("train-ppo", help="on-policy PPO training")
    common(sp)
    sp.add_argument("--episodes", type=int, default=None)
    sp.set_defaults(fn=cmd_train_ppo)

    sp = sub.add_parser(
        "train-ps",
        help="in-process PS-DQN / PS-DRQN training on the batched env")
    common(sp)
    sp.add_argument("--algo", choices=["ps-dqn", "ps-drqn"], default=None,
                    help="defaults to the config's RLAgent.algorithm")
    sp.add_argument("--episodes", type=int, default=None)
    sp.set_defaults(fn=cmd_train_ps)

    sp = sub.add_parser(
        "train-sweep",
        help="vmapped multi-seed training: S experiments in one program")
    common(sp)
    sp.add_argument("--slots", type=int, default=None)
    sp.add_argument("--seeds", type=int, default=8,
                    help="number of seeds (0..N-1)")
    sp.add_argument("--eval-steps", type=int, default=500)
    sp.set_defaults(fn=cmd_train_sweep)

    sp = sub.add_parser("eval", help="greedy evaluation of a checkpoint")
    common(sp)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--best", action="store_true",
                    help="use the best-reward snapshot (<ckpt>_best) "
                         "instead of the latest")
    sp.add_argument("--steps", type=int, default=500)
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("compare-sps", help="DIRAL vs SPS PRR comparison")
    common(sp)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--best", action="store_true",
                    help="use the best-reward snapshot (<ckpt>_best)")
    sp.add_argument("--steps", type=int, default=500)
    sp.set_defaults(fn=cmd_compare_sps)

    sp = sub.add_parser(
        "serve", help="online serving against the C++ RealNeS stand-in")
    sp.add_argument("--config", default=None,
                    help="optional YAML for the agent section")
    sp.add_argument("--mode", default="drqn",
                    choices=["drqn", "drqn-rssi", "ps-dqn", "sps", "compare"],
                    help="drqn: neighbor-table states; drqn-rssi: RSSI "
                         "states; ps-dqn: feedforward PS-DQN on RSSI "
                         "states; sps: the SPS baseline online; compare: "
                         "DIRAL-vs-SPS tail PRR on the same world seed")
    sp.add_argument("--users", type=int, default=8)
    sp.add_argument("--channels", type=int, default=6)
    sp.add_argument("--rounds", type=int, default=400)
    sp.add_argument("--train-every", type=int, default=10)
    sp.add_argument("--n-batches", type=int, default=4)
    sp.add_argument("--eps", type=float, default=0.5)
    sp.add_argument("--eps-final", type=float, default=0.02)
    sp.add_argument("--reward-design", type=int, default=2)
    sp.add_argument("--distance-reward", action="store_true",
                    help="rewards from reported positions "
                         "(realness_env.py:120-191) instead of PRR")
    sp.add_argument("--port", type=int, default=0)
    sp.add_argument("--transport", default="framed",
                    choices=["framed", "zmq"],
                    help="wire flavor for bridge AND simulator: "
                         "length-prefixed TCP or real libzmq")
    sp.add_argument("--seed", type=int, default=None)
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("bench", help="run the throughput benchmark")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser(
        "profile",
        help="per-op device profile of the training loop (xplane trace)")
    common(sp)
    sp.add_argument("--slots", type=int, default=100)
    sp.add_argument("--top", type=int, default=25)
    sp.add_argument("--dtype", default="float32")
    sp.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    sp.set_defaults(fn=cmd_profile)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
