"""BASELINE configs[4] at width (round-5 VERDICT #6): the fused-replay
HBM arithmetic for 100v/50r as a function of the env count B, a SHORT
measured training run at the largest B one chip fits, and the N-host
shard projection for the full 8192-env config.

The HBM model (all per env, from the actual carry shapes):

  replay ring   [S+T, N*Dp] * itemsize      (FusedWindowReplay, mirror pad)
  history       [N, T*Dp]   * itemsize
  env state     tables 4x[N,N] f32/i32 + last_arrival [N,N] i32
                + positions/vel/dir ~ 5 [N] vectors

Model/optimizer/targets are B-independent (~3 MB) and the train event's
gathered batch scales with batch_size, not B.

Usage: python scripts/width_report.py [--envs B] [--slots 2000] [--cpu]
Writes results/width_scale.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BYTES = 16 * 1024**3          # v5e: 16 GB (15.75 usable)
HBM_BUDGET = 0.85                 # leave headroom for XLA workspace/fusion
# XLA:TPU inserts a FULL-BUFFER copy of the replay ring inside the
# training loop body for the window GATHER's operand (measured with
# compiled.memory_analysis() bisects: single dynamic_slice reads of the
# while carry alias in place, batched gathers do not -- with or without
# donation, any formulation: vmapped dynamic_slice, take-rows, flat-1d).
# Peak HBM therefore carries ~2x the replay; the copy itself is
# async-overlapped time-wise but halves the largest B that fits.
GATHER_COPY_FACTOR = 2.0


def per_env_bytes(cfg, itemsize: int) -> dict:
    from diral_tpu.ops.pallas_lstm import padded_dim

    N, D = cfg.env.num_users, cfg.env.state_space
    T = cfg.agent.step_size
    Dp = padded_dim(D)
    S = cfg.memory_size
    replay = (S + T) * N * Dp * itemsize
    history = N * T * Dp * itemsize
    env = 5 * N * N * 4 + 5 * N * 4
    return {"replay": replay, "history": history, "env_state": env,
            "total": replay + history + env}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/scale_100v_50r.yaml")
    p.add_argument("--envs", type=int, default=None,
                   help="override the measured-run env count")
    p.add_argument("--slots", type=int, default=2000)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--out", default="results/width_scale.json")
    p.add_argument("--no-run", action="store_true",
                   help="arithmetic only, skip the measured run")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    from diral_tpu.config import load_config
    from diral_tpu.train.loop import sampler_collective_bytes

    cfg = load_config(args.config)
    out = {"config": args.config, "hbm_model": {}}
    budget = HBM_BYTES * HBM_BUDGET
    for name, item in (("float32", 4), ("bfloat16_storage", 2)):
        pe = per_env_bytes(cfg, item)
        peak = (pe["total"] - pe["replay"]
                + GATHER_COPY_FACTOR * pe["replay"])
        bmax = int(budget // peak)
        out["hbm_model"][name] = {
            "per_env_bytes": pe,
            "per_env_mb": round(pe["total"] / 2**20, 2),
            "per_env_peak_mb_with_gather_copy": round(peak / 2**20, 2),
            "largest_B_one_chip": bmax,
            "largest_pow2_B": 1 << (bmax.bit_length() - 1),
        }
        print(f"{name}: {pe['total']/2**20:.1f} MB/env logical, "
              f"{peak/2**20:.1f} peak w/ gather copy "
              f"(replay {pe['replay']/2**20:.1f}) -> B_max ~ {bmax} "
              f"(pow2 {1 << (bmax.bit_length() - 1)})", flush=True)

    # N-host shard projection for the full 8192-env config: replay/env
    # shard over "data"; the sampler's gathered batch is the ONLY
    # event-time collective (HLO-verified, tests/test_sharding.py) and
    # double-duties as the gradient sync.
    coll = sampler_collective_bytes(cfg)
    out["sampler_collective"] = coll
    ici_gbs = 186e9  # v5e per-chip ICI bandwidth (bidirectional aggregate)
    for name in out["hbm_model"]:
        bp = out["hbm_model"][name]["largest_pow2_B"]
        chips = max(1, 8192 // bp)
        out["hbm_model"][name]["chips_for_8192_envs"] = chips
        out["hbm_model"][name]["ring_bytes_per_device_per_event"] = (
            coll["ring_bytes_per_device_per_event"])
        out["hbm_model"][name]["collective_ms_per_event_at_ici"] = round(
            coll["ring_bytes_per_device_per_event"] / ici_gbs * 1e3, 2)
    print(f"sampler collective: {coll['bytes_per_event']/2**20:.1f} MB "
          f"gathered/event, ring {coll['ring_bytes_per_device_per_event']/2**20:.1f} "
          f"MB/device/event -> "
          f"{coll['ring_bytes_per_device_per_event']/ici_gbs*1e3:.2f} ms "
          f"at ICI {ici_gbs/1e9:.0f} GB/s", flush=True)

    if not args.no_run:
        import numpy as np

        from diral_tpu.train.loop import make_train_functions
        from diral_tpu.train.runner import make_chunk_runner

        key = "bfloat16_storage" if args.dtype == "bfloat16" else "float32"
        B = args.envs or out["hbm_model"][key]["largest_pow2_B"]
        run_cfg = dataclasses.replace(
            cfg,
            engine=dataclasses.replace(cfg.engine, num_envs=B),
            agent=dataclasses.replace(
                cfg.agent, network=dataclasses.replace(
                    cfg.agent.network, compute_dtype=args.dtype)))
        print(f"measured run: B={B}, {args.slots} slots, {args.dtype}",
              flush=True)
        init_carry, slot_step, _ = make_train_functions(run_cfg)
        carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
        run_chunk, _ = make_chunk_runner(slot_step)
        I = run_cfg.episode_interval
        t0 = (run_cfg.agent.batch_size + 100 + I - 1) // I * I
        t = time.perf_counter()
        carry, logs = run_chunk(carry, t0, args.slots)
        float(np.asarray(logs["sum_reward"]).sum())
        compile_s = time.perf_counter() - t
        rates = []
        for i in range(1, 4):
            t = time.perf_counter()
            carry, logs = run_chunk(carry, t0 + i * args.slots, args.slots)
            float(np.asarray(logs["sum_reward"]).sum())
            rates.append(args.slots / (time.perf_counter() - t))
        rate = sorted(rates)[1]
        out["measured_run"] = {
            "num_envs": B, "slots": args.slots, "dtype": args.dtype,
            "compile_plus_first_s": round(compile_s, 1),
            "slots_per_sec": round(rate, 1),
            "env_slots_per_sec": round(rate * B, 1),
            "agent_steps_per_sec": round(rate * B * cfg.env.num_users, 1),
        }
        print(f"B={B}: {rate:,.1f} slots/s = {rate*B:,.0f} env-slots/s = "
              f"{rate*B*cfg.env.num_users:,.0f} agent-steps/s "
              f"(median of 3)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
