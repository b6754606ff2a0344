"""Decompose the DRQN train event on the real device.

The round-3 verdict's remaining perf frontier: the episodic train event is
3.2 ms at 23 TFLOP/s (12% of bf16 peak).  This harness times the event and
its pieces in isolation at the bench config (toy, B=256, batch 512 x
n_batch 2) so the serialized chain (sample top_k -> gather -> LSTM fwd x3
-> backward -> adam) can be attributed and A/B'd.

Usage:  python scripts/bench_event.py [--dtype float32] [--trace DIR]
Writes a per-piece timing table to stderr, one JSON line to stdout.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, n=20, label=""):
    """Median wall of n calls, each forced to completion via scalar
    transfer (CLAUDE.md: block_until_ready can return early on axon)."""
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()) if hasattr(x, "sum")
                 else x, out)  # compile + settle
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()) if hasattr(x, "sum")
                 else x, out)
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        out = fn(*args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "sum")]
        float(leaves[0].sum())
        ts.append(time.perf_counter() - t)
    ts.sort()
    med = ts[len(ts) // 2]
    log(f"{label:44s} {med * 1e3:8.3f} ms   (min {ts[0]*1e3:.3f}, "
        f"max {ts[-1]*1e3:.3f})")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--reps", type=int, default=8,
                    help="train events per timed dispatch")
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--warm-slots", type=int, default=1100)
    ap.add_argument("--timeit-n", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diral_tpu.config import toy_4ue_3r
    from diral_tpu.train import loop as L
    from diral_tpu.agents import drqn

    t = time.perf_counter()
    float(jnp.asarray(1.0) + 1.0)
    log(f"device-init: {time.perf_counter() - t:.1f}s, {jax.devices()}")

    cfg = toy_4ue_3r(save_positions=False, explore=0, memory_size=1024)
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=args.envs),
        agent=dataclasses.replace(
            cfg.agent, network=dataclasses.replace(
                cfg.agent.network, compute_dtype=args.dtype)))
    acfg = cfg.agent
    N = cfg.env.num_users
    T = acfg.step_size

    init_carry, _, _ = L.make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    # fill the replay to steady state: run some slots
    from diral_tpu.train.runner import make_chunk_runner
    _, slot_step, _ = L.make_train_functions(cfg)
    run_chunk, _ = make_chunk_runner(slot_step)
    carry, logs = run_chunk(carry, 0, args.warm_slots)
    float(logs["sum_reward"].sum())
    log(f"carry warmed ({args.warm_slots} slots)")
    replay, learner = carry.replay, carry.learner
    key = jax.random.PRNGKey(7)
    R = args.reps

    # -- the full event, as the loop dispatches it -----------------------
    @jax.jit
    def full_event(learner, key):
        def body(l, k):
            l, loss = drqn.train(
                l, replay, k, 1000, acfg, N,
                sample_rows_fn=lambda ks: L.sample_window_rows_many(
                    replay, ks, acfg.batch_size, T))
            return l, loss
        learner, losses = jax.lax.scan(body, learner,
                                       jax.random.split(key, R))
        return learner, losses

    # -- sampler alone (top_k + index math), gather alone ----------------
    @jax.jit
    def sampler_only(key):
        def body(acc, k):
            b = L.sample_windows_cross_env(replay, k, acfg.batch_size, T)
            return acc + b["states"].sum() + b["rewards"].sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, R))
        return acc

    @jax.jit
    def topk_only(key):
        B, S = replay.buf.shape[0], replay.capacity
        def body(acc, k):
            scores = jax.random.uniform(k, (B * S,))
            _, flat = jax.lax.top_k(-scores, acfg.batch_size)
            return acc + flat.sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                              jax.random.split(key, R))
        return acc

    # -- one pre-sampled batch: forward / fwd+bwd / full step ------------
    batch = jax.jit(lambda k: L.sample_windows_cross_env(
        replay, k, acfg.batch_size, T))(key)
    batch = jax.tree.map(lambda x: jnp.asarray(x), batch)

    @jax.jit
    def fwd_only(learner):
        def body(acc, _):
            s, a, r, ns = drqn.repack_user_major(batch, N, True)
            tgt = drqn.td_targets(learner, r, ns, acfg)
            loss = drqn.loss_fn(learner.params, s, a, tgt, acfg)
            return acc + loss, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(R))
        return acc

    @jax.jit
    def grad_step_presampled(learner, key):
        def body(l, _):
            l, loss = drqn.train_on_batch(l, batch, acfg, N)
            return l, loss
        learner, losses = jax.lax.scan(body, learner, jnp.arange(R))
        return learner, losses

    log(f"\n-- pieces ({args.dtype}), {R} reps per dispatch, "
        f"median of 20 dispatches; per-rep ms --")
    t_full = timeit(full_event, learner, key, n=args.timeit_n,
                    label=f"full event (n_batch={acfg.n_batch})") / R
    t_samp = timeit(sampler_only, key, n=args.timeit_n, label="sampler: top_k+gather") / R
    t_topk = timeit(topk_only, key, n=args.timeit_n, label="top_k only (262k keys)") / R
    t_fwd = timeit(fwd_only, learner, n=args.timeit_n, label="fwd: target+loss (1 batch)") / R
    t_grad = timeit(grad_step_presampled, learner, key, n=args.timeit_n,
                    label="grad step, presampled (1 batch)") / R
    log(f"\nper-rep: full {t_full*1e3:.3f} | sampler {t_samp*1e3:.3f} | "
        f"topk {t_topk*1e3:.3f} | fwd {t_fwd*1e3:.3f} | grad {t_grad*1e3:.3f}")

    if args.trace:
        with jax.profiler.trace(args.trace):
            l2, losses = full_event(learner, key)
            float(losses.sum())
        log(f"trace written to {args.trace}")
        from diral_tpu.train.profiling import (aggregate_device_ops,
                                               _load_xplane)
        by_name, occ = aggregate_device_ops(_load_xplane(args.trace))
        total = sum(by_name.values())
        log(f"summed op attention {total:.2f} ms over {R} events")
        for name, ms in by_name.most_common(30):
            log(f"{name[:70]:70s} {ms:8.3f} {occ[name]:5d}")

    print(json.dumps({
        "dtype": args.dtype,
        "event_ms": round(t_full * 1e3, 3),
        "sampler_ms": round(t_samp * 1e3, 3),
        "topk_ms": round(t_topk * 1e3, 3),
        "fwd_ms": round(t_fwd * 1e3, 3),
        "grad_presampled_ms": round(t_grad * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
