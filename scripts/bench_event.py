"""Decompose the DRQN train event on the real device.

Round-4 verdict item: the toy train event runs at 47 TFLOP/s against
bench.py's 49 TFLOP/s compute gate, and the claimed residual ("LSTM kernel
throughput at these shapes") had no pinned artifact.  This harness times
the event and its pieces in isolation at the bench config (toy, B=256,
batch 512 x n_batch 2), plus the fused Pallas LSTM kernels STANDALONE to
measure the kernel ceiling the event is chasing.

Timing is overhead-robust: every piece is dispatched as a scan of R and
2R reps and the per-rep cost is (T(2R) - T(R)) / R -- the axon tunnel's
~27-30 ms dispatch latency and any constant per-dispatch cost cancel
exactly (round-4's single-R version published pieces LARGER than the
whole event because R=8 left ~3.5 ms/rep of overhead in every line).

Usage:  python scripts/bench_event.py [--dtype float32] [--out FILE]
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


def _median_wall(fn, *args, n):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()) if hasattr(x, "sum")
                 else x, out)  # compile + first-exec penalty settle
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()) if hasattr(x, "sum")
                 else x, out)
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        out = fn(*args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "sum")]
        float(leaves[0].sum())  # scalar transfer: forces completion on axon
        ts.append(time.perf_counter() - t)
    ts.sort()
    return ts[len(ts) // 2], ts


def timeit_diff(make, *args, reps: int, n: int, label: str = ""):
    """Per-rep seconds via the two-length difference: ``make(R)`` must
    return a jitted fn scanning R reps of the piece."""
    m1, _ = _median_wall(make(reps), *args, n=n)
    m2, ts2 = _median_wall(make(2 * reps), *args, n=n)
    per = (m2 - m1) / reps
    log(f"{label:46s} {per * 1e3:8.3f} ms/rep   (T({reps})={m1*1e3:.1f}, "
        f"T({2*reps})={m2*1e3:.1f}, spread {max(ts2)/max(min(ts2),1e-9):.2f}x)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=96,
                    help="base rep count R (pieces time at R and 2R)")
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--warm-slots", type=int, default=1100)
    ap.add_argument("--timeit-n", type=int, default=7)
    ap.add_argument("--out", default=None,
                    help="also write the JSON to this file")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diral_tpu.config import toy_4ue_3r
    from diral_tpu.train import loop as L
    from diral_tpu.agents import drqn
    from diral_tpu.ops import pallas_lstm

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
    H = acfg.network.layers[0]
    D = cfg.env.state_space
    Dp = pallas_lstm.padded_dim(D)
    NB = N * acfg.batch_size              # rows per gradient-step batch
    R = args.reps
    nt = args.timeit_n

    init_carry, slot_step, _ = L.make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    from diral_tpu.train.runner import make_chunk_runner
    run_chunk, _ = make_chunk_runner(slot_step)
    carry, logs = run_chunk(carry, 0, args.warm_slots)
    float(logs["sum_reward"].sum())
    log(f"carry warmed ({args.warm_slots} slots)")
    replay, learner = carry.replay, carry.learner
    key = jax.random.PRNGKey(7)

    # analytic model FLOPs (matmul 2mnk only), per LSTM forward pass
    fwd_flops_row = T * (2 * Dp * 4 * H + 2 * H * 4 * H)
    fwd_flops = NB * fwd_flops_row

    # -- the full event, as the loop dispatches it (fused combined-window
    # path for the LSTM net, exactly train_call's sampler) ---------------
    use_lstm = acfg.network.use_lstm_input

    def make_full(reps):
        @jax.jit
        def full_event(learner, key):
            def body(l, k):
                l, loss = drqn.train(
                    l, replay, k, 1000, acfg, N,
                    sample_rows_fn=lambda ks: L.sample_window_rows_many(
                        replay, ks, acfg.batch_size, T,
                        windows_only=use_lstm))
                return l, loss
            return jax.lax.scan(body, learner, jax.random.split(key, reps))
        return full_event

    # -- sampler alone (top_k + gather + repack), n_batch draws ----------
    def make_sampler(reps):
        @jax.jit
        def sampler_only(key):
            def body(acc, k):
                ks = jax.random.split(k, acfg.n_batch)
                rows = L.sample_window_rows_many(replay, ks, acfg.batch_size,
                                                 T, windows_only=True)
                return (acc + rows["windows"].sum() + rows["rewards"].sum(),
                        None)
            acc, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jax.random.split(key, reps))
            return acc
        return sampler_only

    # -- one pre-sampled batch: target / full grad step ------------------
    rows = jax.jit(lambda k: L.sample_window_rows_many(
        replay, jax.random.split(k, 1), acfg.batch_size, T))(key)
    s1 = jnp.asarray(rows["states"][0])
    ns1 = jnp.asarray(rows["next_states"][0])
    a1 = jnp.asarray(rows["actions"][0])
    r1 = jnp.asarray(rows["rewards"][0])

    # Loop-invariant bodies get hoisted by XLA (the whole piece computes
    # ONCE regardless of rep count -- the first run of this harness
    # measured ~0 ms/rep for every parameter-independent piece).  Thread
    # the carried accumulator INTO each piece's input via a 1-element
    # dynamic write so the body must re-execute per rep; the extra
    # update-slice is nanoseconds against the 0.1-0.5 ms pieces.
    def _poison(arr, acc):
        return arr.at[(0,) * arr.ndim].set(
            arr[(0,) * arr.ndim] + acc.astype(arr.dtype) * 0
            + jnp.asarray(acc, arr.dtype) * 1e-20)

    def make_target(reps):
        @jax.jit
        def target_only(learner):
            def body(acc, _):
                tgt = drqn.td_targets(learner, _poison(r1, acc), ns1, acfg)
                return acc + tgt.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
            return acc
        return target_only

    def make_grad(reps):
        @jax.jit
        def grad_step(learner):
            def body(l, _):
                l, loss = drqn.train_on_packed(l, s1, a1, r1, ns1, acfg)
                return l, loss
            return jax.lax.scan(body, learner, jnp.arange(reps))
        return grad_step

    # fused combined-window gradient step (the round-5 production path)
    rows_w = jax.jit(lambda k: L.sample_window_rows_many(
        replay, jax.random.split(k, 1), acfg.batch_size, T,
        windows_only=True))(key)
    w1 = jnp.asarray(rows_w["windows"][0])
    aw = jnp.asarray(rows_w["actions"][0])
    rw = jnp.asarray(rows_w["rewards"][0])

    def make_grad_fused(reps):
        @jax.jit
        def grad_fused(learner):
            def body(l, _):
                l, loss = drqn.train_on_windows(l, w1, aw, rw, acfg)
                return l, loss
            return jax.lax.scan(body, learner, jnp.arange(reps))
        return grad_fused

    # -- adam/sync tail alone: update with fixed grads -------------------
    fixed_grads = jax.jit(lambda l: jax.grad(drqn.loss_fn)(
        l.params, s1, a1,
        jax.lax.stop_gradient(drqn.td_targets(l, r1, ns1, acfg)),
        acfg))(learner)

    def make_adam(reps):
        import optax
        opt = drqn.make_optimizer(acfg)

        @jax.jit
        def adam_only(learner):
            def body(l, _):
                updates, opt_state = opt.update(fixed_grads, l.opt_state)
                params = optax.apply_updates(l.params, updates)
                return l.replace(params=params, opt_state=opt_state), None
            return jax.lax.scan(body, learner, jnp.arange(reps))
        return adam_only

    # -- standalone kernel ceilings --------------------------------------
    kdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    kx = jax.random.normal(jax.random.PRNGKey(3), (NB, T * Dp), kdt)
    kxc = jax.random.normal(jax.random.PRNGKey(4), (NB, (T + 1) * Dp), kdt)
    w = jax.tree.map(lambda a: a.astype(kx.dtype), learner.params["lstm"])
    wt = jax.tree.map(lambda a: a.astype(kx.dtype),
                      learner.target_params["lstm"])

    def make_kfwd(reps):
        @jax.jit
        def kfwd(x, wk, bk):
            def body(acc, _):
                h = pallas_lstm.lstm_last_flat(_poison(x, acc), wk, bk, T)
                return acc + h.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), kx.dtype),
                                  jnp.arange(reps))
            return acc
        return kfwd

    def make_kdual(reps):
        @jax.jit
        def kdual(x, wk, bk, wkt, bkt):
            def body(acc, _):
                ha, hb = pallas_lstm.lstm_last_flat_dual(
                    _poison(x, acc), wk, bk, wkt, bkt, T)
                return acc + ha.sum() + hb.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), kx.dtype),
                                  jnp.arange(reps))
            return acc
        return kdual

    def make_ktriple(reps):
        @jax.jit
        def ktriple(x, wk, bk, wkt, bkt):
            def body(acc, _):
                hs, hna, hnb = pallas_lstm.lstm_last_flat_triple(
                    _poison(x, acc), wk, bk, wkt, bkt, T)
                return acc + hs.sum() + hna.sum() + hnb.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), kx.dtype),
                                  jnp.arange(reps))
            return acc
        return ktriple

    def make_kfwdbwd(reps):
        @jax.jit
        def kfb(x, wk, bk):
            def one(xx):
                return pallas_lstm.lstm_last_flat(xx, wk, bk, T).sum()

            def body(acc, _):
                dx = jax.grad(one)(_poison(x, acc))
                return acc + dx.sum().astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
            return acc
        return kfb

    log(f"\n-- pieces ({args.dtype}), per-rep = (T(2R)-T(R))/R, R={R}, "
        f"median of {nt}; NB={NB} rows, T={T}, H={H}, Dp={Dp} --")
    t_full = timeit_diff(make_full, learner, key, reps=R, n=nt,
                         label=f"full event (n_batch={acfg.n_batch})")
    t_samp = timeit_diff(make_sampler, key, reps=R, n=nt,
                         label=f"sampler: {acfg.n_batch}x(top_k+gather+repack)")
    t_tgt = timeit_diff(make_target, learner, reps=R, n=nt,
                        label="td_targets: dual fwd + heads (1 batch)")
    t_grad = timeit_diff(make_grad, learner, reps=R, n=nt,
                         label="grad step, presampled (1 batch)")
    t_gradf = timeit_diff(make_grad_fused, learner, reps=R, n=nt,
                          label="grad step FUSED triple (1 batch)")
    t_adam = timeit_diff(make_adam, learner, reps=R, n=nt,
                         label="adam update, fixed grads")
    t_kf = timeit_diff(make_kfwd, kx, w["w"], w["b"], reps=R, n=nt,
                       label="LSTM kernel fwd alone")
    t_kd = timeit_diff(make_kdual, kx, w["w"], w["b"], wt["w"], wt["b"],
                       reps=R, n=nt, label="LSTM dual kernel alone")
    t_kt = timeit_diff(make_ktriple, kxc, w["w"], w["b"], wt["w"], wt["b"],
                       reps=R, n=nt, label="LSTM triple kernel alone")
    t_kfb = timeit_diff(make_kfwdbwd, kx, w["w"], w["b"], reps=R, n=nt,
                        label="LSTM kernel fwd+bwd (vjp) alone")

    def tfs(flops, sec):
        if sec <= 0:  # timing-noise-negative difference: no honest number
            return None
        return round(flops / sec / 1e12, 1)

    result = {
        "dtype": args.dtype,
        "shape": {"rows": NB, "T": T, "H": H, "Dp": Dp,
                  "n_batch": acfg.n_batch},
        "event_ms": round(t_full * 1e3, 3),
        "sampler_ms": round(t_samp * 1e3, 3),
        "target_ms": round(t_tgt * 1e3, 3),
        "grad_presampled_ms": round(t_grad * 1e3, 3),
        "grad_fused_ms": round(t_gradf * 1e3, 3),
        "adam_ms": round(t_adam * 1e3, 3),
        "kernel_fwd_ms": round(t_kf * 1e3, 3),
        "kernel_dual_ms": round(t_kd * 1e3, 3),
        "kernel_triple_ms": round(t_kt * 1e3, 3),
        "kernel_fwdbwd_ms": round(t_kfb * 1e3, 3),
        # achieved matmul TFLOP/s of each kernel piece (analytic 2mnk)
        "kernel_fwd_tflops": tfs(fwd_flops, t_kf),
        "kernel_dual_tflops": tfs(2 * fwd_flops, t_kd),
        # triple = 3 recurrences minus the shared online x-projections
        "kernel_triple_tflops": tfs(
            3 * fwd_flops - NB * T * 2 * Dp * 4 * H, t_kt),
        "kernel_fwdbwd_tflops": tfs(4 * fwd_flops, t_kfb),
        # n_batch FUSED grad steps (each includes its target) + sampler
        "pieces_sum_ms": round((t_samp + acfg.n_batch * t_gradf) * 1e3, 3),
    }
    log(f"\nevent {result['event_ms']} ms vs pieces sum "
        f"{result['pieces_sum_ms']} ms (sampler + n_batch*grad); "
        f"kernel ceilings fwd/dual/fwd+bwd = "
        f"{result['kernel_fwd_tflops']}/{result['kernel_dual_tflops']}/"
        f"{result['kernel_fwdbwd_tflops']} TFLOP/s")
    blob = json.dumps(result)
    print(blob)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob + "\n")


if __name__ == "__main__":
    main()
