"""Standalone fused-LSTM kernel ceilings at arbitrary event shapes.

Measures the Pallas window kernels (fwd / dual / triple / fwd+bwd VJP) in
isolation at given (rows, T, H, D) shapes -- the quantity the train event
is chasing.  Used to pin the scale config's event floor (round-5 VERDICT
#1: hit the 100v/50r bar or publish the quantified kernel-ceiling floor).

Timing: two-length difference (see scripts/bench_event.py) with carried
poisons against loop-invariant hoisting.

Usage: python scripts/kernel_ceiling.py [--shapes toy,scale] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


SHAPES = {
    # rows = num_users * batch_size of the event's gradient-step batch
    "toy": dict(rows=2048, T=6, H=256, D=23),
    "scale": dict(rows=25600, T=6, H=256, D=100),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _median_wall(fn, *args, n):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
        ts.append(time.perf_counter() - t)
    ts.sort()
    return ts[len(ts) // 2]


def timeit_diff(make, *args, reps, n, label=""):
    m1 = _median_wall(make(reps), *args, n=n)
    m2 = _median_wall(make(2 * reps), *args, n=n)
    per = (m2 - m1) / reps
    log(f"{label:36s} {per * 1e3:8.3f} ms/rep  (T({reps})={m1*1e3:.0f}, "
        f"T({2*reps})={m2*1e3:.0f})")
    return per


def bench_shape(name, rows, T, H, D, reps, n):
    from diral_tpu.models.recurrent import lstm_init
    from diral_tpu.ops import pallas_lstm as P

    Dp = P.padded_dim(D)
    k = jax.random.PRNGKey(0)
    ka, kb, kx, kc = jax.random.split(k, 4)
    pa = lstm_init(ka, D, H, jnp.float32)
    pb = lstm_init(kb, D, H, jnp.float32)
    x = jax.random.normal(kx, (rows, T * Dp), jnp.float32)
    xc = jax.random.normal(kc, (rows, (T + 1) * Dp), jnp.float32)

    def poison(arr, acc):
        return arr.at[0, 0].set(arr[0, 0]
                                + jnp.asarray(acc, arr.dtype) * 1e-20)

    def mk(body):
        def make(reps_):
            @jax.jit
            def run(*args):
                def step(acc, _):
                    return acc + body(poison(args[0], acc), *args[1:]), None
                acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                      jnp.arange(reps_))
                return acc
            return run
        return make

    fwd = mk(lambda xx, w, b: P.lstm_last_flat(xx, w, b, T).sum())
    dual = mk(lambda xx, w, b, wt, bt: sum(
        h.sum() for h in P.lstm_last_flat_dual(xx, w, b, wt, bt, T)))
    triple = mk(lambda xx, w, b, wt, bt: sum(
        h.sum() for h in P.lstm_last_flat_triple(xx, w, b, wt, bt, T)))

    def mk_fb():
        def make(reps_):
            @jax.jit
            def run(xx, w, b):
                def one(x_):
                    return P.lstm_last_flat(x_, w, b, T).sum()

                def step(acc, _):
                    g = jax.grad(one)(poison(xx, acc))
                    return acc + g.sum(), None
                acc, _ = jax.lax.scan(step, jnp.zeros(()),
                                      jnp.arange(reps_))
                return acc
            return run
        return make

    fwd_flops = rows * T * (2 * Dp * 4 * H + 2 * H * 4 * H)
    t_f = timeit_diff(fwd, x, pa["w"], pa["b"], reps=reps, n=n,
                      label=f"{name} fwd")
    t_d = timeit_diff(dual, x, pa["w"], pa["b"], pb["w"], pb["b"],
                      reps=reps, n=n, label=f"{name} dual")
    t_t = timeit_diff(triple, xc, pa["w"], pa["b"], pb["w"], pb["b"],
                      reps=reps, n=n, label=f"{name} triple")
    t_fb = timeit_diff(mk_fb(), x, pa["w"], pa["b"],
                       reps=max(reps // 2, 8), n=n,
                       label=f"{name} fwd+bwd (vjp)")

    def tfs(fl, sec):
        return None if sec <= 0 else round(fl / sec / 1e12, 1)

    return {
        "rows": rows, "T": T, "H": H, "D": D, "Dp": Dp,
        "fwd_ms": round(t_f * 1e3, 3), "fwd_tflops": tfs(fwd_flops, t_f),
        "dual_ms": round(t_d * 1e3, 3),
        "dual_tflops": tfs(2 * fwd_flops, t_d),
        "triple_ms": round(t_t * 1e3, 3),
        "triple_tflops": tfs(
            3 * fwd_flops - rows * T * 2 * Dp * 4 * H, t_t),
        "fwdbwd_ms": round(t_fb * 1e3, 3),
        "fwdbwd_tflops": tfs(4 * fwd_flops, t_fb),
        "fwd_flops_g": round(fwd_flops / 1e9, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="toy,scale")
    ap.add_argument("--reps", type=int, default=48)
    ap.add_argument("--timeit-n", type=int, default=5)
    ap.add_argument("--out", default="results/kernel_ceilings.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    t = time.perf_counter()
    float(jnp.asarray(1.0) + 1.0)
    log(f"device-init: {time.perf_counter() - t:.1f}s, {jax.devices()}")

    out = {}
    for name in args.shapes.split(","):
        sh = SHAPES[name]
        reps = args.reps if name == "toy" else max(args.reps // 6, 6)
        out[name] = bench_shape(name, reps=reps, n=args.timeit_n, **sh)
        log(f"{name}: {json.dumps(out[name])}")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
