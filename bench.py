"""Benchmark: env-steps/s/chip on the flagship 4ue_3r toy config.

Measures the batched JAX env engine (step + state assembly, the exact
per-slot env work of the training loop) stepping ``NUM_ENVS`` instances in
lockstep under jit on one chip.  The reference publishes no throughput
numbers (BASELINE.md); the BASELINE.json north-star target is >= 1e6
env-steps/s/chip, which is used as the baseline divisor for
``vs_baseline``.

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.envs import v2v_env as E

BASELINE_STEPS_PER_SEC = 1.0e6
NUM_ENVS = 8192
CHUNK = 256          # env steps per scan invocation
REPEATS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = toy_4ue_3r().env
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    log("devices:", jax.devices())

    reset = jax.vmap(lambda k: E.reset(cfg, k, dtype))
    state = reset(jax.random.split(key, NUM_ENVS))

    @jax.jit
    def rollout(state, key, t0):
        def body(carry, i):
            s, k = carry
            k, ka = jax.random.split(k)
            acts = jax.random.randint(ka, (NUM_ENVS, cfg.num_users), 0,
                                      cfg.num_channels)
            s, obs, rew = jax.vmap(
                lambda si, ai: E.step_collision(cfg, si, ai, t0 + i)
            )(s, acts)
            sv = jax.vmap(
                lambda si, oi, ai, ri: E.obtain_state(cfg, si, oi, ai, ri)
            )(s, obs, acts, rew)
            return (s, k), rew.sum()
        (s, k), rews = jax.lax.scan(body, (state, key), jnp.arange(CHUNK))
        return s, rews.sum()

    # compile + warmup
    t = time.perf_counter()
    state, _ = rollout(state, key, 0)
    jax.block_until_ready(state)
    log(f"compile+warmup: {time.perf_counter() - t:.1f}s")

    rates = []
    for r in range(REPEATS):
        t = time.perf_counter()
        state, total = rollout(state, jax.random.fold_in(key, r), r * CHUNK)
        total = float(total)  # forces full device completion
        dt = time.perf_counter() - t
        rate = NUM_ENVS * CHUNK / dt
        log(f"run {r}: {dt*1e3:.1f} ms -> {rate:,.0f} env-steps/s "
            f"(reward checksum {total:,.0f})")
        rates.append(rate)
    best = sorted(rates)[len(rates) // 2]  # median

    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(best / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
