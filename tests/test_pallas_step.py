"""Fused channel-phase kernel equivalence: step_channel with
step_impl='pallas' (interpret mode on CPU) must match the canonical XLA
lax.scan path bit-for-bit in float32 — tables (incl. transitive same-slot
merges), last_arrival bookkeeping, rewards for designs 2/3/4, and the
half-duplex observation matrix."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.envs import v2v_env as E

STATE_FIELDS = ("table_x", "table_y", "table_seq", "table_age",
                "last_arrival", "pos_x", "pos_y", "vel", "direction")


def scenario(n, c, design, key):
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(
        base, num_users=n, num_channels=c, reward_design=design,
        highway_length=800, communication_range=250.0, mobility=True,
        congestion_test=False)
    ks = jax.random.split(key, 7)
    state = E.reset(cfg, ks[0], jnp.float32)
    state = state.replace(
        table_x=jax.random.uniform(ks[1], (n, n), jnp.float32, 0, 800),
        table_y=jax.random.uniform(ks[2], (n, n), jnp.float32, 0, 2),
        table_seq=jax.random.randint(ks[3], (n, n), 0, 50),
        table_age=jax.random.randint(ks[4], (n, n), 0, 40),
        last_arrival=jax.random.randint(ks[5], (n, n), -1, 10),
    )
    return cfg, state, ks[6]


def run_steps(cfg, state, key, steps=4):
    outs = []
    for t in range(steps):
        key, ka = jax.random.split(key)
        acts = jax.random.randint(ka, (cfg.num_users,), 0, cfg.num_channels)
        state, obs, rew = E.step_channel(cfg, state, acts, t)
        outs.append((obs, rew))
    return state, outs


def assert_same(cfg, state, key):
    cfg_x = dataclasses.replace(cfg, step_impl="xla")
    cfg_p = dataclasses.replace(cfg, step_impl="pallas")
    sx, ox = run_steps(cfg_x, state, key)
    sp, op = run_steps(cfg_p, state, key)
    for f in STATE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(sx, f)), np.asarray(getattr(sp, f)),
            err_msg=f"{f} (n={cfg.num_users} c={cfg.num_channels} "
                    f"design={cfg.reward_design})")
    for (obx, rwx), (obp, rwp) in zip(ox, op):
        np.testing.assert_array_equal(np.asarray(obx), np.asarray(obp))
        np.testing.assert_array_equal(np.asarray(rwx), np.asarray(rwp))


def test_kernel_matches_xla_across_sizes_and_designs():
    for n, c, design in [(12, 5, 2), (40, 15, 3), (64, 20, 4), (100, 50, 2)]:
        cfg, state, key = scenario(n, c, design, jax.random.PRNGKey(n + design))
        assert_same(cfg, state, key)


def test_kernel_without_piggy_merge():
    """add_positional_dist_piggy=False: tables must pass through untouched."""
    cfg, state, key = scenario(24, 8, 2, jax.random.PRNGKey(3))
    cfg = dataclasses.replace(
        cfg, state=dataclasses.replace(cfg.state,
                                       add_positional_dist_piggy=False,
                                       add_channel_obs=True))
    assert_same(cfg, state, key)


def test_kernel_transitive_same_slot_merge():
    """A table entry must propagate two hops within one slot (rx merges a
    tx whose own table was merged on an earlier channel) — the property
    that makes the channel loop sequential."""
    n = 34
    cfg, state, key = scenario(n, 6, 2, jax.random.PRNGKey(11))
    # cluster everyone within comm range so accept chains are long
    state = state.replace(
        pos_x=jnp.linspace(0.0, 120.0, n).astype(jnp.float32),
        pos_y=jnp.zeros((n,), jnp.float32),
        table_seq=jax.random.randint(jax.random.PRNGKey(12), (n, n), 0, 500),
        table_age=jnp.zeros((n, n), jnp.int32),
    )
    assert_same(cfg, state, key)


def test_kernel_vmap_batch():
    cfg, s0, key = scenario(40, 12, 2, jax.random.PRNGKey(21))
    B = 3
    states = [scenario(40, 12, 2, jax.random.PRNGKey(30 + b))[1]
              for b in range(B)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    acts = jax.random.randint(key, (B, 40), 0, 12)
    cfg_x = dataclasses.replace(cfg, step_impl="xla")
    cfg_p = dataclasses.replace(cfg, step_impl="pallas")
    step = lambda c: jax.vmap(lambda s, a: E.step_channel(c, s, a, 5))
    sx, ox, rx = step(cfg_x)(batched, acts)
    sp, op, rp = step(cfg_p)(batched, acts)
    for f in STATE_FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(sx, f)),
                                      np.asarray(getattr(sp, f)), err_msg=f)
    np.testing.assert_array_equal(np.asarray(ox), np.asarray(op))
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(rp))
