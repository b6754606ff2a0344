"""Pallas kernel equivalence: the fused piggy-histogram kernel (interpret
mode on CPU) must match the canonical XLA positional-distribution op on
random data (edge-ULP differences are measure-zero for random floats)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.envs import v2v_env as E
from diral_tpu.ops.pallas_kernels import piggy_histogram


def random_state(cfg, key, spread=400.0):
    n = cfg.num_users
    ks = jax.random.split(key, 6)
    state = E.reset_from(
        cfg,
        jax.random.uniform(ks[0], (n,), jnp.float32, 0, spread),
        jax.random.uniform(ks[1], (n,), jnp.float32, 0, 2),
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), jnp.float32),
        dtype=jnp.float32,
    )
    return state.replace(
        table_x=jax.random.uniform(ks[2], (n, n), jnp.float32, 0, spread),
        table_y=jax.random.uniform(ks[3], (n, n), jnp.float32, 0, 2),
        table_age=jax.random.randint(ks[4], (n, n), 0, 40),
    )


def test_kernel_matches_xla_op():
    base = toy_4ue_3r().env
    for n, bins, rng_ in [(4, 20, 500.0), (24, 10, 300.0), (100, 50, 500.0)]:
        cfg = dataclasses.replace(
            base, num_users=n, highway_length=400,
            bin_range=rng_,
            state=dataclasses.replace(base.state, num_bins=bins),
        )
        state = random_state(cfg, jax.random.PRNGKey(n))
        ref = np.asarray(E.positional_dist_piggy_type2(cfg, state))
        got = np.asarray(
            piggy_histogram(state.table_x, state.table_y, state.pos_x,
                            state.pos_y, state.table_age, rng_, bins)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7,
                                   err_msg=f"n={n} bins={bins}")


def test_kernel_empty_rows():
    """Vehicles with no fresh neighbors must get an all-zero histogram."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(base, num_users=6)
    state = random_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(table_age=jnp.full((6, 6), 30, jnp.int32))
    got = np.asarray(
        piggy_histogram(state.table_x, state.table_y, state.pos_x,
                        state.pos_y, state.table_age,
                        cfg.bin_range, cfg.state.num_bins)
    )
    np.testing.assert_array_equal(got, np.zeros_like(got))


def test_kernel_vmap_batch():
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(base, num_users=12)
    B = 4
    states = [random_state(cfg, jax.random.PRNGKey(100 + b)) for b in range(B)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    got = jax.vmap(
        lambda s: piggy_histogram(s.table_x, s.table_y, s.pos_x, s.pos_y,
                                  s.table_age, cfg.bin_range,
                                  cfg.state.num_bins)
    )(batched)
    for b in range(B):
        ref = np.asarray(E.positional_dist_piggy_type2(cfg, states[b]))
        np.testing.assert_allclose(np.asarray(got[b]), ref, rtol=1e-6,
                                   atol=1e-7)


def test_hist_impl_dispatch_through_obtain_state():
    """cfg.state.hist_impl='pallas' must route obtain_state through the
    fused kernel (interpret mode off-TPU) and match the canonical path."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(base, num_users=16)
    state = random_state(cfg, jax.random.PRNGKey(7))
    obs = jnp.zeros((16, cfg.num_channels), jnp.float32)
    acts = jnp.zeros((16,), jnp.int32)
    rews = jnp.zeros((16,), jnp.float32)
    ref = np.asarray(E.obtain_state(cfg, state, obs, acts, rews))
    pcfg = dataclasses.replace(
        cfg, state=dataclasses.replace(cfg.state, hist_impl="pallas"))
    got = np.asarray(E.obtain_state(pcfg, state, obs, acts, rews))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    # 'auto' off-TPU stays on the canonical op: exact equality
    acfg = dataclasses.replace(
        cfg, state=dataclasses.replace(cfg.state, hist_impl="auto"))
    np.testing.assert_array_equal(
        np.asarray(E.obtain_state(acfg, state, obs, acts, rews)), ref)
