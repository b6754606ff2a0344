"""Vmapped seed sweep (train/sweep.py): the seed axis is a pure vmap, so
(a) duplicate seeds inside one sweep produce identical trajectories, and
(b) a sweep row equals the standalone single-seed training loop."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.train.loop import make_train_functions
from diral_tpu.train.sweep import run_seed_sweep, split_seed


def tiny_cfg():
    cfg = toy_4ue_3r(save_positions=False, explore=0, memory_size=64)
    agent = dataclasses.replace(
        cfg.agent, batch_size=8, n_batch=1,
        network=dataclasses.replace(cfg.agent.network, layers=(16, 16)),
    )
    return dataclasses.replace(
        cfg, agent=agent, time_slots=60,
        engine=dataclasses.replace(cfg.engine, num_envs=2),
    )


def test_duplicate_seeds_identical():
    cfg = tiny_cfg()
    carries, logs = run_seed_sweep(cfg, [3, 5, 3], verbose=False)
    np.testing.assert_array_equal(logs["sum_reward"][0],
                                  logs["sum_reward"][2])
    assert not np.array_equal(logs["sum_reward"][0], logs["sum_reward"][1])
    p0 = jax.tree_util.tree_leaves(split_seed(carries, 0).learner)
    p2 = jax.tree_util.tree_leaves(split_seed(carries, 2).learner)
    for a, b in zip(p0, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sweep_matches_standalone_run():
    cfg = tiny_cfg()
    _, logs = run_seed_sweep(cfg, [7], verbose=False)

    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(7))
    carry, solo = jax.jit(
        lambda c: jax.lax.scan(slot_step, c, jnp.arange(cfg.time_slots))
    )(carry)
    np.testing.assert_allclose(logs["sum_reward"][0],
                               np.asarray(solo["sum_reward"]),
                               rtol=0, atol=0)
