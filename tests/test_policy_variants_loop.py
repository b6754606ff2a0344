"""Driver-parity variants of the training loop: softmax / boltzmann / greedy
policy bands, load_model eval mode, and recorded-trace replay."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.train.loop import make_train_functions, run_experiment
from diral_tpu.train.runner import train_experiment


def small_cfg(**over):
    cfg = toy_4ue_3r(
        time_slots=200, memory_size=128, explore=20, greedy=100000,
        training=True, train_after_episode=True, save_positions=False,
    )
    agent = dataclasses.replace(
        cfg.agent, batch_size=16, n_batch=1, target_update=50,
        network=dataclasses.replace(cfg.agent.network, layers=(16, 16)),
    )
    return dataclasses.replace(cfg, agent=agent, **over)


def test_softmax_policy_loop():
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, agent=dataclasses.replace(cfg.agent, policy="softmax")
    )
    _, logs = run_experiment(cfg, seed=0, num_slots=200)
    assert np.isfinite(np.asarray(logs["sum_reward"])).all()


def test_boltzman_policy_loop():
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, agent=dataclasses.replace(
            cfg.agent, policy="boltzman", explore_start=0.99,
            explore_stop=0.01, decay_rate=0.001, alpha=0.0, beta=1.0,
        )
    )
    carry, logs = run_experiment(cfg, seed=0, num_slots=200)
    assert np.isfinite(np.asarray(logs["sum_reward"])).all()
    # beta annealed: fires at t=0,50,100,150 (t<5000), -0.001 each
    np.testing.assert_allclose(float(carry.beta), 1.0 - 4 * 0.001, atol=1e-6)


def test_load_model_mode_is_greedy():
    """With load_model the mode switch collapses to pure greedy
    (the `not load_model` guards, main_test.py:129-136): no exploration
    even in the explore band."""
    cfg = small_cfg(load_model=True, training=False)
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    # two identical carries must pick identical (greedy) actions at t=5
    # regardless of RNG (inside the would-be explore band)
    _, l1 = jax.jit(slot_step)(carry, jnp.asarray(5))
    _, l2 = jax.jit(slot_step)(carry.replace(key=jax.random.PRNGKey(99)),
                               jnp.asarray(5))
    np.testing.assert_array_equal(np.asarray(l1["actions"]),
                                  np.asarray(l2["actions"]))


def test_trace_replay_through_runner(tmp_path):
    trace = np.random.RandomState(0).uniform(0, 100, size=(40, 4))
    path = tmp_path / "pos.npy"
    np.save(path, trace)
    cfg = small_cfg(save_results=False)
    cfg = dataclasses.replace(
        cfg, time_slots=60,
        env=dataclasses.replace(cfg.env, load_positions=True,
                                load_file_pos=str(path)),
    )
    carry, out = train_experiment(cfg, workdir=str(tmp_path), verbose=False)
    # after 60 slots (plus warmup+pretrain steps at t=0), positions come
    # from the trace row (60-1... the last step used t=59 -> row 59%40=19)
    np.testing.assert_allclose(
        np.asarray(carry.env_state.pos_x[0]), trace[59 % 40], rtol=1e-6
    )
