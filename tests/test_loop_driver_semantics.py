"""Regression tests for driver-semantics details surfaced in review:
velocity kicks fire at episode ends under mobility_vary; pretrain uses the
channel-model step when enable_channel; buffer-fill gate for per-slot
training cadence."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.train.loop import make_train_functions


def tiny(**over):
    cfg = toy_4ue_3r(
        time_slots=120, memory_size=128, explore=10, greedy=100000,
        training=True, train_after_episode=True, save_positions=False,
    )
    agent = dataclasses.replace(
        cfg.agent, batch_size=16, n_batch=1, target_update=25,
        network=dataclasses.replace(cfg.agent.network, layers=(16, 16)),
    )
    return dataclasses.replace(cfg, agent=agent, **over)


def test_velocity_kicks_fire_under_mobility_vary():
    """main_test.py:233 calls env.update_velocity() every episode end;
    with mobility_vary velocities must change (+-0.55 kicks) over episodes
    and stay clamped to [1.1, 2.77]."""
    cfg = tiny()
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, mobility_vary=True)
    )
    init_carry, slot_step, run = make_train_functions(cfg)
    carry, logs = run(jax.random.PRNGKey(0), 120)
    vel = np.asarray(carry.env_state.vel)
    # initial mobility_vary velocity is 1.7 everywhere (network.py:108);
    # after 4 episode ends some vehicle must have moved off it
    assert not np.allclose(vel, 1.7), vel
    assert (vel >= 1.1 - 1e-6).all() and (vel <= 2.77 + 1e-6).all()
    # off-episode slots don't change velocities
    carry2 = carry
    c3, _ = jax.jit(slot_step)(carry2, jnp.asarray(121))  # 121 % 25 != 24
    np.testing.assert_array_equal(np.asarray(c3.env_state.vel), vel)


def test_pretrain_uses_channel_step_when_enabled():
    """Reference pretrain calls my_step_ch when enable_channel
    (main_test.py:101-103); only the channel step records packet-arrival
    slots (test_env.py:434-436), so last_arrival must contain non-negative
    entries right after init."""
    cfg = tiny(enable_channel=True)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, communication_range=250.0)
    )
    init_carry, _, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    assert (np.asarray(carry.env_state.last_arrival) >= 0).any()

    # whereas the design-step pretrain (enable_channel False) never sets
    # arrivals -- everything stays -1 or gets reset to -1
    cfg2 = tiny(enable_channel=False)
    init_carry2, _, _ = make_train_functions(cfg2)
    carry2 = jax.jit(init_carry2)(jax.random.PRNGKey(0))
    assert (np.asarray(carry2.env_state.last_arrival) == -1).all()


def test_per_slot_training_gated_on_buffer_fill():
    """train_after_episode=False must not train until the replay holds
    enough windows for a full batch (no zero-padded batches)."""
    cfg = tiny(train_after_episode=False, training_stop=1000, memory_size=512)
    agent = dataclasses.replace(cfg.agent, batch_size=256)  # > pretrain fill
    cfg = dataclasses.replace(cfg, agent=agent)
    init_carry, slot_step, run = make_train_functions(cfg)
    carry, logs = run(jax.random.PRNGKey(0), 150)
    loss = np.asarray(logs["loss"])
    # pretrain leaves 181 slots; the batch of 256 windows (step 6) needs
    # count >= 262, reached around slot 81 -- no training before that
    fill_slot = 256 + 6 - 181
    assert (loss[:fill_slot] == 0).all()
    assert (loss[fill_slot + 2:] != 0).any()


def test_positions_logged_before_step():
    """logs['pos_x'] at slot t must be the positions BEFORE slot t's
    mobility advance (main_test.py:140-142 reads get_x_pos() before
    my_step), i.e. row t+1 equals row t advanced by one mobility step."""
    cfg = tiny(save_positions=True, time_slots=4)
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry0 = jax.jit(init_carry)(jax.random.PRNGKey(0))
    pre = np.asarray(carry0.env_state.pos_x)
    vel = np.asarray(carry0.env_state.vel)
    dirn = np.asarray(carry0.env_state.direction)
    carry, logs = jax.jit(
        lambda c: jax.lax.scan(slot_step, c, jnp.arange(4))
    )(carry0)
    pos = np.asarray(logs["pos_x"])           # [T, B, N]
    np.testing.assert_array_equal(pos[0], pre)
    L = cfg.env.highway_length
    expected1 = np.mod(pre + dirn * vel + L, L).astype(pre.dtype)
    np.testing.assert_allclose(pos[1], expected1, rtol=0, atol=1e-5)


def test_slot0_keys_differ_from_init_keys():
    """The carried RNG stream must be fresh: slot 0's subkeys must not
    collide with init_carry's consumed subkeys (key-reuse regression)."""
    cfg = tiny(time_slots=2)
    init_carry, _, _ = make_train_functions(cfg)
    key = jax.random.PRNGKey(0)
    carry = jax.jit(init_carry)(key)
    consumed = jax.random.split(key, 5)[:4]   # k_env, k_act, k_pre, k_rest
    slot0 = jax.random.split(carry.key, 4)
    for a in np.asarray(slot0):
        for b in np.asarray(consumed):
            assert not np.array_equal(a, b)


def test_episode_grain_bit_identical_to_slot_grain():
    """The episode-grain dispatch (loop.episode_step via make_chunk_runner,
    the TPU path that eliminates the per-slot lax.cond around the train
    event) must be BIT-identical to per-slot dispatch: same logs, same
    learner params, across both gate-false (t <= batch_size+10) and
    gate-true episodes."""
    from functools import partial
    from diral_tpu.train.runner import make_chunk_runner

    cfg = tiny(explore=0)
    init_carry, slot_step, _ = make_train_functions(cfg)
    assert slot_step.episode_step is not None
    carry0 = jax.jit(init_carry)(jax.random.PRNGKey(3))
    n = cfg.episode_interval * 4  # covers gate-false and gate-true episodes

    @partial(jax.jit, static_argnames=("m",))
    def run_slots(c, m: int):
        return jax.lax.scan(slot_step, c, jnp.arange(m))

    ref_carry, ref_logs = run_slots(carry0, n)

    run_chunk, _ = make_chunk_runner(slot_step)
    out_carry, out_logs = run_chunk(carry0, 0, n)

    for k in ref_logs:
        np.testing.assert_array_equal(np.asarray(out_logs[k]),
                                      np.asarray(ref_logs[k]), err_msg=k)
    for a, b in zip(jax.tree.leaves(out_carry), jax.tree.leaves(ref_carry)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unaligned_chunk_falls_back_to_slot_grain():
    """A chunk not aligned to episode_interval must still work (slot-grain
    fallback) and produce identical results to an aligned pair of chunks."""
    from diral_tpu.train.runner import make_chunk_runner

    cfg = tiny(explore=0)
    init_carry, slot_step, _ = make_train_functions(cfg)
    run_chunk, _ = make_chunk_runner(slot_step)
    I = cfg.episode_interval

    # run_chunk donates its carry, so each dispatch chain inits afresh
    # (identical key -> identical carry), like the production runner
    def fresh():
        return jax.jit(init_carry)(jax.random.PRNGKey(5))

    # one aligned dispatch of 2 episodes
    ca, logs_a = run_chunk(fresh(), 0, 2 * I)
    # unaligned split: 30 + (2I - 30) slots (both slot-grain)
    cb, logs_b1 = run_chunk(fresh(), 0, 30)
    cb, logs_b2 = run_chunk(cb, 30, 2 * I - 30)

    np.testing.assert_array_equal(
        np.asarray(logs_a["sum_reward"]),
        np.concatenate([np.asarray(logs_b1["sum_reward"]),
                        np.asarray(logs_b2["sum_reward"])]))
    for a, b in zip(jax.tree.leaves(ca), jax.tree.leaves(cb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_piggybacking_trains_end_to_end():
    """State.piggybacking=True (repaired fixed-width obs, VERDICT r2 #2)
    through the FULL loop: warmup (my_step, piggy width C*C), pretrain
    (my_step_design, plain [N, C] obs zero-padded by obtain_state), and
    the training slots with episodic train events."""
    cfg = tiny(time_slots=60)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(
            cfg.env, state=dataclasses.replace(
                cfg.env.state, piggybacking=True, add_channel_obs=True)))
    assert cfg.env.state_space == 3 + 3 * 3 + 20
    init_carry, slot_step, run = make_train_functions(cfg)
    carry, logs = run(jax.random.PRNGKey(0), 60)
    assert carry.state.shape == (cfg.engine.num_envs, cfg.env.num_users,
                                 cfg.env.state_space)
    loss = np.asarray(logs["loss"])
    assert np.isfinite(loss).all()
    assert (loss != 0).any()  # the episodic train event actually fired
    # piggy payload blocks are genuinely live: some non-base column of the
    # assembled state is nonzero (prev_obs payloads reached the net input)
    st = np.asarray(carry.state)
    piggy_block_cols = st[:, :, 3 + cfg.env.num_channels:3 + 9]
    assert np.abs(piggy_block_cols).sum() > 0
