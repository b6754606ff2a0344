"""PS-DQN and PS-DRQN variant tests: mask/terminal episode-ingest semantics,
sequence targets, window sampling, and carried-hidden inference."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.agents import dqn as psdqn
from diral_tpu.agents import ps_drqn
from diral_tpu.agents.replay import TransitionReplay
from diral_tpu.models import qnets


def acfg(**over):
    cfg = toy_4ue_3r().agent
    net = dataclasses.replace(cfg.network, use_lstm_input=False,
                              use_dueling=False, layers=(16, 16))
    cfg = dataclasses.replace(cfg, batch_size=8, network=net, unroll_step=4)
    return dataclasses.replace(cfg, **over) if over else cfg


def test_ps_dqn_episode_ingest_mask_semantics():
    """Non-terminated episodes get their last step's mask zeroed
    (ps_dqn.py:279-289)."""
    buf = TransitionReplay.create(32, state_dim=3)
    states = jnp.arange(15, dtype=jnp.float32).reshape(5, 3)
    buf = psdqn.add_episode(buf, states, jnp.zeros(5, jnp.int32),
                            jnp.ones(5), terminated=False)
    np.testing.assert_array_equal(np.asarray(buf.masks[:5]), [1, 1, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(buf.terminals[:5]), [False] * 5)
    buf = psdqn.add_episode(buf, states, jnp.zeros(5, jnp.int32),
                            jnp.ones(5), terminated=True)
    np.testing.assert_array_equal(np.asarray(buf.masks[5:10]), [1] * 5)
    np.testing.assert_array_equal(np.asarray(buf.terminals[5:10]),
                                  [False] * 4 + [True])


def test_ps_dqn_terminal_target_cut():
    cfg = acfg()
    learner = psdqn.init_learner(jax.random.PRNGKey(0), 3, 3, cfg)
    batch = {
        "states": jnp.zeros((4, 3)),
        "next_states": jnp.ones((4, 3)),
        "rewards": jnp.asarray([1.0, 2.0, 3.0, 4.0]),
        "terminals": jnp.asarray([False, True, False, True]),
        "actions": jnp.zeros(4, jnp.int32),
        "masks": jnp.ones(4),
    }
    t = np.asarray(psdqn.td_targets(learner, batch, cfg))
    np.testing.assert_allclose(t[1], 2.0)  # terminal: raw reward
    np.testing.assert_allclose(t[3], 4.0)
    assert t[0] != 1.0 and t[2] != 3.0     # bootstrapped


def test_ps_dqn_trains():
    cfg = acfg()
    learner = psdqn.init_learner(jax.random.PRNGKey(0), 4, 3, cfg)
    buf = TransitionReplay.create(128, state_dim=4)
    rng = np.random.RandomState(0)
    for _ in range(4):
        s = jnp.asarray(rng.randn(20, 4), jnp.float32)
        buf = psdqn.add_episode(buf, s, jnp.asarray(rng.randint(0, 3, 20)),
                                jnp.asarray(rng.randn(20), jnp.float32), False)
    l2, loss = psdqn.train(learner, buf, jax.random.PRNGKey(1), cfg, 8)
    assert np.isfinite(float(loss))
    assert not np.allclose(
        np.asarray(jax.tree.leaves(l2.params)[0]),
        np.asarray(jax.tree.leaves(learner.params)[0]),
    )


def test_episode_replay_window_sampling():
    cfg = acfg()
    rep = ps_drqn.EpisodeReplay.create(4, max_len=16, state_dim=2)
    rng = np.random.RandomState(0)
    for e in range(4):
        L = 16
        length = [6, 10, 16, 3][e]
        s = np.zeros((L, 2), np.float32)
        s[:length, 0] = e + 1          # episode id channel
        s[:length, 1] = np.arange(length)  # step index channel
        rep = rep.add_episode(jnp.asarray(s),
                              jnp.zeros(L, jnp.int32), jnp.zeros(L),
                              terminated=(e == 2), length=length)
    out = rep.sample_windows(jax.random.PRNGKey(0), 64, 4)
    s = np.asarray(out["states"])      # [64, 4, 2]
    m = np.asarray(out["mask"])
    for j in range(64):
        filled = m[j].astype(bool) | (np.asarray(out["terminals"][j]))
        ep_ids = s[j, :, 0][s[j, :, 0] > 0]
        assert len(set(ep_ids.tolist())) <= 1  # windows never span episodes
        steps = s[j, :, 1][s[j, :, 0] > 0]
        if len(steps) > 1:
            np.testing.assert_array_equal(np.diff(steps), 1)  # contiguous
    # mask fixup: last filled slot is zero unless terminal
    term = np.asarray(out["terminals"])
    for j in range(64):
        filled_idx = np.where(s[j, :, 0] > 0)[0]
        if len(filled_idx):
            last = filled_idx[-1]
            if not term[j, last]:
                assert m[j, last] == 0.0


def test_episode_replay_length_weighting():
    rep = ps_drqn.EpisodeReplay.create(4, max_len=16, state_dim=1)
    lengths = [2, 2, 12, 2]
    for e, L in enumerate(lengths):
        s = np.full((16, 1), e + 1, np.float32)
        rep = rep.add_episode(jnp.asarray(s), jnp.zeros(16, jnp.int32),
                              jnp.zeros(16), False, L)
    counts = np.zeros(5)
    for k in range(30):
        out = rep.sample_windows(jax.random.PRNGKey(k), 32, 4)
        ids = np.asarray(out["states"])[:, 0, 0]
        for i in ids:
            counts[int(i)] += 1
    # episode 3 (len 12 of total 18) should dominate ~2/3 of draws
    frac = counts[3] / counts.sum()
    assert 0.5 < frac < 0.8, frac


def test_ps_drqn_carried_hidden_changes_qvalues():
    """Same observation, different carried hidden -> different Q values
    (the recurrent memory actually feeds inference, ps_drqn.py:195-231)."""
    cfg = acfg()
    learner = ps_drqn.init_learner(jax.random.PRNGKey(0), 4, 3, cfg)
    obs = jnp.ones((2, 4))
    h0 = ps_drqn.init_hidden(cfg, 2)
    a1, h1 = ps_drqn.infer_actions(learner, obs, h0, jax.random.PRNGKey(1),
                                   0.0, cfg)
    assert not np.allclose(np.asarray(h1), np.asarray(h0))
    q_a, _ = qnets.ps_drqn_apply_step(learner.params, obs, h0, cfg)
    q_b, _ = qnets.ps_drqn_apply_step(learner.params, obs, h1, cfg)
    assert not np.allclose(np.asarray(q_a), np.asarray(q_b))


def test_ps_drqn_trains():
    cfg = acfg()
    learner = ps_drqn.init_learner(jax.random.PRNGKey(0), 4, 3, cfg)
    rep = ps_drqn.EpisodeReplay.create(4, max_len=25, state_dim=4)
    rng = np.random.RandomState(1)
    for e in range(4):
        s = jnp.asarray(rng.randn(25, 4), jnp.float32)
        rep = rep.add_episode(s, jnp.asarray(rng.randint(0, 3, 25)),
                              jnp.asarray(rng.randn(25), jnp.float32),
                              False, 25)
    l2, loss = ps_drqn.train(learner, rep, jax.random.PRNGKey(2), cfg, 4)
    assert np.isfinite(float(loss))
    assert not np.allclose(
        np.asarray(jax.tree.leaves(l2.params)[0]),
        np.asarray(jax.tree.leaves(learner.params)[0]),
    )


# ---------------------------------------------------------------------------
# In-process vmapped training (VERDICT r3 #5): batched episode ingest must
# BIT-equal the sequential per-agent reference ingestion, and both PS
# loops must train end-to-end on the batched env.
# ---------------------------------------------------------------------------


def test_dqn_batch_ingest_equals_sequential():
    """add_episodes_batch == A sequential add_episode calls (agent-major
    transition order, mask/terminal convention, ring wraparound)."""
    rng = np.random.RandomState(3)
    A, L, D = 5, 7, 4
    states = jnp.asarray(rng.randn(A, L, D), jnp.float32)
    actions = jnp.asarray(rng.randint(0, 3, (A, L)), jnp.int32)
    rewards = jnp.asarray(rng.randn(A, L), jnp.float32)
    done = jnp.asarray([False, True, False, True, False])

    cap = 24  # < A*L: exercises wraparound
    seq = TransitionReplay.create(cap, D)
    for i in range(A):
        seq = psdqn.add_episode(seq, states[i], actions[i], rewards[i],
                                done[i])
    batch = psdqn.add_episodes_batch(TransitionReplay.create(cap, D),
                                     states, actions, rewards, done)
    for field in ("states", "actions", "rewards", "terminals", "masks",
                  "head", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(seq, field)),
            np.asarray(getattr(batch, field)), err_msg=field)


def test_ps_drqn_batch_ingest_equals_sequential():
    rng = np.random.RandomState(4)
    A, L, D, E = 4, 6, 3, 6
    states = jnp.asarray(rng.randn(A, L, D), jnp.float32)
    actions = jnp.asarray(rng.randint(0, 3, (A, L)), jnp.int32)
    rewards = jnp.asarray(rng.randn(A, L), jnp.float32)
    done = jnp.asarray([True, False, True, False])
    lengths = jnp.asarray([L, L - 2, L, L - 1], jnp.int32)

    seq = ps_drqn.EpisodeReplay.create(E, L, D)
    for i in range(A):
        seq = seq.add_episode(states[i], actions[i], rewards[i], done[i],
                              lengths[i])
    batch = ps_drqn.EpisodeReplay.create(E, L, D).add_episodes_batch(
        states, actions, rewards, done, lengths)
    for field in ("states", "actions", "rewards", "terminals", "lengths",
                  "ptr", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(seq, field)),
            np.asarray(getattr(batch, field)), err_msg=field)


def _ps_loop_cfg(users=2, channels=2, envs=4, layers=(32,)):
    base = toy_4ue_3r(save_positions=False, memory_size=4096)
    env = dataclasses.replace(base.env, num_users=users,
                              num_channels=channels)
    agent = dataclasses.replace(
        base.agent, batch_size=64, target_update=50, training_freq=1,
        eps_decay=0.99, learning_rate=3e-4, unroll_step=4,
        network=dataclasses.replace(base.agent.network,
                                    use_lstm_input=False, layers=layers),
    )
    return dataclasses.replace(
        base, env=env, agent=agent,
        engine=dataclasses.replace(base.engine, num_envs=envs))


def test_ps_dqn_inprocess_loop_smoke():
    from diral_tpu.train.ps_loop import run_ps

    cfg = _ps_loop_cfg()
    carry, logs = run_ps(cfg, "ps-dqn", seed=0, num_episodes=12)
    sr = np.asarray(logs["mean_sum_reward"])
    assert sr.shape == (12,) and np.isfinite(sr).all()
    assert np.isfinite(np.asarray(logs["loss"])).all()
    # eps decays once per episode ADVANCE (driver semantics,
    # policies.py:45-63): episodes 0..11 -> 11 decays
    expect = max(cfg.agent.eps_init * cfg.agent.eps_decay ** 11,
                 cfg.agent.eps_min)
    np.testing.assert_allclose(float(logs["eps"][-1]), expect, rtol=1e-5)
    # the replay actually filled: A*L transitions per episode
    assert int(carry.replay.count) == min(
        cfg.memory_size,
        12 * cfg.engine.num_envs * cfg.env.num_users * cfg.episode_interval)


def test_ps_drqn_inprocess_loop_smoke():
    from diral_tpu.train.ps_loop import run_ps

    cfg = _ps_loop_cfg()
    carry, logs = run_ps(cfg, "ps-drqn", seed=0, num_episodes=8)
    sr = np.asarray(logs["mean_sum_reward"])
    assert sr.shape == (8,) and np.isfinite(sr).all()
    assert np.isfinite(np.asarray(logs["loss"])).all()
    # carried hidden state is live (non-zero after rollout) and per-agent
    h = np.asarray(carry.hidden)
    assert h.shape[0] == cfg.engine.num_envs * cfg.env.num_users
    assert np.abs(h).max() > 0


def test_ps_dqn_inprocess_learns():
    """The in-process PS-DQN loop must learn 2-user/2-channel coordination
    (optimal mean sum reward 2.0) -- the same bar the DRQN and PPO loops
    clear in their learner tests."""
    from diral_tpu.train.ps_loop import run_ps

    cfg = _ps_loop_cfg(envs=8)
    carry, logs = run_ps(cfg, "ps-dqn", seed=0, num_episodes=260)
    sr = np.asarray(logs["mean_sum_reward"])
    early, late = sr[:30].mean(), sr[-30:].mean()
    assert late > early + 0.3, f"no learning: early={early:.2f} late={late:.2f}"
    assert late > 1.3, f"late reward too low: {late:.2f} (optimal 2.0)"


def test_ps_drqn_inprocess_learns():
    from diral_tpu.train.ps_loop import run_ps

    cfg = _ps_loop_cfg(envs=8)
    carry, logs = run_ps(cfg, "ps-drqn", seed=1, num_episodes=200)
    sr = np.asarray(logs["mean_sum_reward"])
    early, late = sr[:25].mean(), sr[-25:].mean()
    assert late > early + 0.3, f"no learning: early={early:.2f} late={late:.2f}"
    assert late > 1.3, f"late reward too low: {late:.2f} (optimal 2.0)"
