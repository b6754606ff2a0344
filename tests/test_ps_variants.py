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
