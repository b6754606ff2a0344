"""Serve-and-learn over the external-simulator gateway.

This is the reference's *intended* RealNeS training mode -- per-agent
event-driven scheduling requests with sequence numbers and delayed rewards,
answered online by a learning agent -- which the reference could never run
(the simulator is absent from its repo and `main_test` hard-disables the
path, main_test.py:291-293; the PS agents that were built for it are
unrunnable without base.py).  Here it works end-to-end against the in-repo
C++ toy-RealNeS:

* each scheduling request carries the requester's neighbor table; the
  gateway env turns it into the positional-distribution state and a
  PRR-mapped reward (gateway_env.get_observation_syn_dist);
* actions come from the PS-DRQN learner with per-agent carried GRU hidden
  state (agents/ps_drqn.infer_actions, ps_drqn.py:195-231 semantics);
* (state, action, reward) tuples are SN-aligned per agent, like the
  reference ``EpisodesBuffer`` (utils/memory.py:65-117: a slot is only
  consumed once state+action+reward for its SN are all present);
* every ``train_every`` completed rounds the accumulated per-agent episodes
  flush into the device ``EpisodeReplay`` and the learner takes
  ``n_batches`` gradient steps.

The serving loop is host-driven by construction (the simulator dictates
event order over the socket); inference and training are jitted.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.agents import ps_drqn
from diral_tpu.config import AgentConfig
from diral_tpu.interop.gateway_env import GatewayEnv


class SNAlignedEpisodes:
    """Per-agent SN-slot episode assembly (EpisodesBufferEntry semantics,
    utils/memory.py:14-62): state+action and the (delayed) reward arrive at
    different times, each lands set-once in its SN slot, and a slot is only
    training-ready when both halves are present (the SN reconciliation that
    alleviates delayed rewards, memory.py:38-62 + ps_drqn.py:282-288)."""

    def __init__(self, num_agents: int, capacity: int, state_dim: int):
        self.capacity = capacity
        self.states = np.zeros((num_agents, capacity, state_dim), np.float32)
        self.actions = np.zeros((num_agents, capacity), np.int32)
        self.rewards = np.zeros((num_agents, capacity), np.float32)
        self.has_sa = np.zeros((num_agents, capacity), bool)
        self.has_r = np.zeros((num_agents, capacity), bool)
        # flush windows an armed (has_sa-only) slot has survived: a reward
        # lost forever must not leave its slot armed, or the recycled SN
        # (sn % capacity collision) would pair the STALE state/action with
        # the new SN's reward -- the aliasing this class exists to prevent
        self.sa_age = np.zeros((num_agents, capacity), np.int8)

    def record_obs_act(self, agent: int, sn: int, state, action):
        slot = sn % self.capacity
        if not self.has_sa[agent, slot]:
            self.states[agent, slot] = state
            self.actions[agent, slot] = action
            self.has_sa[agent, slot] = True
            self.sa_age[agent, slot] = 0

    def record_reward(self, agent: int, sn: int, reward):
        slot = sn % self.capacity
        if not self.has_r[agent, slot]:
            self.rewards[agent, slot] = reward
            self.has_r[agent, slot] = True

    def flush(self, replay: ps_drqn.EpisodeReplay) -> ps_drqn.EpisodeReplay:
        """Move complete (state+action+reward) slots into the device replay
        and release them (the `is not -1` triple filter, ps_drqn.py:282-288).

        Slots still awaiting their delayed reward (has_sa without has_r —
        typically the window's last SN, whose reward rides the NEXT
        request) are kept armed, so the late reward completes the pair it
        belongs to instead of landing in a recycled slot and pairing with
        a state/action from ``capacity`` SNs later."""
        for a in range(self.states.shape[0]):
            complete = self.has_sa[a] & self.has_r[a]
            length = int(complete.sum())
            if length:
                idx = np.where(complete)[0]
                L = replay.states.shape[1]
                take = idx[:L]
                s = np.zeros((L, self.states.shape[2]), np.float32)
                act = np.zeros((L,), np.int32)
                rew = np.zeros((L,), np.float32)
                s[: len(take)] = self.states[a, take]
                act[: len(take)] = self.actions[a, take]
                rew[: len(take)] = self.rewards[a, take]
                replay = replay.add_episode(
                    jnp.asarray(s), jnp.asarray(act), jnp.asarray(rew),
                    terminated=False, length=min(length, L),
                )
            self.has_sa[a, complete] = False
            self.has_r[a, complete] = False
            # orphan rewards (reward without state/action, e.g. the obs was
            # dropped) must not pair with a future state/action
            self.has_r[a, self.has_r[a] & ~self.has_sa[a]] = False
            # age slots still awaiting their delayed reward; one full flush
            # window is the legitimate delay (the last SN's reward rides the
            # next request), beyond that the reward is lost -- disarm so the
            # stale state/action cannot pair with a recycled SN's reward
            armed = self.has_sa[a] & ~self.has_r[a]
            self.sa_age[a, armed] += 1
            self.has_sa[a, armed & (self.sa_age[a] > 1)] = False
        return replay


def serve_and_learn(env: GatewayEnv, cfg: AgentConfig, rounds: int,
                    train_every: int = 25, n_batches: int = 2,
                    eps: float = 0.2, seed: int = 0):
    """Serve ``rounds`` full scheduling rounds, learning online.

    Returns (learner, stats dict)."""
    env.initialize_env()
    n = env.get_total_users()
    a_dim = env.get_action_space()
    # get_observation_syn_dist always serves a state_bins-wide positional
    # histogram (gateway_env.py: neighbor_dist_type1/2), regardless of the
    # DRQN-path state_space bookkeeping (which counts action bits and the
    # state_design-1 obs width) -- size the learner to what is served
    d = env.state_bins

    key = jax.random.PRNGKey(seed)
    learner = ps_drqn.init_learner(key, d, a_dim, cfg)
    hidden = ps_drqn.init_hidden(cfg, n)
    replay = ps_drqn.EpisodeReplay.create(
        capacity=n, max_len=train_every, state_dim=d
    )
    episodes = SNAlignedEpisodes(n, capacity=train_every, state_dim=d)

    infer = jax.jit(
        lambda lr, obs, h, k, e: ps_drqn.infer_actions(lr, obs, h, k, e, cfg)
    )

    rewards_log, losses = [], []
    trained_rounds = 0
    for rnd in range(rounds):
        for _ in range(n):
            user_id, sn, state, reward, _ = env.get_observation_syn_dist()
            agent = user_id - 1 if env.bridge.disable_one_user else user_id
            key, ka = jax.random.split(key)
            obs = jnp.asarray(state, jnp.float32)[None, :]
            acts, h_new = infer(learner, obs, hidden[agent:agent + 1], ka,
                                jnp.asarray(eps))
            hidden = hidden.at[agent].set(h_new[0])
            action = int(acts[0])
            env.apply_action(action)
            episodes.record_obs_act(agent, sn, state, action)
            # the reward in this request is the delayed reward for SN-1
            if sn > 0:
                episodes.record_reward(agent, sn - 1, reward)
                rewards_log.append(reward)

        if (rnd + 1) % train_every == 0:
            replay = episodes.flush(replay)
            if int(replay.count) > 0:
                key, kt = jax.random.split(key)
                learner, loss = ps_drqn.train(learner, replay, kt, cfg,
                                              n_batches)
                losses.append(float(loss))
                trained_rounds += 1

    return learner, {
        "rounds": rounds,
        "mean_reward": float(np.mean(rewards_log)) if rewards_log else 0.0,
        "train_calls": trained_rounds,
        "losses": losses,
    }
