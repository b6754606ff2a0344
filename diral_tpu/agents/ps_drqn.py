"""Parameter-shared recurrent DQN with truncated BPTT (reference
algorithms/ps_drqn.py ``DeepRecurrentQNetwork``) -- the episode-replay GRU
variant with per-agent carried hidden state.

Like PS-DQN, the reference class is unrunnable as shipped (missing
``TFBaseModel``, ps_drqn.py:11); semantics reconstructed from the body:

* episode replay capped at ``num_users`` episodes (deque, ps_drqn.py:109-111)
  -- here a fixed [E, L, ...] ring with a length vector;
* length-weighted episode sampling: p(episode) proportional to its length
  (ps_drqn.py:329-331,354);
* random ``unroll_step`` windows per sampled episode, zero-padded, with the
  window's last filled step masked out unless it is terminal
  (ps_drqn.py:358-374).  The reference's next-state buffer is the
  flat obs buffer shifted by one (``batch_obs[1:]``, ps_drqn.py:377), which
  leaks the first element of the *next* window into the previous window's
  last slot -- exactly the slot the mask already zeroes; implemented
  cleanly as an in-episode shift, equivalent under the mask;
* Double-DQN sequence targets with terminal cut (ps_drqn.py:233-271),
  masked TD loss, Adam with global-norm clip 10.0 (ps_drqn.py:82-85);
* inference carries a per-agent GRU hidden state across slots
  (ps_drqn.py:168-231) -- here an explicit [num_agents, H] array in the
  rollout carry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diral_tpu.config import AgentConfig
from diral_tpu.models import qnets


class EpisodeReplay(struct.PyTreeNode):
    """Fixed-capacity episode store (capacity = num episodes, reference sets
    it to num_users, ps_drqn.py:109)."""

    states: jax.Array     # [E, L, D]
    actions: jax.Array    # [E, L] int32
    rewards: jax.Array    # [E, L]
    terminals: jax.Array  # [E, L] bool
    lengths: jax.Array    # [E] int32
    ptr: jax.Array
    count: jax.Array

    @classmethod
    def create(cls, capacity: int, max_len: int, state_dim: int,
               dtype=jnp.float32) -> "EpisodeReplay":
        return cls(
            states=jnp.zeros((capacity, max_len, state_dim), dtype),
            actions=jnp.zeros((capacity, max_len), jnp.int32),
            rewards=jnp.zeros((capacity, max_len), dtype),
            terminals=jnp.zeros((capacity, max_len), bool),
            lengths=jnp.zeros((capacity,), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
        )

    def add_episode(self, states, actions, rewards, terminated, length):
        """states [L, D] zero-padded; length = filled steps.  Terminal flag
        set on the last filled step iff the episode terminated
        (ps_drqn.py:290-300)."""
        i = self.ptr
        L = self.states.shape[1]
        term = (jnp.arange(L) == length - 1) & jnp.asarray(terminated, bool)
        return self.replace(
            states=self.states.at[i].set(jnp.asarray(states, self.states.dtype)),
            actions=self.actions.at[i].set(jnp.asarray(actions, jnp.int32)),
            rewards=self.rewards.at[i].set(jnp.asarray(rewards, self.rewards.dtype)),
            terminals=self.terminals.at[i].set(term),
            lengths=self.lengths.at[i].set(length),
            ptr=(i + 1) % self.states.shape[0],
            count=jnp.minimum(self.count + 1, self.states.shape[0]),
        )

    def add_episodes_batch(self, states, actions, rewards, terminated,
                           lengths):
        """Batched ingest of A episodes at consecutive ring slots (the
        reference adds one episode per agent per boundary,
        ps_drqn.py:273-300).  states [A, L, D] zero-padded,
        actions/rewards [A, L], terminated [A] bool, lengths [A] int32.
        Bit-equal to A sequential ``add_episode`` calls."""
        A = lengths.shape[0]
        E, L, _ = self.states.shape
        idx = (self.ptr + jnp.arange(A)) % E
        term = ((jnp.arange(L)[None, :] == lengths[:, None] - 1)
                & jnp.asarray(terminated, bool)[:, None])
        return self.replace(
            states=self.states.at[idx].set(
                jnp.asarray(states, self.states.dtype)),
            actions=self.actions.at[idx].set(jnp.asarray(actions, jnp.int32)),
            rewards=self.rewards.at[idx].set(
                jnp.asarray(rewards, self.rewards.dtype)),
            terminals=self.terminals.at[idx].set(term),
            lengths=self.lengths.at[idx].set(jnp.asarray(lengths, jnp.int32)),
            ptr=(self.ptr + A) % E,
            count=jnp.minimum(self.count + A, E),
        )

    def sample_windows(self, key, batch: int, unroll: int):
        """Length-weighted episode draw + random in-episode window
        (ps_drqn.py:354-374).  Returns [batch, unroll, ...] + masks."""
        E, L, D = self.states.shape
        k_ep, k_start = jax.random.split(key)
        valid = jnp.arange(E) < self.count
        w = jnp.where(valid, self.lengths, 0).astype(jnp.float32)
        logits = jnp.log(jnp.maximum(w, 1e-9))
        eps_idx = jax.random.categorical(k_ep, logits, shape=(batch,))
        length = self.lengths[eps_idx]
        start = jax.random.randint(k_start, (batch,), 0, jnp.maximum(length, 1))
        real = jnp.minimum(length - start, unroll)

        offs = jnp.arange(unroll)[None, :]
        pos = start[:, None] + offs                       # [batch, unroll]
        inb = offs < real[:, None]
        pos_c = jnp.minimum(pos, L - 1)
        take = lambda arr: jnp.where(
            inb.reshape(inb.shape + (1,) * (arr.ndim - 2)),
            arr[eps_idx[:, None], pos_c], 0,
        )
        states = take(self.states)
        actions = jnp.where(inb, self.actions[eps_idx[:, None], pos_c], 0)
        rewards = jnp.where(inb, self.rewards[eps_idx[:, None], pos_c], 0)
        terminals = jnp.where(inb, self.terminals[eps_idx[:, None], pos_c], False)
        # in-episode next states (clamped); the window's last filled slot is
        # masked below, which also covers the reference's cross-window leak
        npos = jnp.minimum(pos + 1, L - 1)
        next_states = jnp.where(
            inb[..., None], self.states[eps_idx[:, None], npos], 0
        )
        mask = inb.astype(states.dtype)
        last_slot = jnp.maximum(real - 1, 0)
        last_term = terminals[jnp.arange(batch), last_slot]
        mask = mask.at[jnp.arange(batch), last_slot].set(
            jnp.where(last_term, mask[jnp.arange(batch), last_slot], 0.0)
        )
        return {
            "states": states, "actions": actions, "rewards": rewards,
            "terminals": terminals, "next_states": next_states, "mask": mask,
        }


class PSDRQNLearner(struct.PyTreeNode):
    params: dict
    target_params: dict
    opt_state: optax.OptState


def make_optimizer(cfg: AgentConfig):
    return optax.chain(
        optax.clip_by_global_norm(10.0),  # ps_drqn.py:84
        optax.adam(cfg.learning_rate),
    )


def init_learner(key, state_dim: int, action_dim: int, cfg: AgentConfig,
                 dtype=jnp.float32) -> PSDRQNLearner:
    params = qnets.ps_drqn_init(key, state_dim, action_dim, cfg, dtype)
    return PSDRQNLearner(
        params=params,
        target_params=jax.tree.map(jnp.copy, params),
        opt_state=make_optimizer(cfg).init(params),
    )


def init_hidden(cfg: AgentConfig, num_agents: int, dtype=jnp.float32):
    h = cfg.network.layers[-1]
    return jnp.zeros((num_agents, h), dtype)


def infer_actions(learner: PSDRQNLearner, obs, hidden, key, eps,
                  cfg: AgentConfig):
    """One slot of carried-hidden inference for all agents
    (ps_drqn.py:195-231). obs [A, D], hidden [A, H] -> actions, new hidden."""
    q, new_h = qnets.ps_drqn_apply_step(learner.params, obs, hidden, cfg)
    n, a = q.shape
    kd, kr = jax.random.split(key)
    rand = jax.random.randint(kr, (n,), 0, a)
    cond = jax.random.uniform(kd, (n,)) < eps
    actions = jnp.where(cond, rand, jnp.argmax(q, axis=1)).astype(jnp.int32)
    return actions, new_h


def td_targets(learner: PSDRQNLearner, batch, cfg: AgentConfig):
    """Double-DQN over [batch, unroll] sequences (ps_drqn.py:233-271):
    zero initial hidden per window, flat [batch*unroll] gather."""
    tq, _ = qnets.ps_drqn_apply_seq(learner.target_params, batch["next_states"], cfg)
    if cfg.network.use_double:
        oq, _ = qnets.ps_drqn_apply_seq(learner.params, batch["next_states"], cfg)
        next_v = jnp.take_along_axis(tq, jnp.argmax(oq, axis=1)[:, None], 1)[:, 0]
    else:
        next_v = tq.max(axis=1)
    r = batch["rewards"].reshape(-1)
    term = batch["terminals"].reshape(-1)
    return jnp.where(term, r, r + cfg.gamma * next_v)


def loss_fn(params, batch, targets, cfg: AgentConfig):
    q, _ = qnets.ps_drqn_apply_seq(params, batch["states"], cfg)
    acts = batch["actions"].reshape(-1)
    chosen = jnp.take_along_axis(q, acts[:, None], 1)[:, 0]
    td = jnp.square(targets - chosen)
    m = batch["mask"].reshape(-1)
    return jnp.sum(td * m) / jnp.maximum(jnp.sum(m), 1.0)


@partial(jax.jit, static_argnames=("cfg", "n_batches"))
def train(learner: PSDRQNLearner, replay: EpisodeReplay, key,
          cfg: AgentConfig, n_batches: int):
    """n_batches window-batch gradient steps; target sync at
    ct % target_update == 0 after the step (ps_drqn.py:353-398)."""
    opt = make_optimizer(cfg)

    def step(carry, k):
        learner, ct = carry
        batch = replay.sample_windows(k, cfg.batch_size, cfg.unroll_step)
        targets = jax.lax.stop_gradient(td_targets(learner, batch, cfg))
        loss, grads = jax.value_and_grad(loss_fn)(
            learner.params, batch, targets, cfg
        )
        updates, opt_state = opt.update(grads, learner.opt_state)
        learner = learner.replace(
            params=optax.apply_updates(learner.params, updates),
            opt_state=opt_state,
        )
        target = jax.tree.map(
            lambda t, p: jnp.where(ct % cfg.target_update == 0, p, t),
            learner.target_params, learner.params,
        )
        return (learner.replace(target_params=target), ct + 1), loss

    (learner, _), losses = jax.lax.scan(
        step, (learner, jnp.zeros((), jnp.int32)),
        jax.random.split(key, n_batches),
    )
    return learner, losses.mean()
