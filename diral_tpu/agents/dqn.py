"""Parameter-shared feedforward DQN learner (reference algorithms/ps_dqn.py
``DeepQNetwork``) -- the episode-ingesting, mask/terminal-aware variant.

The reference cannot actually run (its ``TFBaseModel`` base class is absent
from the repo, ps_dqn.py:7); the semantics below are reconstructed from the
class body and given a working home:

* episode ingest with SN-aligned filtering and mask/terminal convention:
  mask all-ones, last step masked out unless the episode terminated
  (ps_dqn.py:258-294);
* Double-DQN target with terminal cut: where(terminal, r, r + gamma*next_v)
  (ps_dqn.py:237-256);
* masked TD loss sum(td^2 * mask) / sum(mask) (ps_dqn.py:100-104);
* Adam with global-norm gradient clip 5.0 (ps_dqn.py:107-111);
* n_batches = training_freq * added / batch_size gradient steps per train
  call; target sync on batch counts ct % target_update == 0 -- which
  includes ct = 0, i.e. the first batch of every train call syncs
  (ps_dqn.py:324-349; reproduced as-is);
* eps-greedy inference (ps_dqn.py:200-235).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diral_tpu.config import AgentConfig
from diral_tpu.agents.replay import TransitionReplay
from diral_tpu.models import qnets


class PSDQNLearner(struct.PyTreeNode):
    params: dict
    target_params: dict
    opt_state: optax.OptState


def make_optimizer(cfg: AgentConfig):
    return optax.chain(
        optax.clip_by_global_norm(5.0),  # ps_dqn.py:110
        optax.adam(cfg.learning_rate),
    )


def init_learner(key, state_dim: int, action_dim: int, cfg: AgentConfig,
                 dtype=jnp.float32) -> PSDQNLearner:
    params = qnets.ps_dqn_init(key, state_dim, action_dim, cfg, dtype)
    return PSDQNLearner(
        params=params,
        target_params=jax.tree.map(jnp.copy, params),
        opt_state=make_optimizer(cfg).init(params),
    )


def infer_actions(learner: PSDQNLearner, obs, key, eps, cfg: AgentConfig):
    """Batched eps-greedy (ps_dqn.py:200-235). obs [B, D] -> [B] int32."""
    q = qnets.ps_dqn_apply(learner.params, obs, cfg)
    n, a = q.shape
    kd, kr = jax.random.split(key)
    rand = jax.random.randint(kr, (n,), 0, a)
    cond = jax.random.uniform(kd, (n,)) < eps
    return jnp.where(cond, rand, jnp.argmax(q, axis=1)).astype(jnp.int32)


def add_episode(replay: TransitionReplay, states, actions, rewards,
                terminated: bool | jax.Array):
    """Ingest one agent-episode stream with the reference mask/terminal
    convention (ps_dqn.py:275-289): terminal flags all-zero except the last
    step when the episode terminated; the last step's mask is zeroed when it
    did not (its successor in the flat ring is unrelated)."""
    m = states.shape[0]
    mask = jnp.ones((m,), replay.masks.dtype)
    term = jnp.zeros((m,), bool)
    terminated = jnp.asarray(terminated, bool)
    term = term.at[m - 1].set(terminated)
    mask = mask.at[m - 1].set(jnp.where(terminated, 1.0, 0.0))
    return replay.put(states, actions, rewards, term, mask)


def add_episodes_batch(replay: TransitionReplay, states, actions, rewards,
                       terminated):
    """Batched episode ingest: one ``put`` for A agent-episodes of L steps
    each (states [A, L, D], actions/rewards [A, L], terminated [A] bool).

    Transition order is agent-major -- agent 0's whole episode, then agent
    1's, ... -- exactly the reference's sequential per-agent
    ``_add_to_replay_buffer`` loop (ps_dqn.py:258-294), with the same
    mask/terminal convention per block: terminals all-zero except a
    terminated episode's last step, and the last step's mask zeroed when
    the episode did NOT terminate (its ring successor is another agent's
    first step).  Bit-equal to A sequential ``add_episode`` calls
    (tests/test_ps_variants.py)."""
    A, L = actions.shape
    flat_s = jnp.reshape(states, (A * L, -1))
    flat_a = jnp.reshape(actions, (A * L,))
    flat_r = jnp.reshape(rewards, (A * L,))
    last = jnp.arange(A * L) % L == L - 1            # each block's last step
    term_row = jnp.repeat(jnp.asarray(terminated, bool), L)
    term = last & term_row
    mask = jnp.where(last & ~term_row, 0.0, 1.0).astype(replay.masks.dtype)
    return replay.put(flat_s, flat_a, flat_r, term, mask)


def td_targets(learner: PSDQNLearner, batch, cfg: AgentConfig):
    """Double-DQN with terminal cut (ps_dqn.py:237-256)."""
    tq = qnets.ps_dqn_apply(learner.target_params, batch["next_states"], cfg)
    if cfg.network.use_double:
        oq = qnets.ps_dqn_apply(learner.params, batch["next_states"], cfg)
        next_v = jnp.take_along_axis(tq, jnp.argmax(oq, axis=1)[:, None], 1)[:, 0]
    else:
        next_v = tq.max(axis=1)
    r = batch["rewards"]
    return jnp.where(batch["terminals"], r, r + cfg.gamma * next_v)


def loss_fn(params, batch, targets, cfg: AgentConfig):
    q = qnets.ps_dqn_apply(params, batch["states"], cfg)
    chosen = jnp.take_along_axis(q, batch["actions"][:, None], 1)[:, 0]
    td = jnp.square(targets - chosen)
    m = batch["masks"]
    return jnp.sum(td * m) / jnp.maximum(jnp.sum(m), 1.0)


@partial(jax.jit, static_argnames=("cfg", "n_batches"))
def train(learner: PSDQNLearner, replay: TransitionReplay, key,
          cfg: AgentConfig, n_batches: int):
    """n_batches gradient steps; target syncs at ct % target_update == 0
    including ct = 0 (ps_dqn.py:347-349)."""
    opt = make_optimizer(cfg)

    def step(carry, k):
        learner, ct = carry
        batch = replay.sample(k, cfg.batch_size)
        targets = jax.lax.stop_gradient(td_targets(learner, batch, cfg))
        loss, grads = jax.value_and_grad(loss_fn)(
            learner.params, batch, targets, cfg
        )
        updates, opt_state = opt.update(grads, learner.opt_state)
        learner = learner.replace(
            params=optax.apply_updates(learner.params, updates),
            opt_state=opt_state,
        )
        # sync AFTER the gradient step, per the reference loop order
        # (ps_dqn.py:338-349)
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
