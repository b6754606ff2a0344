"""Parameter-shared Double-DQN / DRQN learner -- the algorithm the reference
driver actually trains (reference algorithms/drl_drqn.py ``DRQN``).

One learner instance serves all agents (parameter sharing / CTDE): acting is
a single batched forward over the agent axis (the reference's serial
per-user ``sess.run`` loop, main_test.py:127-136 + drl_drqn.py:157-182,
collapses to one matmul batch), and a train call repacks window samples
user-major exactly as the reference's quad-nested Python loops do
(drl_drqn.py:294-377: [batch, step, slot] -> [users*batch, step, ...]).

Semantics preserved:
* Double-DQN target: online-net argmax on next states, target-net gather
  (drl_drqn.py:267-292); target = last-step window reward + gamma * next_v.
* Optional hysteretic TD scaling: negative TD errors / 10 (drl_drqn.py:76-80).
* Target sync every ``target_update`` *slots*, evaluated at train time
  (drl_drqn.py:263-265).
* ``n_batch`` gradient steps per train call (drl_drqn.py:207-208).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diral_tpu.config import AgentConfig
from diral_tpu.models import qnets


class DRQNLearner(struct.PyTreeNode):
    """Carried learner state (a pytree; lives inside the training scan)."""

    params: dict
    target_params: dict
    opt_state: optax.OptState


def make_optimizer(cfg: AgentConfig):
    return optax.adam(cfg.learning_rate)


def init_learner(key, state_dim: int, action_dim: int, cfg: AgentConfig,
                 dtype=jnp.float32, scheme="glorot") -> DRQNLearner:
    params = qnets.drqn_init(key, state_dim, action_dim, cfg, dtype, scheme)
    target = jax.tree.map(jnp.copy, params)
    opt_state = make_optimizer(cfg).init(params)
    return DRQNLearner(params=params, target_params=target, opt_state=opt_state)


def qvalues_all_agents(learner: DRQNLearner, history, cfg: AgentConfig):
    """Q for every agent in one forward pass.

    history: [T, N, D] (the driver's history deque, main_test.py:125) for the
    LSTM path, or [N, D] for the MLP path.  Returns [N, A]."""
    if cfg.network.use_lstm_input:
        x = jnp.swapaxes(history, 0, 1)  # [N, T, D]
    else:
        x = history
    return qnets.drqn_apply(learner.params, x, cfg)


def repack_user_major(batch, num_users: int, use_lstm: bool):
    """Reference batch repack (drl_drqn.py:218-243 + 294-377).

    batch: dict of [B, T, N, D] / [B, T, N] arrays ->
      states [N*B, T, D], actions [N*B, T], rewards [N*B, T],
      next_states [N*B, T, D]   (user-major flattening).
    For the MLP path (T==1) the window axis is squeezed
    (drl_drqn.py:239-243)."""
    def pack(x):
        # [B, T, N, ...] -> [N, B, T, ...] -> [N*B, T, ...]
        perm = (2, 0, 1) + tuple(range(3, x.ndim))
        y = jnp.transpose(x, perm)
        return y.reshape((num_users * x.shape[0],) + y.shape[2:])

    states = pack(batch["states"])
    actions = pack(batch["actions"])
    rewards = pack(batch["rewards"])
    next_states = pack(batch["next_states"])
    if not use_lstm:
        states = states[:, -1]
        next_states = next_states[:, -1]
        actions = actions[:, -1]
        rewards = rewards[:, -1]
    return states, actions, rewards, next_states


def td_targets(learner: DRQNLearner, rewards, next_states, cfg: AgentConfig):
    """Double-DQN (or max) targets (drl_drqn.py:267-292).  The online and
    target forwards on next_states share one dual-net pass
    (qnets.drqn_apply_dual -- a single fused kernel on the Pallas path)."""
    if cfg.network.use_double:
        oq, tq = qnets.drqn_apply_dual(learner.params, learner.target_params,
                                       next_states, cfg)
        act = jnp.argmax(oq, axis=1)
        next_v = jnp.take_along_axis(tq, act[:, None], axis=1)[:, 0]
    else:
        tq = qnets.drqn_apply(learner.target_params, next_states, cfg)
        next_v = jnp.max(tq, axis=1)
    last_r = rewards[:, -1] if rewards.ndim == 2 else rewards
    return last_r + cfg.gamma * next_v


def loss_fn(params, states, actions, targets, cfg: AgentConfig):
    """Squared TD error with optional hysteretic scaling (drl_drqn.py:76-80)."""
    q = qnets.drqn_apply(params, states, cfg)
    acts = actions[:, -1] if actions.ndim == 2 else actions
    chosen = jnp.take_along_axis(q, acts[:, None].astype(jnp.int32), axis=1)[:, 0]
    h = chosen - targets
    if cfg.hysteretic:
        h = jnp.where(h < 0, h / 10.0, h)
    return jnp.mean(jnp.square(h))


def train_on_packed(learner: DRQNLearner, states, actions, rewards,
                    next_states, cfg: AgentConfig):
    """One gradient step on an already-repacked row batch.  ``states`` /
    ``next_states`` may be [NB, T, D] or the flat padded [NB, T*Dp]
    window layout (ops/pallas_lstm.flatten_window) -- the production
    sampler emits flat rows (loop.py sample_window_rows_many)."""
    targets = jax.lax.stop_gradient(td_targets(learner, rewards, next_states, cfg))
    loss, grads = jax.value_and_grad(loss_fn)(
        learner.params, states, actions, targets, cfg
    )
    updates, opt_state = make_optimizer(cfg).update(grads, learner.opt_state)
    params = optax.apply_updates(learner.params, updates)
    return learner.replace(params=params, opt_state=opt_state), loss


def train_on_windows(learner: DRQNLearner, windows, actions, rewards,
                     cfg: AgentConfig):
    """One gradient step on COMBINED flat (T+1)-step window rows
    [NB, (T+1)*Dp] (loop.py ``sample_window_rows_many(windows_only=True)``)
    -- the fused production path: the loss forward and both Double-DQN
    target forwards run as ONE triple pass sharing a single read of the
    window (qnets.drqn_apply_triple), instead of materializing separate
    states/next_states arrays and launching two kernels.  Semantics are
    identical to ``train_on_packed`` on the sliced arrays: same math, same
    stop_gradient boundary (drl_drqn.py:199-265 + 267-292); asserted
    equal in tests/test_learner.py."""
    acts = (actions[:, -1] if actions.ndim == 2 else actions).astype(jnp.int32)
    last_r = rewards[:, -1] if rewards.ndim == 2 else rewards

    def fused_loss(params):
        q_s, q_na, q_nb = qnets.drqn_apply_triple(
            params, learner.target_params, windows, cfg)
        if cfg.network.use_double:
            act = jnp.argmax(q_na, axis=1)
            next_v = jnp.take_along_axis(q_nb, act[:, None], axis=1)[:, 0]
        else:
            next_v = jnp.max(q_nb, axis=1)
        targets = jax.lax.stop_gradient(last_r + cfg.gamma * next_v)
        chosen = jnp.take_along_axis(q_s, acts[:, None], axis=1)[:, 0]
        h = chosen - targets
        if cfg.hysteretic:
            h = jnp.where(h < 0, h / 10.0, h)
        return jnp.mean(jnp.square(h))

    loss, grads = jax.value_and_grad(fused_loss)(learner.params)
    updates, opt_state = make_optimizer(cfg).update(grads, learner.opt_state)
    params = optax.apply_updates(learner.params, updates)
    return learner.replace(params=params, opt_state=opt_state), loss


@partial(jax.jit, static_argnames=("cfg", "num_users"))
def train_on_batch(learner: DRQNLearner, batch, cfg: AgentConfig, num_users: int):
    """One gradient step on one sampled window batch. Returns (learner, loss)."""
    states, actions, rewards, next_states = repack_user_major(
        batch, num_users, cfg.network.use_lstm_input
    )
    return train_on_packed(learner, states, actions, rewards, next_states,
                           cfg)


def train(learner: DRQNLearner, replay, key, time_step, cfg: AgentConfig,
          num_users: int, sample_fn=None, sample_rows_fn=None):
    """The reference ``train`` call (drl_drqn.py:199-265): ``n_batch``
    sampled-batch gradient steps, then a target sync when
    (time_step + 1) % target_update == 0.  Pure; usable inside scan.

    ``sample_fn(key) -> batch`` overrides the sampler (the training loop
    passes its cross-env window sampler); default is the single-replay
    window sampler.  ``sample_rows_fn(keys[n]) -> rows dict with leading
    [n]`` (loop.py ``sample_window_rows_many``), when given, draws all
    ``n_batch`` independent batches PRE-REPACKED through ONE fused gather
    up front (the draws don't depend on params, so this is bit-identical
    to per-step sampling with the same key chain -- same key stream, same
    selected windows, same user-major row order as repack_user_major;
    the reference re-samples per step, drl_drqn.py:207-212)."""
    use_lstm = cfg.network.use_lstm_input
    step = cfg.step_size if use_lstm else 1
    if sample_fn is None:
        sample_fn = lambda k: replay.sample_windows(k, cfg.batch_size, step)
    # loss dtype must match train_on_batch's (the params dtype): float64
    # runs feed this through a lax.cond whose branches must agree
    loss = jnp.zeros((), jax.tree_util.tree_leaves(learner.params)[0].dtype)
    # the same key chain either way: one split per gradient step
    keys = []
    for k in range(cfg.n_batch):
        key, kb = jax.random.split(key)
        keys.append(kb)
    if sample_rows_fn is not None:
        rows = sample_rows_fn(jnp.stack(keys))
        for k in range(cfg.n_batch):
            if "windows" in rows:  # fused combined-window path (LSTM only)
                learner, loss = train_on_windows(
                    learner, rows["windows"][k], rows["actions"][k],
                    rows["rewards"][k], cfg)
                continue
            s, ns = rows["states"][k], rows["next_states"][k]
            a, r = rows["actions"][k], rows["rewards"][k]
            if not use_lstm:
                # rows carry one padded flat step; the MLP consumes [NB, D]
                D = learner.params["fc1"]["w"].shape[0]
                s, ns = s[:, :D], ns[:, :D]
                a, r = a[:, -1], r[:, -1]
            learner, loss = train_on_packed(learner, s, a, r, ns, cfg)
    else:
        for kb in keys:
            learner, loss = train_on_batch(learner, sample_fn(kb), cfg,
                                           num_users)
    sync = (time_step + 1) % cfg.target_update == 0
    target = jax.tree.map(
        lambda t, p: jnp.where(sync, p, t), learner.target_params, learner.params
    )
    return learner.replace(target_params=target), loss
