"""On-policy PPO training loop: batched episode rollout -> GAE -> update,
entirely on device.

Structure: an outer ``lax.scan`` over episodes; each episode is an inner
scan of ``episode_interval`` env slots collecting (state, action, reward)
for every agent of every env, then one PPO update on the flattened
[slots * envs * agents] batch.  The LSTM variant evaluates each slot's
policy/value on the trailing ``step_size`` history window, like the
reference feeds [batch, step, state] sequences (ps_ppo.py:31-44,118-128).

CTDE as everywhere else: one shared actor-critic, agents batched."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diral_tpu.config import ExperimentConfig
from diral_tpu.agents import ppo
from diral_tpu.envs import v2v_env as E
from diral_tpu.models import actor_critic as ac


def make_ppo_functions(cfg: ExperimentConfig, dtype=jnp.float32,
                       adv_mode: str = "gae", lam: float = 0.95):
    env_cfg, acfg = cfg.env, cfg.agent
    B = cfg.engine.num_envs
    N, C, D = env_cfg.num_users, env_cfg.num_channels, env_cfg.state_space
    T = acfg.step_size
    L = cfg.episode_interval
    use_lstm = acfg.network.use_lstm_input
    step_env = E.step_channel if cfg.enable_channel else E.step_collision

    v_reset = jax.vmap(lambda k: E.reset(env_cfg, k, dtype))
    v_step = jax.vmap(lambda s, a, t: step_env(env_cfg, s, a, t),
                      in_axes=(0, 0, None))
    v_obtain = jax.vmap(lambda s, o, a, r: E.obtain_state(env_cfg, s, o, a, r))

    def policy_input(history):
        """history [B, T, N, D] -> model input (windows or last state)."""
        if use_lstm:
            return jnp.transpose(history, (0, 2, 1, 3)).reshape(B * N, T, D)
        return history[:, -1].reshape(B * N, D)

    def init_state(key):
        k_env, k_act = jax.random.split(key)
        env_state = v_reset(jax.random.split(k_env, B))
        a0 = jax.vmap(lambda k: E.sample_actions(env_cfg, k))(
            jax.random.split(k_act, B)
        )
        env_state, obs, rew = v_step(env_state, a0, 0)
        s0 = v_obtain(env_state, obs, a0, rew)
        history = jnp.zeros((B, T, N, D), dtype).at[:, -1].set(s0)
        return env_state, history

    def episode(carry, ep_key_idx):
        env_state, history, learner = carry
        ep, key = ep_key_idx

        def slot(c, i):
            env_state, history, k = c
            k, ka = jax.random.split(k)
            t = ep * L + i
            x = policy_input(history)
            actions = ppo.choose_actions(learner, x, ka, acfg).reshape(B, N)
            env_state, obs, rew = v_step(env_state, actions, t)
            sv = v_obtain(env_state, obs, actions, rew)
            history = jnp.roll(history, -1, axis=1).at[:, -1].set(sv)
            out = {"x": x, "actions": actions.reshape(-1), "rew": rew.reshape(-1),
                   "sum_r": rew.sum()}
            return (env_state, history, k), out

        (env_state, history, _), traj = jax.lax.scan(
            slot, (env_state, history, key), jnp.arange(L)
        )

        # values per slot [L, B*N]; bootstrap from the post-episode state
        vals = jax.vmap(lambda x: ppo.values(learner, x, acfg))(traj["x"])
        last_v = ppo.values(learner, policy_input(history), acfg)
        if adv_mode == "gae":
            advs, rets = ppo.gae(traj["rew"], vals, last_v, acfg.gamma, lam)
        else:
            rets = ppo.discounted_returns(traj["rew"], last_v, acfg.gamma)
            advs = rets - vals

        batch = {
            "states": traj["x"].reshape((L * B * N,) + traj["x"].shape[2:]),
            "actions": traj["actions"].reshape(-1),
            "advantages": advs.reshape(-1),
            "returns": rets.reshape(-1),
        }
        learner, metrics = ppo.update(learner, batch, acfg)
        logs = {"mean_sum_reward": traj["sum_r"].mean() / B, **metrics}
        return (env_state, history, learner), logs

    @partial(jax.jit, static_argnames=("num_episodes",))
    def run(key, num_episodes: int):
        k_init, k_learn, k_eps = jax.random.split(key, 3)
        env_state, history = init_state(k_init)
        learner = ppo.init_learner(k_learn, D, C, acfg, dtype)
        (env_state, history, learner), logs = jax.lax.scan(
            episode, (env_state, history, learner),
            (jnp.arange(num_episodes), jax.random.split(k_eps, num_episodes)),
        )
        return learner, logs

    return run


def run_ppo(cfg: ExperimentConfig, seed: int = 0, num_episodes: int | None = None,
            dtype=jnp.float32, **kw):
    run = make_ppo_functions(cfg, dtype, **kw)
    n = num_episodes or cfg.time_slots // cfg.episode_interval
    return run(jax.random.PRNGKey(seed), n)
