"""Evaluation harness: PRR / collision metrics and the DIRAL-vs-SPS
comparison (the reference's headline result is +20% PRR over SPS in the
congested scenario, README.md:5; reproduced here as a harness over the toy
world with the free-space sensing proxy).

Metrics:

* ``prr_per_user`` -- the my_step_ch PRR definition (test_env.py:384-404):
  fraction of in-range, non-co-channel-transmitting receivers whose nearest
  in-range transmitter on your channel is you; 1.0 when no receiver is in
  range.
* reference-style collision count: num_channels - sum_reward
  (main_test.py:178), plus a direct count of colliding users.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diral_tpu.config import ExperimentConfig, EnvConfig
from diral_tpu.agents import policies as pol
from diral_tpu.agents.sps import sps_init, sps_step, toy_rssi
from diral_tpu.envs import v2v_env as E
from diral_tpu.models import qnets
from diral_tpu.ops.distance import pairwise_distances


def prr_per_user(cfg: EnvConfig, state: E.EnvState, actions):
    """[N] packet-reception ratio for each transmitter this slot.

    Receiver r decodes transmitter u iff u is the nearest in-range
    transmitter on u's channel (test_env.py:398-399); u's audience is every
    in-range vehicle not transmitting on u's channel (test_env.py:392-397)."""
    n = cfg.num_users
    R = cfg.communication_range
    D = pairwise_distances(state.pos_x, state.pos_y)
    eye = jnp.eye(n, dtype=bool)
    same_ch = actions[:, None] == actions[None, :]            # [tx, rx]
    audience = ~eye & ~same_ch & (D < R)
    in_range = audience.sum(axis=1).astype(D.dtype)

    dist_tr = jnp.where(~eye & (D < R), D, jnp.inf)           # [tx, rx]
    received = jnp.zeros((n,), D.dtype)
    for c in range(cfg.num_channels):
        m = jnp.where((actions == c)[:, None], dist_tr, jnp.inf)  # [tx, rx]
        near_tx = jnp.argmin(m, axis=0)                           # [rx]
        has = jnp.isfinite(m.min(axis=0))
        credit = (near_tx[None, :] == jnp.arange(n)[:, None]) & has[None, :]
        received = received + (
            credit & audience & (actions == c)[:, None]
        ).sum(axis=1)
    return jnp.where(in_range > 0, received / jnp.maximum(in_range, 1), 1.0)


def _rollout_metrics(cfg: ExperimentConfig, act_fn, carry_init, steps: int):
    """Generic greedy-rollout metric collector over one env instance batch.

    act_fn(actor_carry, env_state, history, key, t) -> (actions [B, N],
    actor_carry'); the RNG key travels inside carry_init."""
    env_cfg = cfg.env
    B = cfg.engine.num_envs
    N, D = env_cfg.num_users, env_cfg.state_space
    T = cfg.agent.step_size
    step_env = E.step_channel if cfg.enable_channel else E.step_collision
    v_step = jax.vmap(lambda s, a, t: step_env(env_cfg, s, a, t),
                      in_axes=(0, 0, None))
    v_obtain = jax.vmap(
        lambda s, o, a, r: E.obtain_state(env_cfg, s, o, a, r),
    )
    v_prr = jax.vmap(lambda s, a: prr_per_user(env_cfg, s, a))

    def body(carry, t):
        env_state, history, actor, k = carry
        k, ka = jax.random.split(k)
        actions, actor = act_fn(actor, env_state, history, ka, t)
        prr = v_prr(env_state, actions)  # PRR vs current positions
        env_state, obs, rew = v_step(env_state, actions, t)
        sv = v_obtain(env_state, obs, actions, rew)
        history = jnp.roll(history, -1, axis=1).at[:, -1].set(sv)
        sum_r = rew.sum(axis=1)
        logs = {
            "prr": prr.mean(),
            "sum_reward": sum_r.mean(),
            "collisions_ref": (env_cfg.num_channels - sum_r).mean(),
            "colliding_users": jax.vmap(
                lambda a: (jnp.bincount(a, length=env_cfg.num_channels) > 1)[a].sum()
            )(actions).mean(),
        }
        return (env_state, history, actor, k), logs

    (env_state, *_), logs = jax.lax.scan(body, carry_init, jnp.arange(steps))
    return {
        "mean_prr": logs["prr"].mean(),
        "mean_sum_reward": logs["sum_reward"].mean(),
        "mean_collisions_ref": logs["collisions_ref"].mean(),
        "mean_colliding_users": logs["colliding_users"].mean(),
    }


def evaluate_drqn(cfg: ExperimentConfig, learner, key, steps: int = 500,
                  dtype=jnp.float32):
    """Greedy rollout of a trained DRQN (load_model+greedy eval mode,
    main_test.py:62-65,129-136)."""
    env_cfg, acfg = cfg.env, cfg.agent
    B, N, D, T = cfg.engine.num_envs, env_cfg.num_users, env_cfg.state_space, acfg.step_size
    k_env, k_run = jax.random.split(key)
    env_state = jax.vmap(lambda k: E.reset(env_cfg, k, dtype))(
        jax.random.split(k_env, B)
    )
    history = jnp.zeros((B, T, N, D), dtype)

    def act(actor, env_state, history, k, t):
        x = jnp.transpose(history, (0, 2, 1, 3)).reshape(B * N, T, D)
        q = qnets.drqn_apply(learner.params, x, acfg).reshape(B, N, -1)
        return pol.greedy_action(q.reshape(B, N, -1)), actor

    run = jax.jit(partial(_rollout_metrics, cfg, act), static_argnums=(1,))
    return jax.tree.map(float, run((env_state, history, (), k_run), steps))


def evaluate_ppo(cfg: ExperimentConfig, learner, key, steps: int = 500,
                 dtype=jnp.float32):
    """Greedy (argmax-logit) rollout of a trained PS-PPO actor -- the PPO
    analog of ``evaluate_drqn``, holding the PPO slice to the reference's
    PRR-vs-SPS claim frame (README.md:5).  The stochastic policy is
    evaluated at its mode, matching the DRQN comparisons' greedy band
    (main_test.py:129-136)."""
    from diral_tpu.models import actor_critic as ac

    env_cfg, acfg = cfg.env, cfg.agent
    B, N, D, T = (cfg.engine.num_envs, env_cfg.num_users,
                  env_cfg.state_space, acfg.step_size)
    use_lstm = acfg.network.use_lstm_input
    k_env, k_run = jax.random.split(key)
    env_state = jax.vmap(lambda k: E.reset(env_cfg, k, dtype))(
        jax.random.split(k_env, B)
    )
    history = jnp.zeros((B, T, N, D), dtype)

    def act(actor, env_state, history, k, t):
        if use_lstm:
            x = jnp.transpose(history, (0, 2, 1, 3)).reshape(B * N, T, D)
        else:
            x = history[:, -1].reshape(B * N, D)
        logits = ac.ppo_policy_logits(learner.params, x, acfg)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(B, N), actor

    run = jax.jit(partial(_rollout_metrics, cfg, act), static_argnums=(1,))
    return jax.tree.map(float, run((env_state, history, (), k_run), steps))


def evaluate_ps(cfg: ExperimentConfig, learner, key, steps: int = 500,
                algo: str = "ps-dqn", dtype=jnp.float32):
    """Greedy rollout of a trained PS-DQN / PS-DRQN learner.  PS agents act
    on the CURRENT state (ps_dqn.py:200-235 feeds one observation, not a
    window); PS-DRQN carries the per-agent GRU hidden across slots
    (ps_drqn.py:195-231) -- the hidden rides the actor carry here, starting
    from zeros like a fresh serving session."""
    from diral_tpu.agents import ps_drqn as ps_drqn_mod

    env_cfg, acfg = cfg.env, cfg.agent
    B, N, D, T = (cfg.engine.num_envs, env_cfg.num_users,
                  env_cfg.state_space, acfg.step_size)
    recurrent = algo.lower().replace("_", "-") == "ps-drqn"
    k_env, k_run = jax.random.split(key)
    env_state = jax.vmap(lambda k: E.reset(env_cfg, k, dtype))(
        jax.random.split(k_env, B)
    )
    history = jnp.zeros((B, T, N, D), dtype)

    def act(actor, env_state, history, k, t):
        obs = history[:, -1].reshape(B * N, D)
        if recurrent:
            q, hidden = qnets.ps_drqn_apply_step(learner.params, obs, actor,
                                                 acfg)
            return jnp.argmax(q, axis=1).astype(jnp.int32).reshape(B, N), hidden
        q = qnets.ps_dqn_apply(learner.params, obs, acfg)
        return jnp.argmax(q, axis=1).astype(jnp.int32).reshape(B, N), actor

    actor0 = (ps_drqn_mod.init_hidden(acfg, B * N, dtype) if recurrent
              else ())
    run = jax.jit(partial(_rollout_metrics, cfg, act), static_argnums=(1,))
    return jax.tree.map(float, run((env_state, history, actor0, k_run), steps))


def evaluate_sps(cfg: ExperimentConfig, key, steps: int = 500,
                 rssi_threshold: float = -110.0, dtype=jnp.float32):
    """SPS baseline rollout on the same env family, sensing last slot's
    transmissions through the free-space proxy."""
    env_cfg = cfg.env
    B, N, C = cfg.engine.num_envs, env_cfg.num_users, env_cfg.num_channels
    T, D = cfg.agent.step_size, env_cfg.state_space
    k_env, k_sps, k_run = jax.random.split(key, 3)
    env_state = jax.vmap(lambda k: E.reset(env_cfg, k, dtype))(
        jax.random.split(k_env, B)
    )
    history = jnp.zeros((B, T, N, D), dtype)
    sps0 = jax.vmap(lambda k: sps_init(k, N, C))(jax.random.split(k_sps, B))
    last_actions = sps0.prev_action

    def act(actor, env_state, history, k, t):
        sps_state, last = actor
        rssi = jax.vmap(lambda s, la: toy_rssi(env_cfg, s.pos_x, s.pos_y, la))(
            env_state, last
        )
        actions, sps_state = jax.vmap(
            lambda kk, st, r: sps_step(kk, st, r, rssi_threshold)
        )(jax.random.split(k, B), sps_state, rssi)
        return actions, (sps_state, actions)

    run = jax.jit(partial(_rollout_metrics, cfg, act), static_argnums=(1,))
    return jax.tree.map(
        float, run((env_state, history, (sps0, last_actions), k_run), steps)
    )


def compare_drqn_vs_sps(cfg: ExperimentConfig, learner, key, steps: int = 500):
    """The paper's comparison: PRR of the trained policy vs the SPS baseline
    on the same scenario family."""
    k1, k2 = jax.random.split(key)
    drqn_m = evaluate_drqn(cfg, learner, k1, steps)
    sps_m = evaluate_sps(cfg, k2, steps)
    return {
        "drqn": drqn_m,
        "sps": sps_m,
        "prr_improvement": drqn_m["mean_prr"] / max(sps_m["mean_prr"], 1e-9) - 1.0,
    }


def compare_ppo_vs_sps(cfg: ExperimentConfig, learner, key, steps: int = 500):
    """PRR-vs-SPS for the trained PPO actor (the same claim frame as
    ``compare_drqn_vs_sps``; the reference README.md:5 scopes its +20%
    claim as 'DIRAL beats SPS', so every trained flavor is held to it)."""
    k1, k2 = jax.random.split(key)
    ppo_m = evaluate_ppo(cfg, learner, k1, steps)
    sps_m = evaluate_sps(cfg, k2, steps)
    return {
        "ppo": ppo_m,
        "sps": sps_m,
        "prr_improvement": ppo_m["mean_prr"] / max(sps_m["mean_prr"], 1e-9) - 1.0,
    }


def compare_ps_vs_sps(cfg: ExperimentConfig, learner, key, steps: int = 500,
                      algo: str = "ps-dqn"):
    """PRR-vs-SPS for a trained PS-DQN / PS-DRQN learner."""
    k1, k2 = jax.random.split(key)
    ps_m = evaluate_ps(cfg, learner, k1, steps, algo=algo)
    sps_m = evaluate_sps(cfg, k2, steps)
    return {
        algo.replace("-", "_"): ps_m,
        "sps": sps_m,
        "prr_improvement": ps_m["mean_prr"] / max(sps_m["mean_prr"], 1e-9) - 1.0,
    }
