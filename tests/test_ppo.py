"""PPO learner tests: GAE math, clipped-surrogate behavior, end-to-end
learning on the 2-user/2-channel coordination task."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.agents import ppo
from diral_tpu.train.ppo_loop import run_ppo


def test_gae_matches_manual():
    gamma, lam = 0.9, 0.8
    rng = np.random.RandomState(0)
    T = 7
    rewards = rng.randn(T).astype(np.float32)
    vals = rng.randn(T).astype(np.float32)
    last_v = np.float32(rng.randn())
    advs, rets = ppo.gae(jnp.asarray(rewards), jnp.asarray(vals),
                         jnp.asarray(last_v), gamma, lam)
    nxt = np.append(vals[1:], last_v)
    deltas = rewards + gamma * nxt - vals
    manual = np.zeros(T, np.float32)
    acc = 0.0
    for t in reversed(range(T)):
        acc = deltas[t] + gamma * lam * acc
        manual[t] = acc
    np.testing.assert_allclose(np.asarray(advs), manual, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rets), manual + vals, rtol=1e-5)


def test_discounted_returns():
    rets = ppo.discounted_returns(jnp.asarray([1.0, 0.0, 2.0]),
                                  jnp.asarray(10.0), 0.5)
    np.testing.assert_allclose(np.asarray(rets), [1 + 0.5 * (0 + 0.5 * (2 + 5)),
                                                  0.5 * (2 + 5), 2 + 5])


def test_ratio_clipping_limits_update():
    """With a huge advantage, the clipped objective's gradient must vanish
    once the ratio passes 1 + eps_clip (ps_ppo.py:75-77)."""
    cfg = dataclasses.replace(
        toy_4ue_3r().agent,
        network=dataclasses.replace(toy_4ue_3r().agent.network,
                                    use_lstm_input=False, layers=(16,)),
    )
    learner = ppo.init_learner(jax.random.PRNGKey(0), 5, 3, cfg)
    batch = {
        "states": jnp.ones((8, 5)),
        "actions": jnp.zeros(8, jnp.int32),
        "advantages": jnp.full((8,), 100.0),
        "returns": jnp.zeros(8),
    }
    prev = learner
    for _ in range(10):
        prev, _ = ppo.update(prev, batch, cfg)
    # policy should saturate, not diverge: probabilities remain finite
    from diral_tpu.models import actor_critic as ac
    logits = ac.ppo_policy_logits(prev.params, batch["states"], cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_ppo_learns_coordination():
    base = toy_4ue_3r(save_positions=False)
    env = dataclasses.replace(base.env, num_users=2, num_channels=2)
    agent = dataclasses.replace(
        base.agent, update_step=4, eps_clip=0.2, gamma=0.9, step_size=4,
        network=dataclasses.replace(base.agent.network, use_lstm_input=False,
                                    layers=(32, 32)),
    )
    agent = dataclasses.replace(agent, update_step=6)
    cfg = dataclasses.replace(
        base, env=env, agent=agent,
        engine=dataclasses.replace(base.engine, num_envs=8),
    )
    learner, logs = run_ppo(cfg, seed=0, num_episodes=300)
    sr = np.asarray(logs["mean_sum_reward"])
    early, late = sr[:50].mean(), sr[-50:].mean()
    assert np.isfinite(sr).all()
    assert late > early + 0.2, f"PPO no learning: early={early:.2f} late={late:.2f}"
    assert late > 1.2, f"PPO late reward too low: {late:.2f} (optimal 2.0)"
