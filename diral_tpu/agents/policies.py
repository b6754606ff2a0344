"""Exploration policies as pure functions over (Q-values, key, schedule state).

Rebuilds the reference policy ladder (reference algorithms/policies.py:
Random/Greedy/EpsilonGreedy/Softmax/Boltzman, near-duplicate
utils/policies.py) without objects: schedule state is a small pytree carried
through the training scan, action selection is one vectorized draw for all
agents (the reference loops users and draws from the global NumPy RNG;
statistically equivalent, RNG streams differ by design).

The driver's slot-indexed mode switch (main_test.py:127-136: uniform-random
before ``explore`` slots, learned policy until ``greedy`` slots, pure greedy
after) lives here as ``driver_mode_actions``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

EPS_FLOOR = 0.001  # policies.py:62-63


class EpsGreedyState(struct.PyTreeNode):
    """Carried epsilon schedule: decays once per episode change
    (policies.py:45-63)."""

    eps: jax.Array       # scalar float
    episode: jax.Array   # scalar int32: last episode the decay fired for


def eps_greedy_init(eps_init: float) -> EpsGreedyState:
    return EpsGreedyState(
        eps=jnp.asarray(eps_init, jnp.float32), episode=jnp.zeros((), jnp.int32)
    )


def eps_greedy_update(state: EpsGreedyState, episode, eps_decay: float,
                      eps_min: float = EPS_FLOOR) -> EpsGreedyState:
    """Multiply-decay with floor, fired when the episode counter advances
    (the reference fires on the first per-user action call of a new episode;
    here once per slot before acting -- same cadence).  eps_min defaults to
    the reference's hardcoded 0.001 (policies.py:62-63); the config's
    ``eps_min`` is threaded through by the training loop."""
    fire = episode > state.episode
    eps = jnp.where(fire, jnp.maximum(state.eps * eps_decay, eps_min), state.eps)
    ep = jnp.where(fire, episode, state.episode)
    return state.replace(eps=eps, episode=ep)


def eps_greedy_action(key, qvalues, eps):
    """Per-agent independent draw: greedy iff U(0,1) > eps (policies.py:45-54).
    qvalues: [N, A] -> actions [N] int32."""
    n, a = qvalues.shape
    kd, kr = jax.random.split(key)
    draw = jax.random.uniform(kd, (n,))
    rand_actions = jax.random.randint(kr, (n,), 0, a)
    greedy = jnp.argmax(qvalues, axis=-1).astype(jnp.int32)
    return jnp.where(draw > eps, greedy, rand_actions)


def greedy_action(qvalues):
    """First-index argmax, matching np.argmax tie-breaking (policies.py:24-31)."""
    return jnp.argmax(qvalues, axis=-1).astype(jnp.int32)


def random_action(key, n: int, num_actions: int):
    return jax.random.randint(key, (n,), 0, num_actions)


# ---------------------------------------------------------------------------
# Softmax (temperature-annealed) policy
# ---------------------------------------------------------------------------


def softmax_temperature_schedule(temperature: float, episodes: int) -> np.ndarray:
    """Geometric anneal 1.0 -> temperature over the first 2/3 of episodes,
    then constant (policies.py:86-90)."""
    warm = int(episodes * 2.0 / 3)
    return np.concatenate(
        [np.geomspace(1.0, temperature, warm), np.repeat(temperature, episodes - warm)]
    ).astype(np.float32)


def softmax_action(key, qvalues, schedule, episode, temperature: float):
    """Sample from softmax(Q / T[episode]); out-of-schedule episodes fall
    back to the base temperature (policies.py:92-101 try/except)."""
    e = schedule.shape[0]
    t = jnp.where(
        episode < e, schedule[jnp.clip(episode, 0, e - 1)], temperature
    ).astype(qvalues.dtype)
    n = qvalues.shape[0]
    return jax.random.categorical(key, qvalues / t, axis=-1).astype(jnp.int32), t


# ---------------------------------------------------------------------------
# Boltzmann policy
# ---------------------------------------------------------------------------


class BoltzmanState(struct.PyTreeNode):
    """Carried beta annealed every 50 slots below slot 5000 (policies.py:153-156)."""

    beta: jax.Array


def boltzman_init(beta: float) -> BoltzmanState:
    return BoltzmanState(beta=jnp.asarray(beta, jnp.float32))


def boltzman_update(state: BoltzmanState, time_slot) -> BoltzmanState:
    fire = (time_slot % 50 == 0) & (time_slot < 5000)
    return state.replace(beta=jnp.where(fire, state.beta - 0.001, state.beta))


def boltzman_action(key, qvalues, state: BoltzmanState, time_slot, *,
                    explore_start: float, explore_stop: float,
                    decay_rate: float, alpha: float):
    """Exponentially-decaying exploration probability, otherwise argmax of
    the alpha-mixed Boltzmann distribution (policies.py:144-178)."""
    n, a = qvalues.shape
    explore_p = explore_stop + (explore_start - explore_stop) * jnp.exp(
        -decay_rate * time_slot
    )
    kd, kr = jax.random.split(key)
    explode = jax.random.uniform(kd, (n,)) < explore_p
    rand_actions = jax.random.randint(kr, (n,), 0, a)
    eb = jnp.exp(state.beta * qvalues)
    prob = (1.0 - alpha) * eb / jnp.sum(eb, axis=-1, keepdims=True) + alpha / a
    exploit = jnp.argmax(prob, axis=-1).astype(jnp.int32)
    return jnp.where(explode, rand_actions, exploit)


# ---------------------------------------------------------------------------
# Driver-mode composition
# ---------------------------------------------------------------------------


def driver_mode_actions(key, qvalues, eps_state: EpsGreedyState, time_slot,
                        explore_until: int, greedy_after: int):
    """The main-loop mode switch (main_test.py:127-136): uniform random while
    t < explore_until, eps-greedy while t < greedy_after, greedy after."""
    n, a = qvalues.shape
    ke, kp = jax.random.split(key)
    rand = random_action(ke, n, a)
    pol = eps_greedy_action(kp, qvalues, eps_state.eps)
    greedy = greedy_action(qvalues)
    return jnp.where(
        time_slot < explore_until, rand,
        jnp.where(time_slot < greedy_after, pol, greedy),
    )
