"""Parameter-shared PPO learner (reference algorithms/ps_ppo.py).

Reference semantics preserved:

* clipped surrogate over a frozen old-policy snapshot taken at the start of
  every update (ps_ppo.py:61-77,97);
* combined loss = actor + 0.5 * critic + entropy bonus with the hardcoded
  e_coef = 0.01 (ps_ppo.py:85-90 -- the config-level ``entropy_coef: 0.1``
  is dead there; the knob here defaults to the value the reference actually
  uses) and the hardcoded combined-optimizer lr 3e-4 (ps_ppo.py:90);
* ``update_step`` epochs per update batch (ps_ppo.py:104-108);
* advantage = empirical return - V(s) (ps_ppo.py:56,99) in "returns" mode.

TPU-native addition: generalized advantage estimation on device
(``gae``, a reverse ``lax.scan``) -- the batched on-policy rollout path the
BASELINE north star names; select with ``adv_mode="gae"``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diral_tpu.config import AgentConfig
from diral_tpu.models import actor_critic as ac

PPO_COMBINED_LR = 3e-4   # ps_ppo.py:90
PPO_E_COEF = 0.01        # ps_ppo.py:85


class PPOLearner(struct.PyTreeNode):
    params: dict
    old_params: dict
    opt_state: optax.OptState


def make_optimizer():
    return optax.adam(PPO_COMBINED_LR)


def init_learner(key, state_dim: int, action_dim: int, cfg: AgentConfig,
                 dtype=jnp.float32) -> PPOLearner:
    params = ac.ppo_init(key, state_dim, action_dim, cfg, dtype)
    return PPOLearner(
        params=params,
        old_params=jax.tree.map(jnp.copy, params),
        opt_state=make_optimizer().init(params),
    )


def choose_actions(learner: PPOLearner, x, key, cfg: AgentConfig):
    """Sample from the softmax policy (ps_ppo.py:140-144). x: [B, ...]."""
    logits = ac.ppo_policy_logits(learner.params, x, cfg)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def values(learner: PPOLearner, x, cfg: AgentConfig):
    return ac.ppo_value(learner.params, x, cfg)


def gae(rewards, vals, last_value, gamma: float, lam: float = 0.95):
    """Generalized advantage estimation over the time axis.

    rewards, vals: [T, ...]; last_value: [...] bootstrap.  Returns
    (advantages [T, ...], returns [T, ...])."""
    next_vals = jnp.concatenate([vals[1:], last_value[None]], axis=0)
    deltas = rewards + gamma * next_vals - vals

    def body(carry, delta):
        adv = delta + gamma * lam * carry
        return adv, adv

    _, advs = jax.lax.scan(body, jnp.zeros_like(last_value), deltas, reverse=True)
    return advs, advs + vals


def discounted_returns(rewards, last_value, gamma: float):
    """Plain discounted return bootstrap (the reference driver's scheme)."""
    def body(carry, r):
        ret = r + gamma * carry
        return ret, ret

    _, rets = jax.lax.scan(body, last_value, rewards, reverse=True)
    return rets


def ppo_loss(params, old_params, batch, cfg: AgentConfig,
             e_coef: float = PPO_E_COEF, normalize_adv: bool = True):
    """Combined clipped-surrogate + value + entropy loss (ps_ppo.py:61-90).

    ``normalize_adv`` standardizes advantages per update batch -- absent from
    the reference (which feeds raw return - V, ps_ppo.py:56) but load-bearing
    for stable learning here; pass False for reference-faithful behavior."""
    logits = ac.ppo_policy_logits(params, batch["states"], cfg)
    old_logits = jax.lax.stop_gradient(
        ac.ppo_policy_logits(old_params, batch["states"], cfg)
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    old_logp = jax.nn.log_softmax(old_logits, axis=-1)
    a = batch["actions"][:, None].astype(jnp.int32)
    ratio = jnp.exp(
        jnp.take_along_axis(logp, a, axis=-1)[:, 0]
        - jnp.take_along_axis(old_logp, a, axis=-1)[:, 0]
    )
    adv = batch["advantages"]
    if normalize_adv:
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    surr = ratio * adv
    clipped = jnp.clip(ratio, 1.0 - cfg.eps_clip, 1.0 + cfg.eps_clip) * adv
    aloss = -jnp.mean(jnp.minimum(surr, clipped))

    v = ac.ppo_value(params, batch["states"], cfg)
    closs = jnp.mean(jnp.square(batch["returns"] - v))

    probs = jax.nn.softmax(logits, axis=-1)
    logp_clip = jnp.log(jnp.clip(probs, 1e-10, 1.0))  # ps_ppo.py:86
    entropy = -jnp.sum(probs * logp_clip, axis=-1)
    eloss = -jnp.sum(jnp.mean(entropy, axis=-1)) * e_coef

    return aloss + 0.5 * closs + eloss, (aloss, closs, entropy.mean())


@partial(jax.jit, static_argnames=("cfg",))
def update(learner: PPOLearner, batch, cfg: AgentConfig):
    """One PPO update: snapshot old policy, run update_step combined-loss
    gradient epochs on the batch (ps_ppo.py:95-108).

    batch: {"states" [M, ...], "actions" [M], "advantages" [M],
    "returns" [M]}."""
    old_params = jax.tree.map(jnp.copy, learner.params)
    params, opt_state = learner.params, learner.opt_state
    opt = make_optimizer()
    metrics = None
    for _ in range(cfg.update_step):
        (loss, aux), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
            params, old_params, batch, cfg
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "actor_loss": aux[0], "critic_loss": aux[1],
                   "entropy": aux[2]}
    return learner.replace(params=params, old_params=old_params,
                           opt_state=opt_state), metrics
