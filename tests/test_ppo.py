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


# ---------------------------------------------------------------------------
# Golden test vs the reference loss (VERDICT r2 #6): transliterate
# ps_ppo.py:49-93 -- critic MSE on (discounted_r - V), clipped surrogate
# over prob RATIOS (pi_prob/oldpi_prob, not exp(logdiff)), entropy bonus
# with the clip(1e-10, 1) and the hardcoded e_coef=0.01 -- into NumPy
# float64 and demand the JAX loss and its gradient match, like the DRQN
# repack got in test_learner.py.
# ---------------------------------------------------------------------------


def _np_dense(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def _np_reference_loss(params, old_params, s, a, r, adv, eps_clip):
    """ps_ppo.py:49-93, feedforward path, NumPy float64 transliteration."""
    # critic (ps_ppo.py:52-57): dense+relu 'lc' -> dense(1); closs = mean(adv^2)
    lc = np.maximum(_np_dense(params["critic_fc"], s), 0.0)
    v = _np_dense(params["critic_head"], lc)[:, 0]
    closs = np.mean((r - v) ** 2)

    # actor _build_anet (ps_ppo.py:130-138): dense+relu -> dense softmax
    def pi_of(p):
        la = np.maximum(_np_dense(p["actor_fc"], s), 0.0)
        logits = _np_dense(p["actor_head"], la)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    pi, oldpi = pi_of(params), pi_of(old_params)
    idx = np.arange(len(a))
    ratio = pi[idx, a] / oldpi[idx, a]          # ps_ppo.py:70-73
    surr = ratio * adv
    clipped = np.clip(ratio, 1.0 - eps_clip, 1.0 + eps_clip) * adv
    aloss = -np.mean(np.minimum(surr, clipped))  # ps_ppo.py:75-77

    # entropy block (ps_ppo.py:85-89): e_coef hardcoded 0.01, probs clipped
    log_pi = np.log(np.clip(pi, 1e-10, 1.0))
    entropy = -np.sum(pi * log_pi, axis=-1)
    eloss = -np.sum(np.mean(entropy, axis=-1)) * 0.01

    return aloss + 0.5 * closs + eloss, v       # ps_ppo.py:89


def _golden_setup(seed=0, M=64, D=7, A=4):
    cfg = dataclasses.replace(
        toy_4ue_3r().agent, eps_clip=0.2,
        network=dataclasses.replace(toy_4ue_3r().agent.network,
                                    use_lstm_input=False, layers=(16,)),
    )
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    params = ppo.init_learner(k1, D, A, cfg, jnp.float64).params
    # old policy = a genuinely different snapshot so ratios leave [1-eps,
    # 1+eps] and the clip branch is exercised
    old = ppo.init_learner(k2, D, A, cfg, jnp.float64).params
    s = jax.random.normal(k3, (M, D), jnp.float64)
    a = jax.random.randint(k4, (M,), 0, A)
    r = jax.random.normal(k5, (M,), jnp.float64)
    return cfg, params, old, s, a, r


def test_reference_loss_golden():
    cfg, params, old, s, a, r = _golden_setup()
    # reference update() computes adv = r - V(s) once with the CURRENT
    # critic before the epochs (ps_ppo.py:99) and feeds it as a constant
    loss_np, v_np = _np_reference_loss(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, old),
        np.asarray(s), np.asarray(a), np.asarray(r),
        np.asarray(r) - np.asarray(ppo.values(
            ppo.PPOLearner(params=params, old_params=old, opt_state=None),
            s, cfg)),
        cfg.eps_clip)
    batch = {
        "states": s, "actions": a, "returns": r,
        "advantages": r - ppo.values(
            ppo.PPOLearner(params=params, old_params=old, opt_state=None),
            s, cfg),
    }
    loss_j, _ = ppo.ppo_loss(params, old, batch, cfg, normalize_adv=False)
    # float64: the only divergences are ratio-from-probs vs exp(logdiff)
    # and summation order -- sub-1e-12 relative
    np.testing.assert_allclose(float(loss_j), loss_np, rtol=1e-12)
    # clipping must actually be active in this fixture or the test is weak
    pi = np.exp(np.asarray(jax.nn.log_softmax(
        ppo.ac.ppo_policy_logits(params, s, cfg), axis=-1)))
    oldpi = np.exp(np.asarray(jax.nn.log_softmax(
        ppo.ac.ppo_policy_logits(old, s, cfg), axis=-1)))
    idx = np.arange(len(np.asarray(a)))
    ratio = pi[idx, np.asarray(a)] / oldpi[idx, np.asarray(a)]
    assert ((ratio > 1.2) | (ratio < 0.8)).any()


def test_reference_loss_gradient_golden():
    """The analytic gradient of the combined loss equals central finite
    differences of the NumPy reference transliteration, in float64."""
    cfg, params, old, s, a, r = _golden_setup(seed=3)
    adv = r - ppo.values(
        ppo.PPOLearner(params=params, old_params=old, opt_state=None), s, cfg)
    batch = {"states": s, "actions": a, "returns": r, "advantages": adv}
    grads = jax.grad(
        lambda p: ppo.ppo_loss(p, old, batch, cfg, normalize_adv=False)[0]
    )(params)

    np_params = jax.tree.map(np.asarray, params)
    np_old = jax.tree.map(np.asarray, old)
    s_np, a_np, r_np, adv_np = map(np.asarray, (s, a, r, adv))

    def loss_at(p):
        return _np_reference_loss(p, np_old, s_np, a_np, r_np, adv_np,
                                  cfg.eps_clip)[0]

    rng = np.random.RandomState(11)
    eps = 1e-6
    leaves, treedef = jax.tree.flatten(np_params)
    for trial in range(4):
        direction = [rng.randn(*leaf.shape) for leaf in leaves]
        plus = treedef.unflatten([l + eps * d for l, d in zip(leaves, direction)])
        minus = treedef.unflatten([l - eps * d for l, d in zip(leaves, direction)])
        fd = (loss_at(plus) - loss_at(minus)) / (2 * eps)
        analytic = sum(
            float(np.sum(np.asarray(g) * d))
            for g, d in zip(jax.tree.leaves(grads), direction)
        )
        np.testing.assert_allclose(analytic, fd, rtol=1e-6, atol=1e-9,
                                   err_msg=f"direction {trial}")


def test_reference_hardcoded_quirks():
    """The reference hardcodes the combined-optimizer lr (3e-4,
    ps_ppo.py:90) and the entropy coefficient (0.01, ps_ppo.py:85)
    regardless of config; the learner must preserve both."""
    assert ppo.PPO_COMBINED_LR == 3e-4
    assert ppo.PPO_E_COEF == 0.01


# ---------------------------------------------------------------------------
# Recurrent-path golden tests (VERDICT r3 #4): the production
# ppo_congested.yaml trains with use_lstm_input=True but the round-3
# golden tests pinned only the MLP variant.  Transliterate the reference's
# separate actor/critic BasicLSTMCell encoders (ps_ppo.py:27-44: unshared
# LSTMs, last-step output) into NumPy float64 alongside the loss.
# ---------------------------------------------------------------------------


def _np_lstm_last(p, x):
    """BasicLSTMCell over the window, last step (ps_ppo.py:31-36): gate
    order i, g, f, o with the +1.0 forget bias, zero initial state."""
    w, b = np.asarray(p["w"]), np.asarray(p["b"])
    H = w.shape[1] // 4
    M = x.shape[0]
    c = np.zeros((M, H))
    h = np.zeros((M, H))
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))
    for t in range(x.shape[1]):
        gates = np.concatenate([x[:, t], h], axis=-1) @ w + b
        i, g, f, o = np.split(gates, 4, axis=-1)
        c = c * sig(f + 1.0) + sig(i) * np.tanh(g)
        h = np.tanh(c) * sig(o)
    return h


def _np_reference_loss_lstm(params, old_params, s, a, r, adv, eps_clip):
    """ps_ppo.py:49-93 with the LSTM encoders: critic reads its own
    lstm_critic encoding (ps_ppo.py:38-44,52-53), pi and oldpi each read
    their own actor encoder (the old snapshot carries its own LSTM
    weights, ps_ppo.py:62-66)."""
    lc_in = _np_lstm_last(params["critic_lstm"], s)
    lc = np.maximum(_np_dense(params["critic_fc"], lc_in), 0.0)
    v = _np_dense(params["critic_head"], lc)[:, 0]
    closs = np.mean((r - v) ** 2)

    def pi_of(p):
        enc = _np_lstm_last(p["actor_lstm"], s)
        la = np.maximum(_np_dense(p["actor_fc"], enc), 0.0)
        logits = _np_dense(p["actor_head"], la)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    pi, oldpi = pi_of(params), pi_of(old_params)
    idx = np.arange(len(a))
    ratio = pi[idx, a] / oldpi[idx, a]
    surr = ratio * adv
    clipped = np.clip(ratio, 1.0 - eps_clip, 1.0 + eps_clip) * adv
    aloss = -np.mean(np.minimum(surr, clipped))

    log_pi = np.log(np.clip(pi, 1e-10, 1.0))
    entropy = -np.sum(pi * log_pi, axis=-1)
    eloss = -np.sum(np.mean(entropy, axis=-1)) * 0.01
    return aloss + 0.5 * closs + eloss, v


def _golden_setup_lstm(seed=0, M=48, T=4, D=7, A=4):
    cfg = dataclasses.replace(
        toy_4ue_3r().agent, eps_clip=0.2, step_size=T,
        network=dataclasses.replace(toy_4ue_3r().agent.network,
                                    use_lstm_input=True, layers=(16,),
                                    lstm_impl="xla"),
    )
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    params = ppo.init_learner(k1, D, A, cfg, jnp.float64).params
    old = ppo.init_learner(k2, D, A, cfg, jnp.float64).params
    s = jax.random.normal(k3, (M, T, D), jnp.float64)
    a = jax.random.randint(k4, (M,), 0, A)
    r = jax.random.normal(k5, (M,), jnp.float64)
    return cfg, params, old, s, a, r


def test_reference_loss_golden_lstm():
    cfg, params, old, s, a, r = _golden_setup_lstm()
    learner = ppo.PPOLearner(params=params, old_params=old, opt_state=None)
    adv = r - ppo.values(learner, s, cfg)
    loss_np, v_np = _np_reference_loss_lstm(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, old),
        np.asarray(s), np.asarray(a), np.asarray(r), np.asarray(adv),
        cfg.eps_clip)
    batch = {"states": s, "actions": a, "returns": r, "advantages": adv}
    loss_j, _ = ppo.ppo_loss(params, old, batch, cfg, normalize_adv=False)
    # float64: divergences are the hoisted input projection's summation
    # order inside lstm_scan and ratio-from-probs spelling -- ~1e-13
    np.testing.assert_allclose(float(loss_j), loss_np, rtol=1e-10)
    # the fixture must actually exercise the clip branch
    pi = np.exp(np.asarray(jax.nn.log_softmax(
        ppo.ac.ppo_policy_logits(params, s, cfg), axis=-1)))
    oldpi = np.exp(np.asarray(jax.nn.log_softmax(
        ppo.ac.ppo_policy_logits(old, s, cfg), axis=-1)))
    idx = np.arange(len(np.asarray(a)))
    ratio = pi[idx, np.asarray(a)] / oldpi[idx, np.asarray(a)]
    assert ((ratio > 1.2) | (ratio < 0.8)).any()


def test_reference_loss_gradient_golden_lstm():
    """Analytic gradients through BOTH LSTM encoders vs central finite
    differences of the NumPy reference transliteration, float64."""
    cfg, params, old, s, a, r = _golden_setup_lstm(seed=5)
    learner = ppo.PPOLearner(params=params, old_params=old, opt_state=None)
    adv = r - ppo.values(learner, s, cfg)
    batch = {"states": s, "actions": a, "returns": r, "advantages": adv}
    grads = jax.grad(
        lambda p: ppo.ppo_loss(p, old, batch, cfg, normalize_adv=False)[0]
    )(params)

    np_params = jax.tree.map(np.asarray, params)
    np_old = jax.tree.map(np.asarray, old)
    s_np, a_np, r_np, adv_np = map(np.asarray, (s, a, r, adv))

    def loss_at(p):
        return _np_reference_loss_lstm(p, np_old, s_np, a_np, r_np, adv_np,
                                       cfg.eps_clip)[0]

    rng = np.random.RandomState(17)
    eps = 1e-6
    leaves, treedef = jax.tree.flatten(np_params)
    for trial in range(3):
        direction = [rng.randn(*leaf.shape) for leaf in leaves]
        plus = treedef.unflatten(
            [l + eps * d for l, d in zip(leaves, direction)])
        minus = treedef.unflatten(
            [l - eps * d for l, d in zip(leaves, direction)])
        fd = (loss_at(plus) - loss_at(minus)) / (2 * eps)
        analytic = sum(
            float(np.sum(np.asarray(g) * d))
            for g, d in zip(jax.tree.leaves(grads), direction)
        )
        np.testing.assert_allclose(analytic, fd, rtol=1e-6, atol=1e-9,
                                   err_msg=f"direction {trial}")


def test_ppo_congested_config_e2e():
    """A short schedule through configs/ppo_congested.yaml's ACTUAL shape
    (6v/5r channel env, LSTM encoders, its update/clip settings) -- the
    production config path must run end-to-end, produce finite logs and
    move the policy."""
    from diral_tpu.config import load_config

    cfg = load_config("configs/ppo_congested.yaml")
    assert cfg.agent.network.use_lstm_input  # the point of this test
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=4),
        save_positions=False)
    learner, logs = run_ppo(cfg, seed=0, num_episodes=30)
    sr = np.asarray(logs["mean_sum_reward"])
    assert sr.shape[0] == 30 and np.isfinite(sr).all()
    assert np.isfinite(np.asarray(logs["loss"])).all()
    # parameters actually moved (old_params snapshot lags params)
    moved = any(
        not np.array_equal(np.asarray(p), np.asarray(o))
        for p, o in zip(jax.tree.leaves(learner.params),
                        jax.tree.leaves(learner.old_params)))
    assert moved or not np.array_equal(
        np.asarray(jax.tree.leaves(learner.params)[0]),
        np.asarray(jax.tree.leaves(
            ppo.init_learner(jax.random.PRNGKey(0),
                             cfg.env.state_space, cfg.env.num_channels,
                             cfg.agent).params)[0]))


def test_ppo_learns_coordination_lstm():
    """Learning smoke on the LSTM variant (the production encoder path):
    2 users / 2 channels, reward must trend up."""
    base = toy_4ue_3r(save_positions=False)
    env = dataclasses.replace(base.env, num_users=2, num_channels=2)
    agent = dataclasses.replace(
        base.agent, update_step=6, eps_clip=0.2, gamma=0.9, step_size=4,
        network=dataclasses.replace(base.agent.network, use_lstm_input=True,
                                    layers=(32, 32)),
    )
    cfg = dataclasses.replace(
        base, env=env, agent=agent,
        engine=dataclasses.replace(base.engine, num_envs=8),
    )
    learner, logs = run_ppo(cfg, seed=0, num_episodes=300)
    sr = np.asarray(logs["mean_sum_reward"])
    early, late = sr[:50].mean(), sr[-50:].mean()
    assert np.isfinite(sr).all()
    assert late > early + 0.2, f"no learning: early={early:.2f} late={late:.2f}"
    assert late > 1.2, f"late reward too low: {late:.2f} (optimal 2.0)"
