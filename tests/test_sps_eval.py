"""SPS baseline semantics + evaluation-harness tests."""

import dataclasses
import random

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.agents import sps as S
from diral_tpu.envs import v2v_env as E
from diral_tpu.envs import oracle as O
from diral_tpu.train.evaluate import evaluate_sps, prr_per_user


def reference_choose(rssi, prev_action, threshold):
    """Transliteration of v2x_sps.py:24-74 candidate selection (returns the
    shortlist, since the final pick is random)."""
    c = len(rssi)
    min_sa = c // 5
    sa = {}
    thr = threshold
    while len(sa) < min_sa:
        sa = {}
        for sf in range(c):
            if sf == prev_action:
                continue
            if rssi[sf] < thr:
                sa[sf] = rssi[sf]
        thr += 3
    ordered = sorted(sa.items(), key=lambda kv: kv[1])
    min_len = min(min_sa, len(sa))
    sb = []
    for k, v in ordered:
        sb.append(k)
        if len(sb) >= min_len:
            break
    return sb


def test_choose_resource_matches_reference_shortlist():
    rng = np.random.RandomState(0)
    for trial in range(12):
        c = rng.choice([5, 10, 20])
        rssi = rng.uniform(-120, -80, size=c)
        prev = int(rng.randint(0, c))
        thr = -110.0
        sb = reference_choose(rssi, prev, thr)
        picks = set()
        for s in range(25):
            a = S._choose_new_resource(
                jax.random.PRNGKey(trial * 100 + s), jnp.asarray(rssi),
                jnp.asarray(prev), thr,
            )
            picks.add(int(a))
        assert picks <= set(sb), (trial, picks, sb)
        if len(sb) > 1:
            assert len(picks) > 1  # actually random over the shortlist


def test_counter_semantics():
    """counter > 0 -> repeat previous and decrement (v2x_sps.py:86-90)."""
    st = S.SPSState(prev_action=jnp.asarray([2, 1], jnp.int32),
                    counter=jnp.asarray([3, 1], jnp.int32))
    rssi = jnp.full((2, 10), -120.0)
    actions, st2 = S.sps_step(jax.random.PRNGKey(0), st, rssi, -110.0)
    np.testing.assert_array_equal(np.asarray(actions), [2, 1])
    np.testing.assert_array_equal(np.asarray(st2.counter), [2, 0])


def test_expiry_keep_probability():
    """On expiry: keep with p=0.8, reselect otherwise; counter ~ U{5,16}."""
    n = 2000
    st = S.SPSState(prev_action=jnp.zeros(n, jnp.int32),
                    counter=jnp.zeros(n, jnp.int32))
    rssi = jnp.tile(jnp.linspace(-120, -90, 10)[None], (n, 1))
    actions, st2 = S.sps_step(jax.random.PRNGKey(1), st, rssi, -110.0)
    kept = (np.asarray(actions) == 0).mean()
    assert 0.75 < kept < 0.85, kept
    cnt = np.asarray(st2.counter)
    assert cnt.min() >= 5 and cnt.max() <= 16


def test_prr_matches_channel_step_rewards():
    """For reward_design 2, my_step_ch's collision reward is -(1 - PRR)
    (test_env.py:417-418); solo transmitters score 1 and have PRR-formula
    value 1.  Cross-check prr_per_user against the oracle's step."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(base, reward_design=2, communication_range=60.0,
                              num_users=6, num_channels=4)
    o = O.OracleEnv(cfg, np.random.RandomState(3), random.Random(4))
    s = E.reset_from(cfg, o.pos_x, o.pos_y, o.vel, o.direction, dtype=jnp.float64)
    rng = np.random.RandomState(5)
    for t in range(30):
        actions = rng.randint(0, cfg.num_channels, size=cfg.num_users)
        prr = np.asarray(prr_per_user(cfg, s, jnp.asarray(actions)))
        obs_o, rew_o = o.my_step_ch(actions, t)
        s, _, _ = E.step_channel(cfg, s, jnp.asarray(actions), t)
        # colliding users: rew = -(1 - prr); solo users: rew = 1, prr = 1
        counts = np.bincount(actions, minlength=cfg.num_channels)
        for u in range(cfg.num_users):
            if counts[actions[u]] > 1:
                np.testing.assert_allclose(rew_o[u], -(1 - prr[u]), atol=1e-12)
            else:
                np.testing.assert_allclose(rew_o[u], 1.0)
                np.testing.assert_allclose(prr[u], 1.0)


def test_evaluate_sps_runs():
    cfg = toy_4ue_3r(save_positions=False)
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=4)
    )
    m = evaluate_sps(cfg, jax.random.PRNGKey(0), steps=50)
    assert 0.0 <= m["mean_prr"] <= 1.0
    assert np.isfinite(m["mean_sum_reward"])
