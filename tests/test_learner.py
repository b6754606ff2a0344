"""Learner-level tests (SURVEY.md section 4c): batch repacking vs the
reference's nested loops, Double-DQN target math, target-network sync, and
an end-to-end training-loop smoke + learning-signal check."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.agents import drqn
from diral_tpu.models import qnets
from diral_tpu.train.loop import run_experiment


def small_cfg(**over):
    cfg = toy_4ue_3r(
        time_slots=400,
        memory_size=256,
        explore=50,
        greedy=100000,
        training=True,
        train_after_episode=True,
        save_positions=False,
    )
    agent = dataclasses.replace(
        cfg.agent, batch_size=32, n_batch=1, target_update=50,
        network=dataclasses.replace(cfg.agent.network, layers=(32, 32)),
    )
    cfg = dataclasses.replace(cfg, agent=agent)
    return dataclasses.replace(cfg, **over) if over else cfg


def reference_repack(batch, num_users):
    """Transliteration of drl_drqn.py:294-377 get_*_user + the reshape at
    drl_drqn.py:234-238, against python lists."""
    states = np.asarray(batch["states"])   # [B, T, N, D]
    B, T, N, D = states.shape
    out = []
    for user in range(num_users):
        per_user = []
        for b in range(B):
            per_batch = [states[b, t, user] for t in range(T)]
            per_user.append(per_batch)
        out.append(per_user)
    arr = np.array(out)  # [N, B, T, D]
    return arr.reshape(-1, T, D)


def test_repack_matches_reference_loops():
    rng = np.random.RandomState(0)
    B, T, N, D = 5, 6, 4, 7
    batch = {
        "states": jnp.asarray(rng.randn(B, T, N, D)),
        "actions": jnp.asarray(rng.randint(0, 3, (B, T, N))),
        "rewards": jnp.asarray(rng.randn(B, T, N)),
        "next_states": jnp.asarray(rng.randn(B, T, N, D)),
    }
    s, a, r, ns = drqn.repack_user_major(batch, N, use_lstm=True)
    np.testing.assert_array_equal(np.asarray(s), reference_repack(batch, N))
    # actions/rewards follow the same [N, B, T] -> [N*B, T] flattening
    aref = np.transpose(np.asarray(batch["actions"]), (2, 0, 1)).reshape(-1, T)
    np.testing.assert_array_equal(np.asarray(a), aref)


def test_double_dqn_target_math():
    cfg = small_cfg().agent
    key = jax.random.PRNGKey(0)
    D, A = 23, 3
    learner = drqn.init_learner(key, D, A, cfg)
    rng = np.random.RandomState(1)
    rewards = jnp.asarray(rng.randn(10, cfg.step_size), jnp.float32)
    next_states = jnp.asarray(rng.randn(10, cfg.step_size, D), jnp.float32)
    targets = drqn.td_targets(learner, rewards, next_states, cfg)
    # manual: argmax under online params, gather under target params
    oq = np.asarray(qnets.drqn_apply(learner.params, next_states, cfg))
    tq = np.asarray(qnets.drqn_apply(learner.target_params, next_states, cfg))
    act = oq.argmax(axis=1)
    manual = np.asarray(rewards)[:, -1] + cfg.gamma * tq[np.arange(10), act]
    np.testing.assert_allclose(np.asarray(targets), manual, rtol=1e-6)


def test_target_sync_cadence():
    """Target params copy only when (t+1) % target_update == 0
    (drl_drqn.py:263-265)."""
    cfg = small_cfg().agent
    learner = drqn.init_learner(jax.random.PRNGKey(0), 23, 3, cfg)
    # make online and target differ
    learner = learner.replace(
        params=jax.tree.map(lambda p: p + 1.0, learner.params)
    )
    from diral_tpu.agents.replay import WindowReplay
    replay = WindowReplay.create(64, (4, 23), (4,), (4,))
    for i in range(40):
        replay = replay.add(jnp.zeros((4, 23)), jnp.zeros(4, jnp.int32),
                            jnp.zeros(4), jnp.zeros((4, 23)))
    l2, _ = drqn.train(learner, replay, jax.random.PRNGKey(1), 10, cfg, 4)
    assert not np.allclose(
        np.asarray(jax.tree.leaves(l2.target_params)[0]),
        np.asarray(jax.tree.leaves(l2.params)[0]),
    )
    l3, _ = drqn.train(learner, replay, jax.random.PRNGKey(1),
                       cfg.target_update - 1, cfg, 4)
    for tp, p in zip(jax.tree.leaves(l3.target_params), jax.tree.leaves(l3.params)):
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(p))


def test_training_loop_smoke():
    """400 slots, 2 envs: runs end-to-end under jit, logs well-formed,
    epsilon followed the per-episode decay schedule."""
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=2)
    )
    carry, logs = run_experiment(cfg, seed=0, num_slots=400)
    assert logs["sum_reward"].shape == (400, 2)
    assert logs["actions"].shape == (400, 2, 4)
    assert np.isfinite(np.asarray(logs["loss"])).all()
    # epsilon decays once per episode advance, but only while the eps-greedy
    # band is active (t >= explore; the reference never consults the policy
    # in the random-explore band, drl_drqn.py:167-169): with explore=50 the
    # distinct episodes seen in-band over 400 slots are {2..15} -> 14 decays.
    episodes_fired = len(
        {t // cfg.episode_interval for t in range(cfg.explore, 400)}
    )
    expect_eps = max(0.99 * cfg.agent.eps_decay ** episodes_fired, 0.001)
    np.testing.assert_allclose(float(logs["eps"][-1]), expect_eps, rtol=1e-4)
    # rewards bounded by design-2 range (worst: all N users collide on one
    # channel, each rewarded -N -> sum = -N^2)
    sr = np.asarray(logs["sum_reward"])
    assert sr.max() <= cfg.env.num_channels
    assert sr.min() >= -float(cfg.env.num_users**2)


def test_learning_signal():
    """End-to-end learning check on a CI-tractable 2-user/2-channel config:
    agents must learn to pick distinct channels (optimal sum reward 2.0).
    The 4ue/3r flagship needs the reference's 250k-slot schedule
    (config yaml:4-17) and is validated on TPU via bench/eval, not CI."""
    cfg = small_cfg(explore=100, time_slots=4000)
    env = dataclasses.replace(cfg.env, num_users=2, num_channels=2)
    agent = dataclasses.replace(cfg.agent, eps_decay=0.98, batch_size=64,
                                n_batch=1, target_update=100,
                                learning_rate=3e-4)
    cfg = dataclasses.replace(cfg, env=env, agent=agent)
    carry, logs = run_experiment(cfg, seed=0, num_slots=4000)
    sr = np.asarray(logs["sum_reward"])[:, 0]
    early = sr[:800].mean()
    late = sr[-800:].mean()
    assert late > early + 0.3, f"no learning signal: early={early:.2f} late={late:.2f}"
    assert late > 1.4, f"late-policy reward too low: {late:.2f} (optimal 2.0)"


def test_sampler_shift_trick_exact():
    """sample_windows_cross_env serves all four sample arrays from ONE
    gather of the fused [B, S, N, D+2] buffer: next_states are the states
    window shifted one slot (ring-contiguity invariant), actions/rewards
    ride the same rows.  The output must BIT-equal four direct gathers of
    the equivalent split layout on a real training replay, and the action
    float round-trip must be exact."""
    import jax.numpy as jnp
    from diral_tpu.train.loop import (make_train_functions,
                                      sample_windows_cross_env)

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=3)
    )
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(2))
    carry, _ = jax.jit(lambda c: jax.lax.scan(slot_step, c, jnp.arange(60)))(
        carry)
    replay = carry.replay

    step = cfg.agent.step_size
    batch = 16
    key = jax.random.PRNGKey(9)
    got = jax.jit(lambda r, k: sample_windows_cross_env(r, k, batch, step))(
        replay, key)

    # reference computation: four direct gathers of the split layout,
    # reconstructed from the fused flat buffer in numpy (the mirror-pad
    # slots past capacity are duplicates of ring slots [0, pad) -- assert
    # that invariant too, then drop them; rows unflatten to [N, D+2])
    B, S = replay.buf.shape[0], replay.capacity
    full = np.asarray(replay.buf)                # [B, S+pad, N*(D+2)]
    if replay.pad:
        np.testing.assert_array_equal(full[:, S:], full[:, :replay.pad])
    buf = full[:, :S].reshape(B, S, replay.num_users, -1)
    D = replay.state_dim  # the user stride carries pad lanes past D+2
    np.testing.assert_array_equal(buf[..., D + 2:], 0.0)
    states, rewards = buf[..., :D], buf[..., D]
    actions = buf[..., D + 1].astype(np.int32)
    valid = replay.count[0] - step
    k1, = jax.random.split(key, 1)
    scores = jax.random.uniform(k1, (B * S,))
    scores = jnp.where(jnp.arange(B * S) % S < valid, scores, jnp.inf)
    _, flat = jax.lax.top_k(-scores, batch)
    env_idx, start = flat // S, flat % S
    oldest = (replay.ptr[0] - replay.count[0]) % S
    idx = (np.asarray(oldest) + np.asarray(start)[:, None]
           + np.arange(step)[None, :]) % S
    e = np.asarray(env_idx)[:, None]
    np.testing.assert_array_equal(np.asarray(got["states"]), states[e, idx])
    # the shift trick: next_states == states one ring slot later
    np.testing.assert_array_equal(np.asarray(got["next_states"]),
                                  states[e, (idx + 1) % S])
    np.testing.assert_array_equal(np.asarray(got["actions"]),
                                  actions[e, idx])
    np.testing.assert_array_equal(np.asarray(got["rewards"]),
                                  rewards[e, idx])


def test_bottom_k_two_stage_exact():
    """The two-stage bottom-k must return the identical index sequence as
    the flat top_k (set, order, AND ties) across shapes that hit both the
    fast path and the exactness fallback (adversarially concentrated
    scores so single envs own the whole bottom-k)."""
    from diral_tpu.train.loop import _bottom_k_two_stage

    rng = np.random.RandomState(7)
    cases = [
        (256, 1024, 512),   # production shape (fast path)
        (3, 256, 16),       # tiny test config
        (1, 1024, 512),     # reference reduction: q == S, no fallback
        (8, 64, 48),        # quota pressure: k/B = 6 vs q = 32
    ]
    for B, S, k in cases:
        scores = rng.rand(B * S).astype(np.float32)
        # adversarial: env 0 owns the entire global bottom-k -> any quota
        # q < k is truncated and the fallback MUST fire to stay exact
        conc = scores.copy().reshape(B, S)
        conc[0, : min(k, S)] = -np.arange(min(k, S), dtype=np.float32)
        for sc in (scores.reshape(B, S), conc):
            got = np.asarray(jax.jit(
                lambda s: _bottom_k_two_stage(s, k))(jnp.asarray(sc)))
            _, want = jax.lax.top_k(-jnp.asarray(sc).reshape(-1), k)
            np.testing.assert_array_equal(got, np.asarray(want),
                                          err_msg=f"B={B} S={S} k={k}")


def test_sample_many_equals_singles():
    """sample_windows_cross_env_many with the train()-key chain must be
    bit-identical to sequential per-step sampling (the fused gather is a
    layout change, not a semantics change)."""
    from diral_tpu.train.loop import (make_train_functions,
                                      sample_windows_cross_env,
                                      sample_windows_cross_env_many)

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=3))
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(4))
    carry, _ = jax.jit(lambda c: jax.lax.scan(slot_step, c, jnp.arange(70)))(
        carry)
    replay = carry.replay
    step, batch = cfg.agent.step_size, 16

    key = jax.random.PRNGKey(11)
    keys = []
    for _ in range(3):
        key, kb = jax.random.split(key)
        keys.append(kb)
    many = jax.jit(lambda r, ks: sample_windows_cross_env_many(
        r, ks, batch, step))(replay, jnp.stack(keys))
    for j, kb in enumerate(keys):
        single = jax.jit(lambda r, k: sample_windows_cross_env(
            r, k, batch, step))(replay, kb)
        for name in single:
            np.testing.assert_array_equal(
                np.asarray(many[name][j]), np.asarray(single[name]),
                err_msg=f"batch {j} field {name}")


def test_sample_rows_match_repack():
    """The production rows sampler (sample_window_rows_many: pre-repacked
    flat padded windows straight off the gather) must BIT-equal
    repack_user_major applied to the view sampler's output -- same key
    chain, same windows, same user-major row order, padded lanes zero."""
    from diral_tpu.ops.pallas_lstm import padded_dim
    from diral_tpu.train.loop import (make_train_functions,
                                      sample_window_rows_many,
                                      sample_windows_cross_env_many)

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=3))
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(6))
    carry, _ = jax.jit(lambda c: jax.lax.scan(slot_step, c, jnp.arange(70)))(
        carry)
    replay = carry.replay
    T, batch, N = cfg.agent.step_size, 16, cfg.env.num_users
    D = replay.state_dim
    Dp = padded_dim(D)

    keys = jnp.stack([jax.random.PRNGKey(21), jax.random.PRNGKey(22)])
    rows = jax.jit(lambda r, k: sample_window_rows_many(r, k, batch, T))(
        replay, keys)
    views = jax.jit(lambda r, k: sample_windows_cross_env_many(r, k, batch,
                                                               T))(replay,
                                                                   keys)
    for j in range(2):
        batch_j = jax.tree.map(lambda x: x[j], views)
        s, a, r, ns = drqn.repack_user_major(batch_j, N, use_lstm=True)
        got_s = np.asarray(rows["states"][j]).reshape(N * batch, T, Dp)
        np.testing.assert_array_equal(got_s[..., :D], np.asarray(s))
        # the per-step pad lanes carry the slot's reward/action channels
        # (ignored by the kernel's zero weight rows), then zeros
        np.testing.assert_array_equal(got_s[..., D], np.asarray(r))
        np.testing.assert_array_equal(got_s[..., D + 1].astype(np.int32),
                                      np.asarray(a))
        np.testing.assert_array_equal(got_s[..., D + 2:], 0.0)
        got_ns = np.asarray(rows["next_states"][j]).reshape(N * batch, T, Dp)
        np.testing.assert_array_equal(got_ns[..., :D], np.asarray(ns))
        np.testing.assert_array_equal(np.asarray(rows["actions"][j]),
                                      np.asarray(a))
        np.testing.assert_array_equal(np.asarray(rows["rewards"][j]),
                                      np.asarray(r))


def test_fused_replay_chain_invariant():
    """The fused layout stores no next_states: slot k's next_state IS the
    state channels of ring slot k+1.  Witness it against the live loop:
    stepping slot-by-slot, the row written at slot t holds the PRE-slot
    carry.state and the slot's actions, and the post-slot carry.state (the
    old layout's next_state) is exactly what slot t+1's row stores."""
    import jax.numpy as jnp
    from diral_tpu.train.loop import make_train_functions

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=2)
    )
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(3))
    jit_slot = jax.jit(slot_step)
    D = carry.state.shape[-1]
    prev_next = None
    for t in range(40, 44):
        pre_state = np.asarray(carry.state)
        carry, logs = jit_slot(carry, jnp.asarray(t))
        i = (int(carry.replay.ptr[0]) - 1) % carry.replay.capacity
        row = np.asarray(carry.replay.buf[:, i]).reshape(
            carry.replay.buf.shape[0], carry.replay.num_users, -1)
        np.testing.assert_array_equal(row[..., :D], pre_state)
        np.testing.assert_array_equal(row[..., D + 1].astype(np.int32),
                                      np.asarray(logs["actions"]))
        if prev_next is not None:  # previous slot's next_state == this row's
            np.testing.assert_array_equal(prev_next, row[..., :D])
        prev_next = np.asarray(carry.state)


def test_fused_windows_train_step_matches_packed():
    """The fused combined-window train step (train_on_windows over
    sample_window_rows_many(windows_only=True)) must match train_on_packed
    on the sliced states/next_states rows: same windows, same loss, same
    updated params.  Exercised through BOTH lstm_impl paths: the XLA
    fallback (slices + apply/apply_dual) and the interpret-mode Pallas
    triple kernel."""
    from diral_tpu.ops.pallas_lstm import padded_dim
    from diral_tpu.train.loop import (make_train_functions,
                                      sample_window_rows_many)

    base = small_cfg()
    base = dataclasses.replace(
        base, engine=dataclasses.replace(base.engine, num_envs=3))
    init_carry, slot_step, _ = make_train_functions(base)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(8))
    carry, _ = jax.jit(lambda c: jax.lax.scan(slot_step, c, jnp.arange(70)))(
        carry)
    replay, learner = carry.replay, carry.learner
    T, batch = base.agent.step_size, 16
    keys = jnp.stack([jax.random.PRNGKey(31)])

    rows_w = jax.jit(lambda r, k: sample_window_rows_many(
        r, k, batch, T, windows_only=True))(replay, keys)
    rows_s = jax.jit(lambda r, k: sample_window_rows_many(
        r, k, batch, T))(replay, keys)
    Dp = padded_dim(replay.state_dim)
    # the combined window's slices ARE the states/next_states rows
    np.testing.assert_array_equal(
        np.asarray(rows_w["windows"][0][:, :T * Dp]),
        np.asarray(rows_s["states"][0]))
    np.testing.assert_array_equal(
        np.asarray(rows_w["windows"][0][:, Dp:]),
        np.asarray(rows_s["next_states"][0]))

    for impl in ("xla", "pallas"):
        acfg = dataclasses.replace(
            base.agent, network=dataclasses.replace(
                base.agent.network, lstm_impl=impl,
                # the kernel needs lane-aligned hidden; the xla branch
                # keeps the carry's small net
                layers=(128, 32) if impl == "pallas"
                else base.agent.network.layers))
        lrn = (drqn.init_learner(jax.random.PRNGKey(40), replay.state_dim,
                                 base.env.num_channels, acfg)
               if impl == "pallas" else learner)
        l1, loss1 = jax.jit(lambda l: drqn.train_on_windows(
            l, rows_w["windows"][0], rows_w["actions"][0],
            rows_w["rewards"][0], acfg))(lrn)
        l2, loss2 = jax.jit(lambda l: drqn.train_on_packed(
            l, rows_s["states"][0], rows_s["actions"][0],
            rows_s["rewards"][0], rows_s["next_states"][0], acfg))(lrn)
        np.testing.assert_allclose(float(loss1), float(loss2),
                                   rtol=1e-6, atol=1e-7, err_msg=impl)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=impl),
            l1.params, l2.params)


def test_gather_impl_scan_matches_gather():
    """The experimental scan-of-dynamic-slices sampler (engine.gather_impl
    = "scan"; built to dodge the batched gather's whole-ring operand copy,
    measured negative and kept behind the knob -- RESULTS round 5) must
    stay BIT-identical to the default batched gather."""
    from diral_tpu.train.loop import (make_train_functions,
                                      sample_window_rows_many)

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, engine=dataclasses.replace(cfg.engine, num_envs=3))
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(11))
    carry, _ = jax.jit(lambda c: jax.lax.scan(slot_step, c, jnp.arange(70)))(
        carry)
    keys = jnp.stack([jax.random.PRNGKey(41), jax.random.PRNGKey(42)])
    for wo in (False, True):
        a = jax.jit(lambda r, k: sample_window_rows_many(
            r, k, 16, 6, windows_only=wo, gather_impl="gather"))(
                carry.replay, keys)
        b = jax.jit(lambda r, k: sample_window_rows_many(
            r, k, 16, 6, windows_only=wo, gather_impl="scan"))(
                carry.replay, keys)
        for name in a:
            np.testing.assert_array_equal(np.asarray(a[name]),
                                          np.asarray(b[name]),
                                          err_msg=f"{name} wo={wo}")
