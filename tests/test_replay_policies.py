"""Replay-buffer and exploration-policy semantics (SURVEY.md section 4c).

Replay checks run against a straightforward Python deque model of the
reference ``Memory`` (utils/memory.py:162-194) and ``ReplayBuffer``
(utils/memory.py:120-159).
"""

from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.agents import policies as P
from diral_tpu.agents.replay import TransitionReplay, WindowReplay


def test_window_replay_deque_semantics():
    """Ring contents in deque order must match a maxlen deque."""
    cap = 8
    buf = WindowReplay.create(cap, state_shape=(2,), action_shape=(), reward_shape=())
    model = deque(maxlen=cap)
    for i in range(20):
        s = jnp.asarray([i, i + 0.5])
        buf = buf.add(s, jnp.asarray(i), jnp.asarray(float(i)), s + 1)
        model.append(i)
        # deque order read-back
        idx = buf._ring_index(jnp.arange(int(buf.count)))
        got = np.asarray(buf.actions[idx])
        np.testing.assert_array_equal(got, np.array(model))


def test_window_sampler_contiguous_and_distinct():
    cap, step, batch = 64, 6, 16
    buf = WindowReplay.create(cap, state_shape=(1,), action_shape=(), reward_shape=())
    for i in range(50):
        buf = buf.add(jnp.asarray([float(i)]), jnp.asarray(i), jnp.asarray(0.0),
                      jnp.asarray([float(i + 1)]))
    out = buf.sample_windows(jax.random.PRNGKey(0), batch, step)
    acts = np.asarray(out["actions"])  # [batch, step]
    # windows are contiguous runs
    np.testing.assert_array_equal(np.diff(acts, axis=1), np.ones((batch, step - 1)))
    # starts are distinct (without replacement) and inside [0, count - step)
    starts = acts[:, 0]
    assert len(set(starts.tolist())) == batch
    assert starts.min() >= 0 and starts.max() < 50 - step
    # states/next_states aligned with actions
    np.testing.assert_array_equal(np.asarray(out["states"])[:, :, 0], acts)
    np.testing.assert_array_equal(np.asarray(out["next_states"])[:, :, 0], acts + 1)


def test_window_sampler_uniformity():
    """Start positions should cover the valid range roughly uniformly."""
    cap, step = 32, 4
    buf = WindowReplay.create(cap, state_shape=(1,), action_shape=(), reward_shape=())
    for i in range(cap):
        buf = buf.add(jnp.asarray([0.0]), jnp.asarray(i), jnp.asarray(0.0),
                      jnp.asarray([0.0]))
    counts = np.zeros(cap)
    for s in range(200):
        out = buf.sample_windows(jax.random.PRNGKey(s), 8, step)
        for a in np.asarray(out["actions"])[:, 0]:
            counts[a] += 1
    assert counts[: cap - step].min() > 0
    assert counts[cap - step:].sum() == 0  # never start inside the tail


def test_transition_replay_wraparound():
    """put with wraparound mirrors memory.py:127-145 data placement.

    Note: the reference sets ``head = split`` after a wrapping put
    (memory.py:144), a bug that makes the next put clobber fresh data; our
    ring advances head correctly (documented deviation in replay.py)."""
    buf = TransitionReplay.create(10, state_dim=1)
    ref = np.zeros((10, 1))
    head = 0
    for chunk in ([3, 4, 5], [6, 7, 8, 9], [10, 11, 12, 13, 14]):
        data = np.array(chunk, dtype=np.float32)[:, None]
        n = len(data)
        for row in data:  # correct ring semantics
            ref[head] = row
            head = (head + 1) % 10
        buf = buf.put(jnp.asarray(data), jnp.zeros(n, jnp.int32),
                      jnp.zeros(n), jnp.zeros(n, bool), jnp.ones(n))
        np.testing.assert_array_equal(np.asarray(buf.states), ref)
        assert int(buf.head) == head


def test_transition_replay_next_state_alignment():
    buf = TransitionReplay.create(32, state_dim=1)
    data = np.arange(20, dtype=np.float32)[:, None]
    buf = buf.put(jnp.asarray(data), jnp.arange(20, dtype=jnp.int32),
                  jnp.zeros(20), jnp.zeros(20, bool), jnp.ones(20))
    out = buf.sample(jax.random.PRNGKey(1), 64)
    np.testing.assert_array_equal(
        np.asarray(out["next_states"])[:, 0], np.asarray(out["states"])[:, 0] + 1
    )


def test_eps_greedy_schedule():
    """eps *= decay once per episode advance, floored at 0.001
    (policies.py:45-63)."""
    st = P.eps_greedy_init(0.99)
    st = P.eps_greedy_update(st, jnp.asarray(0), 0.9)
    np.testing.assert_allclose(float(st.eps), 0.99, rtol=1e-6)  # no episode advance
    st = P.eps_greedy_update(st, jnp.asarray(1), 0.9)
    np.testing.assert_allclose(float(st.eps), 0.99 * 0.9, rtol=1e-6)
    st = P.eps_greedy_update(st, jnp.asarray(1), 0.9)
    np.testing.assert_allclose(float(st.eps), 0.99 * 0.9, rtol=1e-6)  # same episode
    for e in range(2, 3000):
        st = P.eps_greedy_update(st, jnp.asarray(e), 0.9)
    assert abs(float(st.eps) - 0.001) < 1e-9  # floor


def test_eps_greedy_action_extremes():
    q = jnp.asarray([[0.0, 5.0, 1.0]] * 4)
    greedy = P.eps_greedy_action(jax.random.PRNGKey(0), q, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(greedy), [1, 1, 1, 1])
    # eps=1: uniform over actions
    acts = [np.asarray(P.eps_greedy_action(jax.random.PRNGKey(s), q, jnp.asarray(1.0)))
            for s in range(200)]
    assert len(np.unique(np.concatenate(acts))) == 3


def test_softmax_schedule_matches_reference_formula():
    sched = P.softmax_temperature_schedule(0.05, 1000)
    warm = int(1000 * 2 / 3)
    np.testing.assert_allclose(sched[:warm], np.geomspace(1.0, 0.05, warm), rtol=1e-5)
    np.testing.assert_allclose(sched[warm:], 0.05, rtol=1e-6)
    # out-of-range episode falls back to base temperature
    _, t = P.softmax_action(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                            jnp.asarray(sched), jnp.asarray(5000), 0.05)
    np.testing.assert_allclose(float(t), 0.05, rtol=1e-6)


def test_boltzman_beta_anneal():
    st = P.boltzman_init(1.0)
    st = P.boltzman_update(st, jnp.asarray(0))
    np.testing.assert_allclose(float(st.beta), 0.999, rtol=1e-6)
    st = P.boltzman_update(st, jnp.asarray(49))
    np.testing.assert_allclose(float(st.beta), 0.999, rtol=1e-6)
    st = P.boltzman_update(st, jnp.asarray(6000))  # past the anneal horizon
    np.testing.assert_allclose(float(st.beta), 0.999, rtol=1e-6)


def test_driver_mode_switch():
    q = jnp.asarray([[0.0, 9.0, 1.0]] * 3)
    st = P.eps_greedy_init(1.0)  # fully exploratory policy
    # after greedy_after the action must be argmax regardless of eps
    a = P.driver_mode_actions(jax.random.PRNGKey(0), q, st,
                              jnp.asarray(250000), 2000, 200000)
    np.testing.assert_array_equal(np.asarray(a), [1, 1, 1])


def test_window_replay_save_load_roundtrip(tmp_path):
    """The reference exposed the replay buffer as a user-facing pickle
    artifact (Memory.save, utils/memory.py:196-205; its load is stubbed
    out).  save -> load must reproduce the exact deque contents and
    sampling behavior, including across a ring wraparound."""
    r = WindowReplay.create(8, (3,), (), (), jnp.float32)
    for i in range(11):  # wraps: 11 adds into capacity 8
        r = r.add(jnp.full((3,), i, jnp.float32), i, float(i) / 2,
                  jnp.full((3,), i + 1, jnp.float32))
    p = str(tmp_path / "replay.pkl")
    r.save(p)
    r2 = WindowReplay.load(p)
    key = jax.random.PRNGKey(5)
    a = r.sample_windows(key, batch=4, step=2)
    b = r2.sample_windows(key, batch=4, step=2)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # deque order preserved: oldest element is add #3 (8-slot ring, 11 adds)
    import pickle
    with open(p, "rb") as f:
        dump = pickle.load(f)
    np.testing.assert_array_equal(dump["states"][0], np.full(3, 3.0))
    np.testing.assert_array_equal(dump["states"][-1], np.full(3, 10.0))


def test_window_replay_save_load_batched(tmp_path):
    """Batched (vmapped) replay dumps keep the env axis and reload into a
    working batched buffer (lockstep pointers)."""
    B = 4
    r = jax.vmap(lambda _: WindowReplay.create(6, (2,), (), ()))(jnp.arange(B))
    for i in range(5):
        r = WindowReplay.add_lockstep(
            r, jnp.tile(jnp.asarray([[i, i + 10.0]]), (B, 1))
            + jnp.arange(B)[:, None] * 100,
            jnp.full((B,), i, jnp.int32), jnp.full((B,), 0.5), 
            jnp.zeros((B, 2)))
    p = str(tmp_path / "replay_b.pkl")
    r.save(p)
    r2 = WindowReplay.load(p)
    np.testing.assert_array_equal(np.asarray(r2.count), np.asarray(r.count))
    np.testing.assert_array_equal(np.asarray(r2.ptr), np.asarray(r.ptr))
    # per-env contents distinct and preserved
    np.testing.assert_array_equal(np.asarray(r2.states[:, :5]),
                                  np.asarray(r.states[:, :5]))
    # loading into a larger capacity keeps the deque and resets the ring
    r3 = WindowReplay.load(p, capacity=12)
    assert r3.states.shape[1] == 12
    np.testing.assert_array_equal(np.asarray(r3.states[:, :5]),
                                  np.asarray(r.states[:, :5]))


def test_fused_replay_save_to_window_dump(tmp_path):
    """FusedWindowReplay.save writes the same v1 pickle artifact the split
    buffer produces (the reference's Memory.save surface) -- count-1
    COMPLETE transitions in deque order, next_states derived from the
    chain -- and WindowReplay.load reconstructs a working buffer from it,
    including across a ring wraparound."""
    from diral_tpu.agents.replay import FusedWindowReplay

    B, N, D, cap = 3, 2, 4, 8
    r = jax.vmap(lambda _: FusedWindowReplay.create(cap, N, D))(jnp.arange(B))
    # unbroken chain: the state added at step i+1 is step i's next_state
    mk = lambda i: (jnp.arange(B * N * D, dtype=jnp.float32)
                    .reshape(B, N, D) + 1000.0 * i)
    for i in range(11):  # wraps: 11 adds into capacity 8
        r = FusedWindowReplay.add_lockstep(
            r, mk(i), jnp.full((B, N), i % 3, jnp.int32),
            jnp.full((B, N), i / 2.0))
    p = str(tmp_path / "fused.pkl")
    r.save(p)
    r2 = WindowReplay.load(p)
    # 8 (s, a, r) rows held -> 7 complete transitions: adds #3..#9
    assert int(np.asarray(r2.count)[0]) == 7
    np.testing.assert_array_equal(np.asarray(r2.states[:, 0]),
                                  np.asarray(mk(3)))
    np.testing.assert_array_equal(np.asarray(r2.states[:, 6]),
                                  np.asarray(mk(9)))
    # chain-derived next_states: one add later
    np.testing.assert_array_equal(np.asarray(r2.next_states[:, 0]),
                                  np.asarray(mk(4)))
    np.testing.assert_array_equal(np.asarray(r2.next_states[:, 6]),
                                  np.asarray(mk(10)))
    np.testing.assert_array_equal(
        np.asarray(r2.actions[:, 5]), np.full((B, N), 8 % 3, np.int32))
    np.testing.assert_array_equal(
        np.asarray(r2.rewards[:, 5]), np.full((B, N), 4.0, np.float32))
