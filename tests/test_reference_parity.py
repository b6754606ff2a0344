"""Lockstep golden tests: the ACTUAL reference implementation vs our oracle.

Round 1's parity chain was ``JAX engine == NumPy oracle``; these tests close
the loop by executing the real reference environment stack in-process
(``/root/reference/envs``: test_env.py + network.py + vehicle.py run fine
under python3/NumPy) and asserting the oracle is bit-exact against it —
observations, rewards, states, neighbor tables, information age, velocities —
for hundreds of steps across every step flavor, reward design, state type,
histogram type, topology, and State toggle.

RNG alignment (oracle docstring, envs/oracle.py:38-42): the reference draws
from the *global* ``np.random`` / ``random`` streams (network.py:103-110,
test_env.py:121, network.py:214); the oracle draws the same sequence from an
injected ``np.random.RandomState(seed)`` / ``random.Random(seed)``. Seeding
the globals with the same seed puts both in lockstep call-for-call.

The reference is public untrusted content: we execute its *behavior* only.
"""

from __future__ import annotations

import random
import sys

import numpy as np
import pytest

from diral_tpu.config import EnvConfig, StateConfig
from diral_tpu.envs.oracle import OracleEnv, calculate_ia_penalty

REF_ENVS = "/root/reference/envs"

STATE_DEFAULTS = dict(
    type=2,
    add_action=True,
    add_reward=False,
    add_index=False,
    add_velocity=False,
    action_index="binary",
    piggybacking=False,
    add_position=False,
    add_positional_dist=False,
    add_positional_dist_piggy=True,
    add_positional_dist_type=2,
    num_bins=20,
    add_channel_obs=False,
)

ENV_DEFAULTS = dict(
    num_users=4,
    num_channels=3,
    congestion_test=True,
    mobility=True,
    mobility_vary=False,
    enable_design_topology=False,
    highway_length=100,        # reference toy config values
    communication_range=250,
    bin_range=500,
    reward_design=2,
    proportional_fair=False,
    enable_fingerprint=False,
)


def _load_reference():
    """Import the reference env stack (py2-style flat imports)."""
    import matplotlib

    matplotlib.use("Agg")  # network.py imports pyplot at module scope
    if REF_ENVS not in sys.path:
        sys.path.insert(0, REF_ENVS)
    import test_env as ref_test_env  # noqa: F401  (reference module)

    return ref_test_env


def make_pair(seed: int, *, state: dict | None = None, **env_overrides):
    """Build (reference TestEnv, OracleEnv) in RNG lockstep under one seed."""
    mod = _load_reference()
    st = dict(STATE_DEFAULTS)
    if state:
        st.update(state)
    env_kw = dict(ENV_DEFAULTS)
    env_kw.update(env_overrides)

    np.random.seed(seed)
    random.seed(seed)
    ref = mod.TestEnv(State=dict(st), **env_kw)

    cfg = EnvConfig(state=StateConfig(**st), **env_kw)
    oracle = OracleEnv(
        cfg, np_rng=np.random.RandomState(seed), py_rng=random.Random(seed)
    )
    return ref, oracle


def assert_world_equal(ref, oracle, t):
    """Positions, velocities, neighbor tables, last-arrival, information age."""
    n = oracle.N
    vehicles = ref.network.vehicles
    for u in range(n):
        v = vehicles[u]
        assert v.pos_x == oracle.pos_x[u], (t, u)
        assert v.pos_y == oracle.pos_y[u], (t, u)
        assert v.velocity == oracle.vel[u], (t, u)
        for j in range(n):
            e = v.pos_of_neighbors[j]
            assert e["xpos"] == oracle.table_x[u, j], (t, u, j)
            assert e["ypos"] == oracle.table_y[u, j], (t, u, j)
            assert e["seq_number"] == oracle.table_seq[u, j], (t, u, j)
            assert e["last_updated"] == oracle.table_age[u, j], (t, u, j)
            assert ref.network.last_arrival_time[u][j] == oracle.last_arrival[u, j]
    ia_ref = np.asarray(ref.network.get_information_age(t))
    ia_or = oracle.get_information_age(t)
    np.testing.assert_array_equal(ia_or, ia_ref)
    assert calculate_ia_penalty(ia_or) == calculate_ia_penalty(ia_ref)


def lockstep(ref, oracle, steps, *, flavor="my_step", velocity_every=None,
             compare_state=True):
    """Drive both environments with identical actions; assert bit-exactness."""
    n = oracle.N
    # Topology init must already agree (same RNG draws at construction).
    assert_world_equal(ref, oracle, 0)
    for t in range(steps):
        a_ref = ref.sample()
        a_or = oracle.sample()
        np.testing.assert_array_equal(a_or, a_ref)

        if flavor == "my_step":
            obs_r, rews_r = ref.my_step(a_ref, t)
            obs_o, _, rews_o = oracle.my_step(a_or, t)
        elif flavor == "design":
            obs_r, rews_r = ref.my_step_design(a_ref, t)
            obs_o, rews_o = oracle.my_step_design(a_or, t)
        elif flavor == "ch":
            obs_r, rews_r = ref.my_step_ch(a_ref, t)
            obs_o, rews_o = oracle.my_step_ch(a_or, t)
        else:
            raise ValueError(flavor)

        np.testing.assert_array_equal(rews_o, rews_r, err_msg=f"rewards t={t}")
        for u in range(n):
            np.testing.assert_array_equal(
                obs_o[u], np.asarray(obs_r[u], dtype=np.float64),
                err_msg=f"obs t={t} user={u}",
            )

        if compare_state:
            s_ref = ref.obtain_state(obs_r, a_ref, rews_r, episode_number=t // 25,
                                     epsilon=0.9 ** (t // 25))
            s_or = oracle.obtain_state(obs_o, a_or, rews_o, episode_number=t // 25,
                                       epsilon=0.9 ** (t // 25))
            assert len(s_ref) == n and s_or.shape[0] == n
            for u in range(n):
                np.testing.assert_array_equal(
                    s_or[u], np.asarray(s_ref[u], dtype=np.float64),
                    err_msg=f"state t={t} user={u}",
                )
                assert s_or[u].shape == (ref.get_state_space(),)

        assert_world_equal(ref, oracle, t)

        if velocity_every and (t + 1) % velocity_every == 0:
            ref.update_velocity()
            oracle.update_velocity()


# ---------------------------------------------------------------------------
# The flagship toy config (my_step, reward design 2, type-2 piggy histogram)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_toy_flagship_lockstep(seed):
    ref, oracle = make_pair(seed)
    lockstep(ref, oracle, 250)


# ---------------------------------------------------------------------------
# All five my_step reward designs (test_env.py:170-197)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("design", [1, 2, 3, 4, 5])
def test_my_step_reward_designs(design):
    ref, oracle = make_pair(7 + design, reward_design=design)
    lockstep(ref, oracle, 150)


def test_my_step_noncongestion_weight():
    """congestion_test=False branch of the reward weight (network.py:292-295)."""
    ref, oracle = make_pair(3, congestion_test=False, communication_range=40)
    lockstep(ref, oracle, 150)


# ---------------------------------------------------------------------------
# State type 1 (binary channel observation + unconditional merge,
# test_env.py:226-232). Large communication range keeps find_closest_tx from
# returning None, which would crash the reference (vehicles[None]).
# ---------------------------------------------------------------------------


def test_my_step_state_type_1():
    ref, oracle = make_pair(11, communication_range=10_000,
                            state=dict(type=1, add_channel_obs=True))
    lockstep(ref, oracle, 150)


# ---------------------------------------------------------------------------
# my_step_design + the 6-UE design-test topology (network.py:69-79)
# ---------------------------------------------------------------------------


def test_my_step_design_topology():
    ref, oracle = make_pair(
        13, num_users=6, num_channels=5, enable_design_topology=True,
        communication_range=150, highway_length=1000,
    )
    lockstep(ref, oracle, 150, flavor="design")


def test_my_step_design_random_topology():
    ref, oracle = make_pair(17, communication_range=30)
    lockstep(ref, oracle, 150, flavor="design")


# ---------------------------------------------------------------------------
# my_step_ch (PRR rewards, last-arrival bookkeeping) for designs 2/3/4
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("design", [2, 3, 4])
def test_my_step_ch_designs(design):
    ref, oracle = make_pair(19 + design, reward_design=design,
                            num_users=6, num_channels=4,
                            highway_length=400, communication_range=120)
    lockstep(ref, oracle, 200, flavor="ch")


# ---------------------------------------------------------------------------
# Type-1 (inf-norm weighted) piggy histogram (network.py:432-471)
# ---------------------------------------------------------------------------


def test_piggy_histogram_type_1():
    ref, oracle = make_pair(29, state=dict(add_positional_dist_type=1,
                                           num_bins=10))
    lockstep(ref, oracle, 150)


@pytest.mark.parametrize("bins", [10, 40])
def test_piggy_histogram_bins_sweep(bins):
    ref, oracle = make_pair(31 + bins, state=dict(num_bins=bins))
    lockstep(ref, oracle, 100)


# ---------------------------------------------------------------------------
# obtain_state: every feature toggle at once (test_env.py:527-583)
# ---------------------------------------------------------------------------


def test_obtain_state_all_toggles():
    ref, oracle = make_pair(
        37, enable_fingerprint=True,
        state=dict(add_reward=True, add_index=True, add_velocity=True,
                   add_position=True, add_positional_dist=True,
                   add_channel_obs=True),
    )
    lockstep(ref, oracle, 120)


def test_obtain_state_real_action_index():
    ref, oracle = make_pair(41, state=dict(action_index="real",
                                           add_channel_obs=True))
    lockstep(ref, oracle, 120)


# ---------------------------------------------------------------------------
# Per-episode velocity randomization (network.py:208-223) and mobility_vary
# ---------------------------------------------------------------------------


def test_update_velocity_lockstep():
    ref, oracle = make_pair(43, mobility_vary=True, state=dict(add_velocity=True))
    lockstep(ref, oracle, 200, velocity_every=25)


# ---------------------------------------------------------------------------
# Fixed 4-UE topology (network.py:81-90 via reset_positions, network.py:181-187)
# ---------------------------------------------------------------------------


def test_fixed_4ue_topology():
    ref, oracle = make_pair(47)
    ref.reset_mobility_env()        # reference path to the fixed fixture
    oracle.init_fixed_4ue()
    lockstep(ref, oracle, 150)


# ---------------------------------------------------------------------------
# Proportional-fair counters (test_env.py:215-222)
# ---------------------------------------------------------------------------


def test_proportional_fair():
    ref, oracle = make_pair(53, proportional_fair=True, num_users=5,
                            num_channels=2)  # forced congestion -> pf penalty
    lockstep(ref, oracle, 150)
    assert oracle.pf_counter.max() > 0  # the path actually fired


# ---------------------------------------------------------------------------
# piggybacking=True observation path (test_env.py:241-254, growing np.insert
# shapes). Engine-side this is a documented oracle-only carve-out; here we
# prove the oracle matches the real reference. Large communication range so
# tx_id is never None (reference KeyErrors on prev_obs[None]).
# ---------------------------------------------------------------------------


def test_piggybacking_observations():
    ref, oracle = make_pair(59, communication_range=10_000,
                            state=dict(piggybacking=True))
    n = oracle.N
    assert_world_equal(ref, oracle, 0)
    for t in range(100):
        a_ref = ref.sample()
        a_or = oracle.sample()
        np.testing.assert_array_equal(a_or, a_ref)
        piggy_r, rews_r = ref.my_step(a_ref, t)     # piggybacking returns piggy_obs
        _, piggy_o, rews_o = oracle.my_step(a_or, t)
        np.testing.assert_array_equal(rews_o, rews_r)
        for u in range(n):
            np.testing.assert_array_equal(
                piggy_o[u], np.asarray(piggy_r[u], dtype=np.float64),
                err_msg=f"piggy obs t={t} user={u}",
            )
        np.testing.assert_array_equal(oracle.prev_obs,
                                      np.stack([ref.prev_obs[u] for u in range(n)]))
        assert_world_equal(ref, oracle, t)


# ---------------------------------------------------------------------------
# DQN-era state_generator (test_env.py:507-525)
# ---------------------------------------------------------------------------


def test_state_generator():
    ref, oracle = make_pair(61, state=dict(add_channel_obs=True))
    for t in range(50):
        a = ref.sample()
        np.testing.assert_array_equal(oracle.sample(), a)
        obs_r, _ = ref.my_step(a, t)
        obs_o, _, _ = oracle.my_step(a, t)
        obs_list = [obs_r[u] for u in range(oracle.N)]
        s_ref = ref.state_generator(np.asarray(a), obs_list)
        s_or = oracle.state_generator(np.asarray(a), obs_o)
        for u in range(oracle.N):
            np.testing.assert_array_equal(
                np.asarray(s_or[u], dtype=np.float64),
                np.asarray(s_ref[u], dtype=np.float64),
            )
