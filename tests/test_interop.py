"""End-to-end interop tests: the C++ toy-RealNeS stand-in driving the
Python bridge over the framed-TCP protobuf protocol (reference L0,
envs/realness_bridge.py + the absent external simulator -- here present)."""

import shutil

import numpy as np
import pytest

from diral_tpu.interop import ma_messages_pb2 as pb
from diral_tpu.interop.gateway_env import (
    GatewayEnv,
    neighbor_dist_type2,
    prr_to_reward,
)

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def test_proto_roundtrip_wire_numbers():
    """Field numbers must match the reference descriptor so a real RealNeS
    peer interoperates (envs/ma_messages_pb2.py serialized_pb)."""
    req = pb.MA_SchedulingRequestSynDist(user_id=3, SN=17, reward=0.5)
    e = req.neighbor.add()
    e.pos_x, e.pos_y, e.seq_num, e.last_update = 1.0, 2.0, 5, 0
    data = req.SerializeToString()
    back = pb.MA_SchedulingRequestSynDist.FromString(data)
    assert back.user_id == 3 and back.SN == 17
    assert back.neighbor[0].seq_num == 5
    # spot-check wire tags: field 1 varint (0x08), field 2 length-delim (0x12)
    assert data[0] == 0x08
    grant = pb.MA_SchedulingGrant(time_stamp=2, stop_simulation=False)
    assert pb.MA_SchedulingGrant.FromString(grant.SerializeToString()).time_stamp == 2


def test_prr_reward_mapping():
    assert prr_to_reward(1.0, 2) == 1.0
    np.testing.assert_allclose(prr_to_reward(0.5, 2), -0.5)
    np.testing.assert_allclose(prr_to_reward(0.5, 3), -np.exp(0.5))
    np.testing.assert_allclose(prr_to_reward(0.96, 4), np.exp(0.96))


@needs_gxx
def test_gateway_end_to_end():
    """Launch the C++ simulator, serve 3 full rounds of scheduling requests
    with random actions, check the event stream and state assembly."""
    rounds = 3
    n_users, n_ch = 4, 3
    env = GatewayEnv(
        port=0, sim_start=True, sim_users=n_users, sim_channels=n_ch,
        sim_rounds=rounds, sim_seed=7, state_design=2, pos_dist=2,
        state_bins=10, state_range=250, reward_design=2,
    )
    try:
        env.initialize_env()
        assert env.get_total_users() == n_users  # sim advertises n+1, bridge -1
        assert env.get_action_space() == n_ch
        assert env.get_state_space() == n_ch + 10

        rng = np.random.RandomState(0)
        seen = []
        rewards_seen = []
        for r in range(rounds):
            for _ in range(n_users):
                user_id, sn, state, reward, pos_x = env.get_observation_syn_dist()
                assert sn == r
                assert state.shape == (10,)
                seen.append((sn, user_id))
                rewards_seen.append(reward)
                env.apply_action(int(rng.randint(0, n_ch)))
        # every user served every round
        assert len(seen) == rounds * n_users
        # round-2 rewards reflect round-1 outcomes: in design 2 they live in
        # [-1, 1] (PRR-based) -- all values must be in range
        assert all(-1.0 <= rw <= 1.0 for rw in rewards_seen)
        env.sim_process.wait(timeout=10)
        assert env.sim_process.returncode == 0
        env.sim_process = None
    finally:
        env.close()


@needs_gxx
def test_gateway_stop_simulation():
    """A stop grant terminates the simulator mid-run (restart_env path,
    realness_bridge.py:228-240)."""
    env = GatewayEnv(port=0, sim_start=True, sim_users=3, sim_channels=3,
                     sim_rounds=1000, state_design=2, state_bins=10)
    try:
        env.initialize_env()
        user_id, sn, state, reward, _ = env.get_observation_syn_dist()
        env.apply_action(0)
        env.bridge.restart_env()  # answers next request with stop_simulation
        env.sim_process.wait(timeout=10)
        assert env.sim_process.returncode == 0
        env.sim_process = None
    finally:
        env.close()


@needs_gxx
def test_reward_collector():
    env = GatewayEnv(port=0, sim_start=True, sim_users=3, sim_channels=3,
                     sim_rounds=50, sim_reward_port=0 or 15557,
                     state_design=2, state_bins=10)
    try:
        env.initialize_env()
        # serve one round so rewards exist
        for _ in range(3):
            env.get_observation_syn_dist()
            env.apply_action(0)
        rews, values = env.receive_rewards()
        assert len(values) == 3
        # release the collector connection so the sim can join its thread
        env.bridge.socket_rewards.close()
        env.bridge.socket_rewards = None
        env.bridge.restart_env()
        env.sim_process.wait(timeout=10)
        env.sim_process = None
    finally:
        env.close()


def test_neighbor_dist_matches_env_histogram():
    """The gateway's table->histogram must agree with the in-process env's
    (both reproduce network.py:473-513 / realness_env.py:87-118)."""
    table = {
        0: {"xpos": 0.0, "ypos": 0.0, "seq_number": 1, "last_updated": 0},
        1: {"xpos": 30.0, "ypos": 0.0, "seq_number": 1, "last_updated": 0},
        2: {"xpos": -50.0, "ypos": 0.0, "seq_number": 1, "last_updated": 25},
        3: {"xpos": 10.0, "ypos": 0.0, "seq_number": 1, "last_updated": 3},
    }
    h = neighbor_dist_type2(0, table, bins=10, state_range=250)
    # entries: user1 at +30, user3 at +10 (user2 stale) -> 2 entries, both in
    # the bin covering (0, 50]
    assert h.sum() == 1.0
    assert h[5] == 1.0  # bins of width 50 over [-250, 250]: (0, 50] is index 5
