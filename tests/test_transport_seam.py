"""Transport-seam tests (VERDICT r2 #7): the bridge and the C++ simulator
run unchanged over either wire flavor -- framed TCP or REAL libzmq (the
reference's transport, realness_bridge.py:25-43,66-68).

The zmq flavor is exercised two ways: pure-Python (bridge's zmq REP bound
socket driven by a genuine pyzmq REQ peer, proving ZMTP compatibility with
what a real RealNeS-side zmq client speaks) and end-to-end (the C++ sim's
dlopen-libzmq path against the bridge, same seed as a framed run, asserting
the event streams are identical).
"""

import shutil
import threading

import numpy as np
import pytest

from diral_tpu.interop import ma_messages_pb2 as pb
from diral_tpu.interop.bridge import RealNeSBridge
from diral_tpu.interop.gateway_env import GatewayEnv

zmq = pytest.importorskip("zmq")
needs_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def test_unknown_transport_raises():
    from diral_tpu.interop.transport import make_rep_socket

    with pytest.raises(ValueError, match="unknown transport"):
        make_rep_socket(0, kind="carrier-pigeon")


def test_zmq_bridge_against_real_pyzmq_peer():
    """Bridge(transport='zmq') serves a genuine zmq.REQ peer: init
    handshake, request/grant cycle, and the reward collector (bridge REQ ->
    peer REP), mirroring the reference's socket roles exactly."""
    ctx = zmq.Context.instance()

    # reward collector peer (REP on a random port), realness_bridge.py:66-68
    collector = ctx.socket(zmq.REP)
    collector.setsockopt(zmq.LINGER, 0)
    reward_port = collector.bind_to_random_port("tcp://127.0.0.1")

    def serve_rewards():
        collector.recv()
        all_r = pb.MA_RewardSentAll()
        for u in range(3):
            r = all_r.all_rewards.add()
            r.user_id, r.SN, r.reward = u, 0, 0.25 * u
        collector.send(all_r.SerializeToString())

    bridge = RealNeSBridge(port=0, reward_port=reward_port,
                           reward_host="127.0.0.1", timeout=10.0,
                           transport="zmq")
    sim = ctx.socket(zmq.REQ)
    sim.setsockopt(zmq.LINGER, 0)
    sim.connect(f"tcp://127.0.0.1:{bridge.port}")
    try:
        # init handshake (realness_bridge.py:78-97)
        init = pb.MA_SimInitMsg(total_users=4, action_space=3,
                                state_space=3, state_space_type=2)
        sim.send(init.SerializeToString())
        bridge.initialize_env()
        ack = pb.MA_SimInitAck.FromString(sim.recv())
        assert not ack.done
        assert bridge.get_total_users() == 3  # total_users - 1 quirk

        # one request/grant cycle
        req = pb.MA_SchedulingRequestSyn(user_id=1, SN=5, reward=0.5)
        req.state.extend([1, 2, 3])
        sim.send(req.SerializeToString())
        uid, sn, state, reward = bridge.get_observation_syn()
        assert (uid, sn, reward) == (1, 5, 0.5)
        np.testing.assert_array_equal(state, [1, 2, 3])
        bridge.send_action(2)
        grant = pb.MA_SchedulingGrant.FromString(sim.recv())
        assert grant.time_stamp == 2 and not grant.stop_simulation

        # delayed-reward poll (realness_bridge.py:210-223)
        t = threading.Thread(target=serve_rewards)
        t.start()
        rewards = bridge.receive_rewards()
        t.join(timeout=10)
        assert [r.reward for r in rewards.all_rewards] == [0.0, 0.25, 0.5]
    finally:
        sim.close()
        collector.close()
        bridge.close()


def _run_session(transport: str, rounds: int = 3, seed: int = 11):
    """One short gateway session against the C++ sim; deterministic given
    (seed, action stream).  Returns the full event stream."""
    n_users, n_ch = 4, 3
    env = GatewayEnv(
        port=0, sim_start=True, sim_users=n_users, sim_channels=n_ch,
        sim_rounds=rounds, sim_seed=seed, state_design=2, pos_dist=2,
        state_bins=10, state_range=250, reward_design=2,
        sim_transport=transport,
    )
    events = []
    try:
        env.initialize_env()
        rng = np.random.RandomState(99)
        for _ in range(rounds * n_users):
            user_id, sn, state, reward, pos_x = env.get_observation_syn_dist()
            events.append((user_id, sn, tuple(np.asarray(state)), reward))
            env.apply_action(int(rng.randint(0, n_ch)))
        env.sim_process.wait(timeout=10)
        assert env.sim_process.returncode == 0
        env.sim_process = None
    finally:
        env.close()
    return events


@needs_gxx
def test_cpp_sim_over_zmq_matches_framed():
    """The C++ simulator's dlopen-libzmq transport: identical world seed and
    action stream must produce an event stream identical to the framed-TCP
    run -- the wire flavor is invisible to the protocol."""
    framed = _run_session("framed")
    over_zmq = _run_session("zmq")
    assert framed == over_zmq
    assert len(framed) == 12
