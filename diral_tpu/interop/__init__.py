"""External-simulator interop: the agent<->network-simulator process
boundary (reference L0, envs/realness_bridge.py + envs/ma_messages_pb2.py).

The reference speaks protobuf over ZMQ REQ/REP to an out-of-repo C++
RealNeS simulator (absent; the driver hard-disables the path,
main_test.py:291-293).  Here the capability is complete and in-repo:

* ``ma_messages.proto`` -- wire-compatible schema (same field numbers);
* ``transport`` -- REQ/REP-pattern framed TCP sockets (no libzmq
  dependency in this image; a real-ZMQ peer needs only the framing shim);
* ``bridge`` -- the Python agent-side bridge, API-compatible with the
  reference ``RealNeSZmqBridge``;
* ``gateway_env`` -- the RealnessEnv equivalent (state assembly from
  piggybacked neighbor tables, PRR reward mapping);
* ``cpp/realnes_sim.cc`` -- a C++ discrete-event toy-RealNeS stand-in
  speaking the same protocol, so the external-sim path is exercisable
  end-to-end in-repo (the reference never could).

All of this is off the training hot path by design: the TPU path is the
batched pure-JAX env; the gateway exists for external-simulator parity.
"""
