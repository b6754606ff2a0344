"""diral-tpu: a TPU-native multi-agent RL framework for distributed V2V resource allocation.

Re-implements, TPU-first, the capabilities of the DIRAL reference
(distributed resource allocation for 5G-V2V via parameter-shared deep RL,
reference: /root/reference, paper arXiv:2010.05290):

- a vectorized V2V resource-selection environment (vehicle mobility,
  view-based positional-distribution observations, collision / PRR rewards)
  as pure-JAX ``reset``/``step`` functions stepping thousands of env
  instances in lockstep under ``jit``;
- on-device actor-learner loops for parameter-shared Double-DQN, DRQN
  (LSTM/GRU) and PPO, with device-resident replay and target networks;
- multi-chip scale-out via ``jax.sharding`` meshes (envs sharded over
  devices/hosts, gradients psum-reduced over ICI);
- the 5G SPS baseline and an evaluation harness for the DIRAL-vs-SPS
  PRR comparison.

Layout:
    diral_tpu.config    -- typed config, reference-YAML compatible loader
    diral_tpu.envs      -- NumPy oracle + batched JAX env engine
    diral_tpu.ops       -- histogram / distance / RNG building blocks (+ pallas)
    diral_tpu.models    -- Q-networks (MLP, dueling, LSTM, GRU), actor-critic
    diral_tpu.agents    -- replay, exploration policies, DQN/DRQN/PPO learners, SPS
    diral_tpu.parallel  -- mesh construction and sharding strategies
    diral_tpu.train     -- jitted training loops, checkpointing, metrics, CLI
    diral_tpu.interop   -- external-simulator gateway (wire protocol compatible)
"""

__version__ = "0.1.0"
