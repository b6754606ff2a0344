"""Agents: device-resident replay, exploration policies, and learners
(parameter-shared DQN / DRQN / PPO) plus the SPS scheduling baseline."""
