"""Device-mesh construction and sharding strategies (DP over envs, optional
TP over hidden dims); the reference is single-process/single-device
(drl_drqn.py:91-94) -- scale-out here is jax.sharding + GSPMD collectives."""

from diral_tpu.parallel.mesh import (
    make_mesh,
    carry_shardings,
    learner_shardings,
    shard_carry,
)
