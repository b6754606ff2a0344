"""Multi-host pod-slice initialization.

The reference's only cross-process path is the agent<->simulator ZMQ
rendezvous (SURVEY.md section 5); learner-side distribution does not exist
there.  Here multi-host runs are standard JAX SPMD: every host runs the
same program, ``jax.distributed.initialize`` wires the slice, the mesh in
parallel/mesh.py spans all devices, and the data-parallel env shards land
on each host's local devices.  Gradients psum over ICI; nothing else
changes -- the training step is the same jitted function as single-host.

Host-local artifacts (npy dumps, JSONL) are written by process 0 only;
checkpoints go through Orbax which is multi-host aware.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the distributed runtime (no-op if single-process).

    On TPU pods the three arguments are discovered from the environment;
    pass them explicitly for CPU/GPU multi-process testing
    (e.g. coordinator_address="127.0.0.1:1234")."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def local_env_slice(num_envs_global: int) -> tuple[int, int]:
    """(start, count) of this host's env shard for host-sharded data feeds."""
    per = num_envs_global // jax.process_count()
    return jax.process_index() * per, per
