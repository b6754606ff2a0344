"""One process of a 2-process ``jax.distributed`` training run.

Spawned by tests/test_distributed.py (twice, with --process-id 0/1).
Each process owns 4 fake CPU devices; ``jax.distributed.initialize``
(via diral_tpu.parallel.distributed.initialize) wires them into one
8-device slice, and the sharded train step runs SPMD across both
processes with gradients psum'd over the cross-process "data" axis —
exactly the multi-host path a TPU pod slice uses (SURVEY.md section 5,
distributed-backend row).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# 8 global devices regardless of process count (8/N per process).
# Overwrite (not setdefault): the spawning pytest run exports its own
# 8-device XLA_FLAGS.
_NPROC = 1
for _i, _a in enumerate(sys.argv):
    if _a == "--num-processes":
        _NPROC = int(sys.argv[_i + 1])
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // _NPROC}")

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="TP axis size; data axis spans 8/model devices")
    ap.add_argument("--out", required=True, help="npz path (process 0 writes)")
    args = ap.parse_args()

    from diral_tpu.parallel.distributed import initialize, is_primary

    initialize(coordinator_address=args.coordinator,
               num_processes=args.num_processes,
               process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 8 // args.num_processes

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diral_tpu.parallel.mesh import make_mesh
    from diral_tpu.train.loop import make_train_functions
    from diral_tpu.train.runner import make_chunk_runner
    from tests.test_sharding import tiny_cfg

    cfg = tiny_cfg(num_envs=8)
    init_carry, slot_step, _ = make_train_functions(cfg, jnp.float32)
    # spans all 8 global devices across all processes; with
    # --model-parallel 2 the mesh is data=4 x model=2 (the TP axis lives
    # inside each process, the data axis crosses the process boundary)
    mesh = make_mesh(model_parallel=args.model_parallel)
    repl = NamedSharding(mesh, P())

    shapes = jax.eval_shape(init_carry, jax.random.PRNGKey(0))
    run_chunk, sh = make_chunk_runner(slot_step, mesh, shapes)
    key = jax.device_put(jax.random.PRNGKey(0), repl)
    carry = jax.jit(init_carry, out_shardings=sh)(key)

    t0 = jax.device_put(jnp.asarray(49), repl)
    carry, logs = run_chunk(carry, t0, 16)
    jax.block_until_ready(carry)

    if is_primary():
        # logs are replicated (make_chunk_runner contract) and params are
        # data-replicated -> both fully addressable on process 0
        params = carry.learner.params
        np.savez(
            args.out,
            sum_reward=np.asarray(logs["sum_reward"]),
            lstm_w=np.asarray(params["lstm"]["w"]),
        )
    print(f"worker {args.process_id} ok", flush=True)


if __name__ == "__main__":
    main()
