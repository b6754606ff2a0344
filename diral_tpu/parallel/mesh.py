"""Mesh + sharding layout for the actor-learner.

Strategy (SURVEY.md section 2 parallelism table):

* **DP ("data" axis)**: env instances shard over devices -- every per-env
  carry array (EnvState, history, replay ring, shaping counters) is
  partitioned on its leading env axis.  The learner sees experience from
  all shards; GSPMD inserts the all-gather on the cross-env window sample
  and the psum on gradients.
* **TP ("model" axis, optional)**: Q-network hidden dims shard over a
  second mesh axis.  The DIRAL nets are small (256 units), so TP exists as
  a first-class seam (and is exercised by the multichip dry run) rather
  than a perf necessity; replicated params are the default.
* PP/EP: N/A at these model sizes (documented in SURVEY.md); time/sequence
  scaling is the lax.scan axis, not attention parallelism.

Centralized training / decentralized execution is preserved under sharding:
the shared policy is vmapped over the agent axis inside each env shard.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mesh_from_spec(spec: str) -> Mesh:
    """Parse a CLI mesh spec: ``"data=8"`` or ``"data=4,model=2"``.

    The production surface of the parallelism layer: ``python -m diral_tpu
    train --mesh data=8`` routes through here.  Axis names are fixed to
    the layout this module defines; unknown axes raise."""
    sizes = {"data": 1, "model": 1}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        name = name.strip()
        if name not in sizes:
            raise ValueError(
                f"unknown mesh axis {name!r} in --mesh {spec!r} "
                f"(supported: data, model)")
        sizes[name] = int(val)
    n = sizes["data"] * sizes["model"]
    avail = len(jax.devices())
    if n > avail:
        raise ValueError(
            f"--mesh {spec!r} needs {n} devices; only {avail} visible")
    return make_mesh(n, model_parallel=sizes["model"])


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """Mesh over the first n devices: ("data",) or ("data", "model")."""
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    if model_parallel > 1:
        assert n % model_parallel == 0, (n, model_parallel)
        arr = np.array(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.array(devices), ("data",))


def _env_axis_sharding(mesh: Mesh):
    def f(x):
        return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    return f


def learner_shardings(learner, mesh: Mesh):
    """Replicate params/opt state, except: when the mesh has a "model" axis,
    shard every matrix's output dim and every bias over it (simple 1D TP;
    layer_norm params replicated)."""
    has_model = "model" in mesh.axis_names

    def shard(x):
        if has_model and x.ndim == 2 and x.shape[1] % mesh.shape["model"] == 0 \
                and x.shape[1] >= 2 * mesh.shape["model"]:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(shard, learner)


def carry_shardings(carry, mesh: Mesh):
    """Sharding pytree for a TrainCarry: env-axis arrays on "data", learner
    replicated/TP, scalars replicated."""
    from diral_tpu.train.loop import TrainCarry

    env = _env_axis_sharding(mesh)
    repl = NamedSharding(mesh, P())
    return TrainCarry(
        env_state=jax.tree.map(env, carry.env_state),
        history=env(carry.history),
        state=env(carry.state),
        replay=jax.tree.map(env, carry.replay),
        learner=learner_shardings(carry.learner, mesh),
        eps_state=jax.tree.map(lambda x: repl, carry.eps_state),
        beta=repl,
        sum_ia_prev=env(carry.sum_ia_prev),
        ia_counter=env(carry.ia_counter),
        prev_actions=env(carry.prev_actions),
        key=repl,
    )


def shard_carry(carry, mesh: Mesh):
    """Place an (unsharded) carry onto the mesh with the layout above."""
    return jax.device_put(carry, carry_shardings(carry, mesh))
