"""Checkpoint / resume.

The reference checkpoints only network variables via tf.train.Saver every
``save_freq`` slots (drl_drqn.py:386-401, main_test.py:260-264) and restores
exploration state manually through ``set_eps`` (drl_drqn.py:184-190).  Here
the *entire* training carry -- params, target params, optimizer state, env
state, device replay, epsilon schedule, RNG key, shaping counters -- is one
pytree, checkpointed atomically with Orbax, so resume is exact: a restored
run continues bit-for-bit where it left off (also the elastic-recovery
story, SURVEY.md section 5: multi-host failure = restart from snapshot).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def checkpoint_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save(mgr: ocp.CheckpointManager, step: int, carry) -> None:
    mgr.save(step, args=ocp.args.StandardSave(carry))
    mgr.wait_until_finished()


def restore(mgr: ocp.CheckpointManager, carry_template, step: int | None = None):
    """Restore into the structure/shardings of ``carry_template``.
    step=None -> latest."""
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError("no checkpoint found")
    restored = mgr.restore(
        step,
        args=ocp.args.StandardRestore(jax.tree.map(lambda x: x, carry_template)),
    )
    return restored, step


def latest_step(directory: str) -> int | None:
    mgr = checkpoint_manager(directory)
    return mgr.latest_step()
