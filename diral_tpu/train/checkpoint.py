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


def _legacy_history(carry_template):
    """Pre-round-4 history layout: [B, T, N, D] (the carry now holds the
    flat agent-major [B, N, T*Dp] window, loop.py TrainCarry)."""
    import jax.numpy as jnp

    from diral_tpu.ops.pallas_lstm import padded_dim

    h = carry_template.history
    B, N, L = h.shape
    D = carry_template.state.shape[-1]
    T = L // padded_dim(D)
    return jnp.zeros((B, T, N, D), h.dtype), (T, D)


def _flatten_history(h4, D):
    """[B, T, N, D] -> the flat agent-major [B, N, T*Dp] carry layout."""
    import jax.numpy as jnp

    from diral_tpu.ops.pallas_lstm import padded_dim

    B, T, N, _ = h4.shape
    Dp = padded_dim(D)
    h = jnp.transpose(h4, (0, 2, 1, 3))                      # [B, N, T, D]
    h = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
    return h.reshape(B, N, T * Dp)


def _legacy_split_template(carry_template):
    """Template for checkpoints written before the round-3 replay fusion
    (TrainCarry.replay was a ``WindowReplay`` with four split [B,S,N,*]
    buffers; now it is a flat-row ``FusedWindowReplay``).  Returns None
    when the carry doesn't have a fused replay to shim."""
    import jax.numpy as jnp

    from diral_tpu.agents.replay import FusedWindowReplay, WindowReplay

    r = getattr(carry_template, "replay", None)
    if not isinstance(r, FusedWindowReplay) or r.ptr.ndim != 1:
        return None
    B = r.buf.shape[0]
    S = r.capacity  # legacy layout had no mirror pad
    N, D = r.num_users, r.state_dim
    legacy = WindowReplay(
        states=jnp.zeros((B, S, N, D), r.buf.dtype),
        actions=jnp.zeros((B, S, N), jnp.int32),
        rewards=jnp.zeros((B, S, N), r.buf.dtype),
        next_states=jnp.zeros((B, S, N, D), r.buf.dtype),
        ptr=jnp.zeros((B,), jnp.int32),
        count=jnp.zeros((B,), jnp.int32),
    )
    hist, _ = _legacy_history(carry_template)
    return carry_template.replace(replay=legacy, history=hist)


def _legacy_fused4d_template(carry_template):
    """Template for round-3 checkpoints: fused replay with the 4D
    [B, S, N, D+2] buffer (no mirror pad) and [B, T, N, D] history."""
    import jax.numpy as jnp

    from diral_tpu.agents.replay import FusedWindowReplay

    r = getattr(carry_template, "replay", None)
    if not isinstance(r, FusedWindowReplay) or r.ptr.ndim != 1:
        return None
    B = r.buf.shape[0]
    S = r.capacity
    N, D = r.num_users, r.state_dim
    legacy = FusedWindowReplay(
        buf=jnp.zeros((B, S, N, D + 2), r.buf.dtype),
        ptr=jnp.zeros((B,), jnp.int32),
        count=jnp.zeros((B,), jnp.int32),
        pad=0, num_users=N, dim=D,
    )
    hist, _ = _legacy_history(carry_template)
    return carry_template.replace(replay=legacy, history=hist)


def _to_current_layout(carry, target_replay):
    """Convert a restored legacy carry (split WindowReplay or 4D fused
    replay, 4D history) to the current flat layout.  Exact: the write
    chain is unbroken (loop.py add_lockstep), so ``next_states[k] ==
    states[k+1]`` and the split next_states buffer is redundant -- the
    flat buffer reconstructs every sampled window bit-identically."""
    import jax.numpy as jnp

    from diral_tpu.agents.replay import FusedWindowReplay, WindowReplay

    from diral_tpu.ops.pallas_lstm import padded_dim

    old = carry.replay
    pad, N = target_replay.pad, target_replay.num_users
    if isinstance(old, WindowReplay):
        buf4 = jnp.concatenate(
            [old.states,
             old.rewards[..., None],
             old.actions.astype(old.states.dtype)[..., None]], axis=-1)
    else:
        buf4 = old.buf
    B, S = buf4.shape[0], buf4.shape[1]
    D = carry.state.shape[-1]
    stride = padded_dim(D)
    if buf4.shape[-1] < stride:  # pad user rows to the kernel stride
        buf4 = jnp.pad(
            buf4, ((0, 0),) * 3 + ((0, stride - buf4.shape[-1]),))
    buf = buf4.reshape(B, S, -1)             # flat rows
    if pad:
        buf = jnp.concatenate([buf, buf[:, :pad]], axis=1)
    replay = FusedWindowReplay(buf=buf, ptr=old.ptr, count=old.count,
                               pad=pad, num_users=N, dim=D)
    return carry.replace(replay=replay,
                         history=_flatten_history(carry.history, D))


def restore(mgr: ocp.CheckpointManager, carry_template, step: int | None = None):
    """Restore into the structure/shardings of ``carry_template``.
    step=None -> latest.

    Checkpoints written before the replay fusion (round 3) carried a
    split-buffer ``WindowReplay``; those are detected by the structure
    mismatch and converted into the fused layout in place, so old run
    directories stay resumable."""
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError("no checkpoint found")
    try:
        restored = mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                jax.tree.map(lambda x: x, carry_template)),
        )
        return restored, step
    except Exception as e:
        for make_template in (_legacy_fused4d_template,
                              _legacy_split_template):
            legacy = make_template(carry_template)
            if legacy is None:
                raise
            try:
                restored = mgr.restore(
                    step, args=ocp.args.StandardRestore(legacy))
            except Exception:
                continue
            return _to_current_layout(restored,
                                      carry_template.replay), step
        raise e  # no layout matched: surface the original error


def latest_step(directory: str) -> int | None:
    mgr = checkpoint_manager(directory)
    return mgr.latest_step()
