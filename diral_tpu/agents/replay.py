"""Device-resident experience replay.

Two reference replay designs, rebuilt as preallocated device arrays so the
whole actor-learner loop stays inside one XLA program (no host crossings):

* ``WindowReplay`` -- the DRQN driver's deque + contiguous-window sampler
  (reference utils/memory.py:162-194 ``Memory``): a ring of full
  (state, action, reward, next_state) environment slots; sampling draws
  ``batch`` window *start* positions without replacement and returns
  ``step`` consecutive slots per draw.  Deque order is preserved across
  the ring wraparound by indexing relative to the oldest element.

* ``TransitionReplay`` -- the PS-DQN numpy ring (reference
  utils/memory.py:120-159 ``ReplayBuffer`` x5 parallel buffers:
  state/action/reward/terminal/mask, algorithms/ps_dqn.py:150-155), with
  ``index+1`` next-state sampling (ps_dqn.py:326-334).

Both are flax pytrees; ``add``/``sample`` are pure functions usable inside
``lax.scan`` bodies, and batched across env instances with ``vmap``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


def _uniform_without_replacement(key, valid_count, max_count: int, batch: int):
    """Draw ``batch`` distinct indices uniformly from [0, valid_count).

    Matches np.random.choice(replace=False) semantics (memory.py:184) under
    a traced bound: random keys per slot, invalid slots pushed to +inf,
    argsort prefix = uniform sample without replacement.  If
    valid_count < batch the draw degrades to "all valid slots first"
    (callers gate training on buffer fill, main_test.py:235)."""
    scores = jax.random.uniform(key, (max_count,))
    scores = jnp.where(jnp.arange(max_count) < valid_count, scores, jnp.inf)
    return jnp.argsort(scores)[:batch]


class WindowReplay(struct.PyTreeNode):
    """Ring buffer over whole env slots with contiguous-window sampling."""

    states: jax.Array       # [S, ...]
    actions: jax.Array      # [S, ...]
    rewards: jax.Array      # [S, ...]
    next_states: jax.Array  # [S, ...]
    ptr: jax.Array          # scalar int32: next write position
    count: jax.Array        # scalar int32: filled slots (<= capacity)

    @property
    def capacity(self) -> int:
        return self.states.shape[0]

    @classmethod
    def create(cls, capacity: int, state_shape, action_shape, reward_shape,
               dtype=jnp.float32, action_dtype=jnp.int32) -> "WindowReplay":
        return cls(
            states=jnp.zeros((capacity, *state_shape), dtype),
            actions=jnp.zeros((capacity, *action_shape), action_dtype),
            rewards=jnp.zeros((capacity, *reward_shape), dtype),
            next_states=jnp.zeros((capacity, *state_shape), dtype),
            ptr=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
        )

    def add(self, state, action, reward, next_state) -> "WindowReplay":
        """Append one slot, evicting the oldest when full (deque semantics,
        memory.py:167-175)."""
        i = self.ptr
        return self.replace(
            states=self.states.at[i].set(jnp.asarray(state, self.states.dtype)),
            actions=self.actions.at[i].set(jnp.asarray(action, self.actions.dtype)),
            rewards=self.rewards.at[i].set(jnp.asarray(reward, self.rewards.dtype)),
            next_states=self.next_states.at[i].set(
                jnp.asarray(next_state, self.next_states.dtype)
            ),
            ptr=(i + 1) % self.capacity,
            count=jnp.minimum(self.count + 1, self.capacity),
        )

    @staticmethod
    def add_lockstep(replay: "WindowReplay", state, action, reward,
                     next_state) -> "WindowReplay":
        """Batched-env ``add`` exploiting lockstep pointers.

        The training loop steps all env instances together, so every env's
        write pointer is identical.  ``vmap(WindowReplay.add)`` cannot see
        that and lowers each per-env ``.at[ptr].set`` to a scatter with
        per-env indices -- measured 21 us per array per slot on v5e, the
        single largest slot cost.  With the shared scalar pointer the same
        write is one ``dynamic_update_slice`` along the slot axis (~1 us).
        Bit-identical to ``vmap(WindowReplay.add)``; ``replay`` is the
        vmapped pytree ([B, S, ...] buffers, [B] ptr/count)."""
        i = replay.ptr[0]
        ins = lambda buf, x: jax.lax.dynamic_update_index_in_dim(
            buf, jnp.asarray(x, buf.dtype), i, axis=1)
        return replay.replace(
            states=ins(replay.states, state),
            actions=ins(replay.actions, action),
            rewards=ins(replay.rewards, reward),
            next_states=ins(replay.next_states, next_state),
            ptr=(replay.ptr + 1) % replay.states.shape[1],
            count=jnp.minimum(replay.count + 1, replay.states.shape[1]),
        )

    def _ring_index(self, deque_idx):
        """Map deque position (0 = oldest) to ring position."""
        oldest = (self.ptr - self.count) % self.capacity
        return (oldest + deque_idx) % self.capacity

    # -- standalone replay dumps (reference utils/memory.py:196-216) -----

    def save(self, path: str) -> None:
        """Write the buffer contents to ``path`` as a standalone pickle, in
        deque order (oldest first) -- the reference's user-facing
        ``Memory.save`` artifact (utils/memory.py:196-205, which pickles
        the experience deque).  Works for a single replay (scalar ptr) and
        a vmapped batch ([B] ptr with lockstep counts): the batched dump
        keeps the env axis."""
        import pickle

        import numpy as np

        ptr = np.asarray(self.ptr)
        count = np.asarray(self.count)
        batched = ptr.ndim == 1
        cap = self.states.shape[1] if batched else self.states.shape[0]
        cnt = int(count.flat[0])  # lockstep writes keep all counts equal
        oldest = (ptr - count) % cap
        order = (np.expand_dims(oldest, -1) + np.arange(cnt)) % cap

        def take(buf):
            buf = np.asarray(buf)
            if batched:
                return buf[np.arange(buf.shape[0])[:, None], order]
            return buf[order]

        data = {
            "format": "diral_tpu.WindowReplay.v1",
            "capacity": cap,
            "batched": batched,
            "states": take(self.states),
            "actions": take(self.actions),
            "rewards": take(self.rewards),
            "next_states": take(self.next_states),
        }
        with open(path, "wb") as f:
            pickle.dump(data, f)

    @classmethod
    def load(cls, path: str, capacity: int | None = None) -> "WindowReplay":
        """Reconstruct a replay from a ``save`` dump.  The reference's
        ``Memory.load`` is stubbed out (utils/memory.py:207-216); this one
        works.  ``capacity`` defaults to the dump's."""
        import pickle

        import numpy as np

        with open(path, "rb") as f:
            data = pickle.load(f)
        if data.get("format") != "diral_tpu.WindowReplay.v1":
            raise ValueError(f"{path}: not a WindowReplay dump")
        cap = capacity or data["capacity"]
        env_axis = int(data["batched"])
        cnt = data["states"].shape[env_axis]
        if cnt > cap:
            raise ValueError(f"dump holds {cnt} slots > capacity {cap}")

        def place(arr, dtype=None):
            pad = [(0, 0)] * arr.ndim
            pad[env_axis] = (0, cap - cnt)
            return jnp.asarray(np.pad(np.asarray(arr), pad), dtype)

        lead = (data["states"].shape[0],) if data["batched"] else ()
        return cls(
            states=place(data["states"]),
            actions=place(data["actions"], jnp.int32),
            rewards=place(data["rewards"]),
            next_states=place(data["next_states"]),
            ptr=jnp.full(lead, cnt % cap, jnp.int32),
            count=jnp.full(lead, cnt, jnp.int32),
        )

    def sample_windows(self, key, batch: int, step: int):
        """batch random contiguous windows of ``step`` slots
        (memory.py:177-194: starts drawn from arange(len - step) without
        replacement).  Returns dict of [batch, step, ...] arrays."""
        starts = _uniform_without_replacement(
            key, self.count - step, self.capacity, batch
        )
        idx = self._ring_index(starts[:, None] + jnp.arange(step)[None, :])
        return {
            "states": self.states[idx],
            "actions": self.actions[idx],
            "rewards": self.rewards[idx],
            "next_states": self.next_states[idx],
        }


def _row_major(x):
    """Pin a buffer to row-major layout on TPU (no-op elsewhere).

    XLA's layout assignment carried the production replay ring through
    the training scan in a {0,2,1} (batch-minor) layout while the window
    gather wanted row-major, inserting a FULL-BUFFER layout copy (plus a
    remat-compressed twin) inside the loop body -- 2x the replay's HBM
    (the 100v/50r B=256 compile demanded 22.5 GB of 15.75) and a
    per-event copy tax.  Constraining the post-add buffer keeps the scan
    carry row-major end to end."""
    if jax.default_backend() != "tpu":
        return x
    try:
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(x, Layout(tuple(range(x.ndim))))
    except Exception:
        return x


class FusedWindowReplay(struct.PyTreeNode):
    """``WindowReplay`` with state | reward | action fused into one row per
    slot -- the DRQN training loop's production layout.

    A slot is ONE flat row of N*Dp lanes, Dp = ops/pallas_lstm.padded_dim(D)
    -- user n's channels at lane offset n*Dp: [0:D) = state, D = reward,
    D+1 = the action's exact float image (channel ids are tiny ints),
    [D+2:Dp) zero.  The per-user stride IS the fused LSTM kernel's
    per-step stride, so a sampled window becomes Q-net input rows with
    aligned slice+reshape alone (the unaligned-stride assembly cost a
    measured 0.45 ms/event); the reward/action channels ride inside the
    step's pad lanes, which the kernel ignores by construction (zero
    input-weight rows).  One buffer serves all four
    sample arrays with a single gather: ``next_states`` are the ``states``
    rows shifted one slot (the ring-contiguity invariant: in an unbroken
    add chain the state stored at slot k+1 IS slot k's next_state), and
    rewards/actions ride the same rows.  The separate next_states buffer
    disappears entirely, HALVING replay HBM -- the binding win, since it
    bounds how many envs fit per chip.

    Why FLAT rows (round 4): a [S, N, D+2] buffer puts (N, D+2) in the
    TPU tile dims, and at the production shapes (N=4, D+2=25 in a
    (8, 128) tile) ~80% of the physical footprint is padding -- every
    add write, window gather and downstream repack paid 5x the logical
    bytes.  With [S, N*(D+2)] the row is a dense lane vector (100 of 128
    lanes), and per-user extraction is a static lane slice.  Sampling
    semantics are bit-identical to the split layout (asserted in
    tests/test_learner.py); window sampling itself matches reference
    utils/memory.py:177-194.
    """

    buf: jax.Array   # [S+pad, N*Dp]  (or [B, S+pad, N*Dp] vmapped)
    ptr: jax.Array   # scalar int32: next write position  ([B] vmapped)
    count: jax.Array  # scalar int32: filled slots (<= capacity)
    # Mirror pad (TPU gather layout): the first ``pad`` ring slots are
    # duplicated past the end of the ring (buf[S+s] == buf[s] for s < pad,
    # maintained by add_lockstep's second write), so any ``pad+1``-slot
    # window is a CONTIGUOUS slice -- the train-event window gather becomes
    # batch descriptors of whole windows instead of batch*(step+1)
    # descriptors of single 400-byte rows (measured 1.1 ms/event of pure
    # descriptor latency at the toy bench config, 33% of the train event).
    pad: int = struct.field(pytree_node=False, default=0)
    num_users: int = struct.field(pytree_node=False, default=1)
    # state dim is stored explicitly: the lane stride is padded, so it is
    # not derivable from the buffer shape
    dim: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        # batch-aware: the production instance is the vmapped pytree
        # (ptr [B]); mirror save()'s probe.  Logical capacity excludes
        # the mirror pad.
        ax = 1 if self.ptr.ndim == 1 else 0
        return self.buf.shape[ax] - self.pad

    @property
    def state_dim(self) -> int:
        return self.dim

    @property
    def user_stride(self) -> int:
        return self.buf.shape[-1] // self.num_users

    # Channel ids ride the replay's float dtype (channel D+1); the id
    # range must be exactly representable in that dtype's mantissa or
    # actions silently round on the way back out (e.g. a bf16 buffer
    # corrupts ids > 256).
    _MANTISSA_MAX = {
        jnp.dtype(jnp.float64): 2 ** 53,
        jnp.dtype(jnp.float32): 2 ** 24,
        jnp.dtype(jnp.bfloat16): 2 ** 8,
        jnp.dtype(jnp.float16): 2 ** 11,
    }

    @classmethod
    def max_exact_action(cls, dtype) -> int:
        return cls._MANTISSA_MAX.get(jnp.dtype(dtype), 2 ** 24)

    @classmethod
    def create(cls, capacity: int, num_users: int, state_dim: int,
               dtype=jnp.float32, num_actions: int | None = None,
               pad: int = 0) -> "FusedWindowReplay":
        """``num_actions`` (the channel count) enables the exactness guard
        above at trace time; callers that know the action space should
        pass it.  ``pad`` is the mirror-pad width -- pass the sample
        window length (``step``) to make window gathers contiguous."""
        if num_actions is not None and num_actions > cls.max_exact_action(dtype):
            raise ValueError(
                f"FusedWindowReplay({jnp.dtype(dtype).name}) cannot store "
                f"action ids up to {num_actions - 1} exactly (mantissa "
                f"limit {cls.max_exact_action(dtype)}); use a wider dtype")
        if pad >= capacity:
            raise ValueError(f"mirror pad {pad} must be < capacity {capacity}")
        from diral_tpu.ops.pallas_lstm import padded_dim

        return cls(
            buf=jnp.zeros((capacity + pad,
                           num_users * padded_dim(state_dim)), dtype),
            ptr=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
            pad=pad,
            num_users=num_users,
            dim=state_dim,
        )

    @staticmethod
    def add_lockstep(replay: "FusedWindowReplay", state, action,
                     reward) -> "FusedWindowReplay":
        """Batched-env lockstep append (cf. ``WindowReplay.add_lockstep``:
        one ``dynamic_update_slice`` exploiting the shared write pointer).
        There is no ``next_state`` argument -- the next add's ``state`` IS
        this slot's next_state; callers must keep the chain unbroken
        (the training loop writes one chain from pretrain through the
        whole run).  ``replay`` is the vmapped pytree ([B, S+pad, N*(D+2)]
        buf, [B] ptr/count); state [B, N, D], action/reward [B, N].  With
        a mirror pad, writes to ring slot i < pad also land at i + S so
        windows read past the ring end without a modulo."""
        dt = replay.buf.dtype
        cap = replay.capacity
        stride = replay.user_stride
        d = replay.dim
        parts = [jnp.asarray(state, dt),
                 jnp.asarray(reward, dt)[..., None],
                 jnp.asarray(action, dt)[..., None]]
        if stride > d + 2:
            parts.append(jnp.zeros(state.shape[:-1] + (stride - d - 2,), dt))
        row = jnp.concatenate(parts, axis=-1)
        row = row.reshape(row.shape[:-2] + (-1,))  # [B, N*Dp] flat lanes
        i = replay.ptr[0]
        buf = jax.lax.dynamic_update_index_in_dim(replay.buf, row, i, axis=1)
        if replay.pad:
            # second write: the mirror slot for i < pad, else a rewrite of
            # slot i (idempotent; predication would cost the same)
            i2 = jnp.where(i < replay.pad, i + cap, i)
            buf = jax.lax.dynamic_update_index_in_dim(buf, row, i2, axis=1)
        return replay.replace(
            buf=_row_major(buf),
            ptr=(replay.ptr + 1) % cap,
            count=jnp.minimum(replay.count + 1, cap),
        )

    def save(self, path: str) -> None:
        """Write the buffer as a standalone ``WindowReplay``-v1 pickle
        (the reference's user-facing ``Memory.save`` artifact,
        utils/memory.py:196-205), loadable by ``WindowReplay.load``.

        The fused layout stores ``count`` (s, a, r) rows but only
        ``count - 1`` COMPLETE transitions (the newest slot's next_state
        arrives with the next add), so the dump holds ``count - 1``
        transitions -- exactly the information the buffer has."""
        import pickle

        import numpy as np

        ptr = np.asarray(self.ptr)
        count = np.asarray(self.count)
        batched = ptr.ndim == 1
        cap = self.capacity  # logical: mirror-pad slots are duplicates
        cnt = int(count.flat[0])  # lockstep writes keep all counts equal
        oldest = (ptr - count) % cap
        order = (np.expand_dims(oldest, -1) + np.arange(cnt)) % cap
        buf = np.asarray(self.buf)
        buf = buf.reshape(buf.shape[:-1] + (self.num_users, -1))  # unflatten
        buf = buf[..., :self.dim + 2]  # drop the stride pad lanes
        rows = (buf[np.arange(buf.shape[0])[:, None], order] if batched
                else buf[order])  # [..., cnt, N, D+2] deque order
        d = self.state_dim
        t = rows.ndim - 3  # index of the deque axis
        cur = np.take(rows, np.arange(max(cnt - 1, 0)), axis=t)
        nxt = np.take(rows, np.arange(1, cnt) if cnt else [], axis=t)
        data = {
            "format": "diral_tpu.WindowReplay.v1",
            "capacity": cap,
            "batched": batched,
            "states": cur[..., :d],
            "actions": cur[..., d + 1].astype(np.int32),
            "rewards": cur[..., d],
            "next_states": nxt[..., :d],
        }
        with open(path, "wb") as f:
            pickle.dump(data, f)


class TransitionReplay(struct.PyTreeNode):
    """PS-DQN-style flat transition ring with mask/terminal channels."""

    states: jax.Array     # [S, D]
    actions: jax.Array    # [S]
    rewards: jax.Array    # [S]
    terminals: jax.Array  # [S] bool
    masks: jax.Array      # [S] float (0 = padding, ps_dqn.py:155)
    head: jax.Array       # scalar int32
    count: jax.Array      # scalar int32

    @property
    def capacity(self) -> int:
        return self.states.shape[0]

    @classmethod
    def create(cls, capacity: int, state_dim: int, dtype=jnp.float32) -> "TransitionReplay":
        return cls(
            states=jnp.zeros((capacity, state_dim), dtype),
            actions=jnp.zeros((capacity,), jnp.int32),
            rewards=jnp.zeros((capacity,), dtype),
            terminals=jnp.zeros((capacity,), bool),
            masks=jnp.zeros((capacity,), dtype),
            head=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
        )

    def put(self, states, actions, rewards, terminals, masks) -> "TransitionReplay":
        """Batch-append ``n`` transitions with wraparound (memory.py:127-145).
        n is static (the leading dim of the inputs).

        Deviation: on a wrapping put the reference sets ``head = split``
        (memory.py:144), which makes the next put overwrite the data it just
        wrote at the buffer start -- a plain bug in (unreachable, base.py-less)
        code.  Here head advances correctly: ``head = (head + n) % capacity``."""
        n = states.shape[0]
        idx = (self.head + jnp.arange(n)) % self.capacity
        return self.replace(
            states=self.states.at[idx].set(jnp.asarray(states, self.states.dtype)),
            actions=self.actions.at[idx].set(jnp.asarray(actions, self.actions.dtype)),
            rewards=self.rewards.at[idx].set(jnp.asarray(rewards, self.rewards.dtype)),
            terminals=self.terminals.at[idx].set(jnp.asarray(terminals, bool)),
            masks=self.masks.at[idx].set(jnp.asarray(masks, self.masks.dtype)),
            head=(self.head + n) % self.capacity,
            count=jnp.minimum(self.count + n, self.capacity),
        )

    def sample(self, key, batch: int) -> dict[str, Any]:
        """Uniform random transitions with their successors
        (ps_dqn.py:326-334: index ~ choice(len - 1), next = index + 1)."""
        idx = jax.random.randint(key, (batch,), 0, jnp.maximum(self.count - 1, 1))
        return {
            "states": self.states[idx],
            "actions": self.actions[idx],
            "rewards": self.rewards[idx],
            "terminals": self.terminals[idx],
            "masks": self.masks[idx],
            "next_states": self.states[(idx + 1) % self.capacity],
        }
