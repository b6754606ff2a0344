"""The jitted actor-learner training loop.

The reference driver (reference main_test.py:14-265 ``marl_test``) runs one
Python iteration per time slot with >= N+2 host<->device crossings (one
``sess.run`` per agent per slot plus train calls).  Here the *entire* slot
-- per-agent inference, action selection, env step, state assembly, reward
shaping, replay insert, and the episodic train call -- is one ``lax.scan``
body compiled once by XLA; a full 250k-slot run is a single device program
with zero host round-trips.

Driver semantics preserved (each cited):

* warmup step + pretrain phase of ``pretrain_length*step_size*5`` slots
  using the design-step env flavor and storing the *stale* warmup rewards
  in every pretrain transition (main_test.py:89-114 -- the reference stores
  ``rews`` from before the loop, not the fresh ``reward``; reproduced);
* slot-indexed action modes: random < ``explore`` <= eps-greedy <
  ``greedy`` <= pure greedy (main_test.py:127-136);
* epsilon decays once per episode advance (policies.py:45-63), with
  episode = t // episode_interval;
* reward shaping order per user: ia-averaging sign penalty, ia repeat
  penalty, global-reward averaging (main_test.py:153-206, in that order);
* replay add of (state, action, shaped_reward, next_state)
  (main_test.py:215) and history window maintenance (main_test.py:219);
* train-after-episode cadence: at episode end when t > batch_size + 10
  (main_test.py:226-236); per-slot cadence gated by ``training_stop``
  otherwise (main_test.py:222-224);  n_batch gradient steps + target sync
  inside the train call (drl_drqn.py:199-265).

Vectorization beyond the reference: ``num_envs`` env instances step in
lockstep feeding one shared learner (CTDE preserved -- the policy is
vmapped over the agent axis and the env axis); windows are sampled
uniformly across envs.  ``num_envs=1`` reproduces the reference exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from diral_tpu.config import ExperimentConfig
from diral_tpu.agents import drqn
from diral_tpu.agents import policies as pol
from diral_tpu.agents.replay import FusedWindowReplay
from diral_tpu.envs import v2v_env as E


class TrainCarry(struct.PyTreeNode):
    env_state: E.EnvState          # batched [B, ...]
    # History rides the Q-net's FLAT padded window layout, agent-major:
    # [B, N, T*Dp] with step t's D features at lane offset t*Dp
    # (Dp = ops/pallas_lstm.padded_dim(D)).  The reference's [T, N, D]
    # deque layout would need a [B,T,N,D] -> [B*N, T, D] transpose every
    # slot for the batched forward, and that padded-tile transpose was a
    # measured hot op; flat agent-major history makes the per-slot Q
    # input a zero-copy reshape and the slot update a lane roll.
    history: jax.Array             # [B, N, T*Dp]
    state: jax.Array               # [B, N, D]
    replay: FusedWindowReplay      # flat mirror-padded [B, S+pad, N*Dp]
    learner: drqn.DRQNLearner      # shared across envs
    eps_state: pol.EpsGreedyState
    beta: jax.Array                # scalar; boltzman anneal state (unused otherwise)
    sum_ia_prev: jax.Array         # [B]
    ia_counter: jax.Array          # [B, N] int32
    prev_actions: jax.Array        # [B, N] int32
    key: jax.Array


def _bottom_k_two_stage(scores2d, k: int):
    """Indices of the ``k`` smallest entries of the flattened [B, S] score
    matrix, in ascending-score order with lowest-flat-index ties --
    bit-identical to ``top_k(-scores.reshape(-1), k)`` but O(B*S) work on
    small per-row top_ks instead of one 262k-key global sort (measured
    0.25 ms per sort at the toy bench config, 15% of the train event).

    Stage 1 keeps each env's ``q`` smallest; stage 2 selects the global
    ``k`` among the B*q candidates.  Exactness guard: if any env's WORST
    surviving candidate would still make the global cut, that env's
    row may have been truncated, and the full flat top_k runs instead
    (probability ~ Poisson-tail( k/B > q ): vanishing at the production
    shape, never silently wrong).  Tie order is preserved because both
    stages order candidates (env-major, ascending score, lowest index),
    exactly the flat ordering."""
    B, S = scores2d.shape
    q = min(S, max(32, -(-4 * k // max(B, 1))))  # ceil(4k/B), floor 32
    v1, i1 = jax.lax.top_k(-scores2d, q)          # [B, q] per-env bottoms
    v2, c2 = jax.lax.top_k(v1.reshape(-1), k)     # over B*q candidates
    env = c2 // q
    flat = env * S + i1.reshape(-1)[c2]
    if q == S:
        return flat  # complete rows: no truncation possible
    # env truncated <=> its q-th smallest is at/below the global cutoff
    maybe_truncated = (v1[:, -1] >= v2[-1]).any()

    def exact_fallback(_):
        _, f = jax.lax.top_k(-scores2d.reshape(-1), k)
        return f

    return jax.lax.cond(maybe_truncated, exact_fallback, lambda _: flat,
                        None)


def sampler_collective_bytes(cfg: ExperimentConfig, dtype_bytes: int = 4):
    """Projected per-train-event collective volume of the cross-env window
    sample under a data-sharded mesh (VERDICT r3 #7).

    GSPMD serves the cross-env gather with masked partial gathers on each
    shard plus ONE all-reduce of the gathered batch (verified against the
    compiled HLO in tests/test_sharding.py) -- the wire cost scales with
    ``n_batch * batch_size`` windows, NOT with the replay size.  Because
    that all-reduce leaves the batch replicated, every device computes
    identical gradients locally and the sampler's collective double-duties
    as the gradient sync (no separate param-sized all-reduce appears in
    the HLO).  A ring all-reduce moves ~2*(k-1)/k ~ 2x the payload per
    device, amortized once per ``episode_interval`` slots."""
    from diral_tpu.ops.pallas_lstm import padded_dim

    acfg, env = cfg.agent, cfg.env
    step = acfg.step_size if acfg.network.use_lstm_input else 1
    gathered_elems = (acfg.n_batch * acfg.batch_size * (step + 1)
                      * env.num_users * padded_dim(env.state_space))
    payload = gathered_elems * dtype_bytes
    return {
        "gathered_elems": int(gathered_elems),
        "bytes_per_event": int(payload),
        "ring_bytes_per_device_per_event": int(2 * payload),
        "bytes_per_slot": payload / cfg.episode_interval,
    }


def _gather_flat_windows(replay: FusedWindowReplay, keys, batch: int,
                         step: int, gather_impl: str = "gather"):
    """``n`` independent uniform window draws across the env axis, one
    fused gather of whole FLAT windows.  Selection: flatten the (env,
    start) space, draw ``batch`` starts without replacement per key (the
    exact two-stage bottom-k above, not a 262k-key global sort).  With
    one env each draw reduces to the reference sampler (memory.py:177-194);
    draws for different keys are independent (the reference re-samples per
    gradient step, drl_drqn.py:207-212).

    TPU layout (the round-4 train-event fixes, from the measured event
    profiles): the buffer's mirror pad makes every ``step+1``-slot window
    one CONTIGUOUS slice, so the gather moves n*batch whole-window
    descriptors instead of n*batch*(step+1) single-row descriptors
    (measured 1.1 ms/event of descriptor latency); rows are flat
    [N*Dp] lane vectors at the Q-net kernel's per-step stride, so nothing
    in the chain materializes the ~5x-padded [.., N, D+2] tile layout and
    the repack is aligned slice+reshape; and all n batches ride ONE
    gather (the draws are param-independent, so nothing serializes
    against the gradient steps).

    Returns fw [n*batch, step+1, N*Dp] (the optimization barrier pins
    downstream dtype converts to the gathered batch -- without it XLA
    hoists the Q-net's bf16 convert through the gather onto the whole
    replay buffer, measured 1.4 ms/event)."""
    B, S = replay.buf.shape[0], replay.capacity
    if replay.pad < step:
        raise ValueError(
            f"replay mirror pad {replay.pad} < sample window {step}; "
            f"create the replay with pad=step")
    n = keys.shape[0]
    valid_per_env = replay.count[0] - step  # lockstep: all counts equal
    col = jnp.arange(B * S) % S

    flats = []
    for j in range(n):  # python loop: keeps each two-stage cond un-vmapped
        k1, = jax.random.split(keys[j], 1)
        scores = jax.random.uniform(k1, (B * S,))
        scores = jnp.where(col < valid_per_env, scores, jnp.inf)
        flats.append(_bottom_k_two_stage(scores.reshape(B, S), batch))
    flat = jnp.concatenate(flats) if n > 1 else flats[0]

    env_idx, start = flat // S, flat % S
    oldest = (replay.ptr[0] - replay.count[0]) % S
    base = (oldest + start) % S  # in [0, S): the mirror pad absorbs +step
    W = step + 1
    R = replay.buf.shape[-1]
    zero = jnp.zeros((), env_idx.dtype)  # match index dtype under x64
    if gather_impl == "scan":
        # Sequential single-window dynamic slices instead of one batched
        # gather.  Why this exists (round 5, measured with
        # compiled.memory_analysis() bisects): XLA:TPU inserts a
        # FULL-BUFFER copy of the loop-carried replay ring for a batched
        # GATHER's operand (every formulation), but single dynamic-slice
        # reads alias in place -- the scan trades ~n*batch small
        # sequential slices for the whole-ring copy's time and 2x HBM
        # peak.  Wins when the ring is large relative to the draw count
        # (the scale config); the batched gather stays the default.
        def pull(_, es):
            e, s0 = es
            return None, jax.lax.dynamic_slice(
                replay.buf, (e, s0, zero), (1, W, R))[0]
        _, fw = jax.lax.scan(pull, None, (env_idx, base), unroll=4)
    else:
        fw = jax.vmap(
            lambda e, s0: jax.lax.dynamic_slice(
                replay.buf, (e, s0, zero), (1, W, R))[0]
        )(env_idx, base)                      # [n*batch, W, N*(D+2)]
    fw, = jax.lax.optimization_barrier((fw,))
    return fw


def sample_windows_cross_env(replay: FusedWindowReplay, key, batch: int,
                             step: int):
    """Uniform window sample across the env axis (one batch); see
    ``_gather_flat_windows``."""
    many = sample_windows_cross_env_many(replay, key[None], batch, step)
    return jax.tree.map(lambda x: x[0], many)


def sample_windows_cross_env_many(replay: FusedWindowReplay, keys, batch: int,
                                  step: int, gather_impl: str = "gather"):
    """Window samples in the [n, batch, step, N, D] view layout.

    All four sample arrays come from one gather of the fused flat buffer:
    the window's state channels serve both ``states`` and ``next_states``
    (ring-contiguity: the state stored at slot k+1 IS slot k's next_state
    -- the env never resets mid-run and pretrain/train write one unbroken
    chain), and the reward/action channels ride the same rows (channel
    ids are tiny ints, exact in the buffer dtype).  Asserted bit-equal to
    four direct ``WindowReplay`` gathers in tests/test_learner.py.

    The production train path uses ``sample_window_rows_many`` instead
    (pre-repacked flat rows; this view materializes the padded
    [.., N, D] tile layout)."""
    n = keys.shape[0]
    N = replay.num_users
    d = replay.state_dim
    fw = _gather_flat_windows(replay, keys, batch, step, gather_impl)
    fw = fw.reshape((n, batch, step + 1, N, -1))  # last dim = user stride
    return {
        "states": fw[:, :, :step, :, :d],
        "actions": fw[:, :, :step, :, d + 1].astype(jnp.int32),
        "rewards": fw[:, :, :step, :, d],
        "next_states": fw[:, :, 1:, :, :d],
    }


def sample_window_rows_many(replay: FusedWindowReplay, keys, batch: int,
                            step: int, windows_only: bool = False,
                            gather_impl: str = "gather"):
    """Production window samples, pre-repacked to user-major Q-net rows.

    Returns dict of per-draw stacks:
      states/next_states [n, N*batch, step*Dp]  (flat padded windows,
        ops/pallas_lstm.flatten_window layout -- feeds drqn_apply
        directly, row r = user-major (user u = r // batch), exactly the
        reference repack order drl_drqn.py:294-377);
      rewards [n, N*batch, step]; actions [n, N*batch, step] int32.

    With ``windows_only`` the states/next_states pair is replaced by ONE
    ``windows`` array [n, N*batch, (step+1)*Dp] -- the combined window
    whose first step*Dp lanes ARE the states row and whose lanes from Dp
    on ARE the next_states row.  The fused train step
    (drqn.train_on_windows -> qnets.drqn_apply_triple) consumes it
    directly, so neither sliced copy is ever materialized (round 5: the
    two copies cost ~2x the window bytes per event in pure HBM writes).

    Built from per-user static lane slices of the flat gather -- no
    [batch, T, N, D] intermediate, so the repack transpose that cost
    0.46 ms/event in the padded-tile layout disappears into fused
    dense copies."""
    from diral_tpu.ops.pallas_lstm import padded_dim

    n = keys.shape[0]
    N = replay.num_users
    D = replay.state_dim
    Dp = padded_dim(D)
    assert replay.user_stride == Dp, (replay.user_stride, Dp)
    fw = _gather_flat_windows(replay, keys, batch, step,
                              gather_impl)  # [n*b, W, N*Dp]

    # The replay's per-user stride IS the kernel's per-step stride, so a
    # user's window is an ALIGNED lane slice whose flat reshape is already
    # the Q-net input row -- the reward/action channels ride in the step's
    # pad lanes, which the kernel ignores by construction (zero
    # input-weight rows, zero dx).  Assemble in FINAL row order
    # (draw-major, user-major, batch) with slice+reshape+concat only; the
    # earlier unaligned-stride pad+concat assembly cost 0.45 ms/event.
    su, nu, wu, ru, au = [], [], [], [], []
    for j in range(n):
        fj = fw[j * batch:(j + 1) * batch]
        for u in range(N):
            o = u * Dp
            win = fj[:, :, o:o + Dp]                      # [b, W, Dp]
            if windows_only:
                wu.append(win.reshape(batch, (step + 1) * Dp))
            else:
                su.append(win[:, :step].reshape(batch, step * Dp))
                nu.append(win[:, 1:].reshape(batch, step * Dp))
            ru.append(win[:, :step, D])
            au.append(win[:, :step, D + 1])

    def cat(parts):
        y = jnp.concatenate(parts, axis=0)
        return y.reshape((n, N * batch) + parts[0].shape[1:])

    out = {
        "rewards": cat(ru),
        "actions": cat(au).astype(jnp.int32),
    }
    if windows_only:
        out["windows"] = cat(wu)
    else:
        out["states"] = cat(su)
        out["next_states"] = cat(nu)
    return out


def make_train_functions(cfg: ExperimentConfig, dtype=jnp.float32, trace=None):
    """Build (init_fn, slot_fn, run_fn) for the experiment config.

    ``trace``: optional [T_rec, N] recorded x-position array replayed into
    the env (the reference's load_positions fixture path,
    main_test.py:118 -> network.py:171-199)."""
    env_cfg = cfg.env
    acfg = cfg.agent
    B = cfg.engine.num_envs
    N, C, D = env_cfg.num_users, env_cfg.num_channels, env_cfg.state_space
    T = acfg.step_size
    step_env = E.step_channel if cfg.enable_channel else E.step_collision
    trace = None if trace is None else jnp.asarray(trace, dtype)

    # The Pallas channel kernel carries table_seq as its exact f32 image;
    # seq increments once per slot, so a horizon at/above 2^24 slots would
    # silently corrupt the newer-than merge ordering (ops/pallas_step.py).
    if (cfg.enable_channel and env_cfg.step_impl != "xla"
            and (env_cfg.step_impl == "pallas" or env_cfg.num_users >= 32)):
        from diral_tpu.ops.pallas_step import MAX_EXACT_SEQ

        if cfg.time_slots + 1 >= MAX_EXACT_SEQ:
            raise ValueError(
                f"time_slots={cfg.time_slots} would push table_seq past "
                f"2^24, beyond the Pallas step kernel's float32-exact "
                f"range; set env.step_impl='xla' for this horizon")

    v_reset = jax.vmap(lambda k: E.reset(env_cfg, k, dtype))
    v_step = jax.vmap(
        lambda s, a, t: step_env(env_cfg, s, a, t, trace=trace),
        in_axes=(0, 0, None),
    )
    v_obtain = jax.vmap(
        lambda s, o, a, r, ep, eps: E.obtain_state(env_cfg, s, o, a, r, ep, eps),
        in_axes=(0, 0, 0, 0, None, None),
    )
    v_sample = jax.vmap(lambda k: E.sample_actions(env_cfg, k))
    # all envs advance in lockstep -> shared write pointer -> one
    # dynamic_update_slice instead of vmap(add)'s per-env scatters
    v_add = FusedWindowReplay.add_lockstep
    v_ia = jax.vmap(E.information_age, in_axes=(0, None))

    # softmax temperature anneal over total episodes (drl_drqn.py:99,
    # main_test.py:60: total_episodes = time_slots / episode_interval)
    softmax_schedule = jnp.asarray(
        pol.softmax_temperature_schedule(
            acfg.temperature, max(cfg.time_slots // cfg.episode_interval, 1)
        )
    )

    from diral_tpu.ops.pallas_lstm import padded_dim

    Dp = padded_dim(D)

    # bfloat16 training mode stores the replay ring and the history window
    # in bf16 (round-5: the event's dominant HBM streams halve -- window
    # gathers, history push, replay writes; the Q-net casts its inputs to
    # bf16 for the matmuls anyway, so the only numerics change is storage
    # rounding of states/shaped rewards, acceptable inside the already
    # non-bit-exact bf16 mode).  Channel-id representability in bf16
    # (ids <= 256) is asserted at creation (replay.py).  Env state and the
    # carry stay ``dtype``; float64 parity runs are untouched.
    store_dtype = (jnp.bfloat16
                   if (acfg.network.compute_dtype == "bfloat16"
                       and jnp.dtype(dtype) == jnp.dtype(jnp.float32))
                   else dtype)

    def qvalues(learner, history):
        """history [B, N, T*Dp] -> Q [B, N, A]: one forward for all agents
        of all envs (the CTDE parameter-sharing win; replaces the
        reference's per-user sess.run loop, main_test.py:127-136).  The
        agent-major flat history makes both paths zero-copy reshapes."""
        from diral_tpu.models import qnets

        if acfg.network.use_lstm_input:
            x = history.reshape(B * N, T * Dp)
        else:
            x = history[..., (T - 1) * Dp:(T - 1) * Dp + D].reshape(B * N, D)
        q = qnets.drqn_apply(learner.params, x, acfg)
        return q.reshape(B, N, -1)

    def history_push(history, nxt):
        """Slide the window one slot: drop the oldest Dp lanes, append the
        new state padded to Dp.  Built as slice+pad+concatenate -- ONE
        fused output write; the roll + .at[].set spelling lowered to a
        separate dynamic-update-slice that cost a measured 51 us/slot at
        the bench config (half the training-off slot work)."""
        tail = jnp.pad(jnp.asarray(nxt, history.dtype),
                       ((0, 0), (0, 0), (0, Dp - D)))
        return jnp.concatenate([history[..., Dp:], tail], axis=-1)

    # Warmup always uses the collision step (main_test.py:92 calls my_step
    # unconditionally); pretrain uses my_step_ch when enable_channel else
    # my_step_design (main_test.py:101-107).  Neither replays the recorded
    # trace: the reference arms load_positions_enable only at
    # env.load_saved_positions() (main_test.py:118), which runs AFTER the
    # pretrain loop — warmup/pretrain advance normal mobility.
    v_warmup = jax.vmap(
        lambda s, a, t: E.step_collision(env_cfg, s, a, t, trace=None),
        in_axes=(0, 0, None),
    )
    if cfg.enable_channel:
        v_pretrain = jax.vmap(
            lambda s, a, t: step_env(env_cfg, s, a, t, trace=None),
            in_axes=(0, 0, None),
        )
    else:
        v_pretrain = jax.vmap(
            lambda s, a, t: E.step_design(env_cfg, s, a, t, trace=None),
            in_axes=(0, 0, None),
        )

    def init_carry(key) -> TrainCarry:
        # 5-way split: the carried key must be a FRESH stream, not the
        # parent key whose children are consumed below (reusing the parent
        # would make slot 0's action/train/velocity keys collide with the
        # init keys)
        k_env, k_act, k_pre, k_rest, k_carry = jax.random.split(key, 5)
        env_state = v_reset(jax.random.split(k_env, B))

        # Warmup step (main_test.py:89-94): random action, collision step,
        # first state; its rewards are the stale ones reused all pretrain.
        a0 = v_sample(jax.random.split(k_act, B))
        env_state, obs0, rews0 = v_warmup(env_state, a0, 0)
        state0 = v_obtain(env_state, obs0, a0, rews0, 0, float(acfg.eps_init))

        # mirror pad = the training sample window, so window gathers are
        # contiguous (see sample_windows_cross_env_many)
        window = T if acfg.network.use_lstm_input else 1
        replay = jax.vmap(
            lambda _: FusedWindowReplay.create(cfg.memory_size, N, D,
                                               store_dtype,
                                               num_actions=C, pad=window)
        )(jnp.arange(B))

        history = jnp.zeros((B, N, T * Dp), store_dtype)

        def pretrain_body(carry, k):
            env_state, state, replay, history = carry
            acts = v_sample(jax.random.split(k, B))
            env_state, obs, _ = v_pretrain(env_state, acts, 0)
            nxt = v_obtain(env_state, obs, acts, rews0, 0, float(acfg.eps_init))
            replay = v_add(replay, state, acts, rews0)
            history = history_push(history, nxt)
            return (env_state, nxt, replay, history), None

        n_pre = cfg.pretrain_length * cfg.step_size * 5
        (env_state, state, replay, history), _ = jax.lax.scan(
            pretrain_body, (env_state, state0, replay, history),
            jax.random.split(k_pre, n_pre),
        )

        learner = drqn.init_learner(k_rest, D, C, acfg, dtype)
        return TrainCarry(
            env_state=env_state,
            history=history,
            state=state,
            replay=replay,
            learner=learner,
            eps_state=pol.eps_greedy_init(acfg.eps_init),
            beta=jnp.asarray(acfg.beta, jnp.float32),
            sum_ia_prev=jnp.zeros((B,), dtype),
            ia_counter=jnp.zeros((B, N), jnp.int32),
            prev_actions=jnp.full((B, N), -1, jnp.int32),
            key=k_carry,
        )

    # Window-gather lowering.  The scan-of-dynamic-slices variant was
    # built to dodge the batched gather's whole-ring operand copy (single
    # dynamic-slice reads of the loop carry alias in place) -- and
    # measured NEGATIVE on both counts at the scale config (round 5):
    # 604 vs 691 f32 slots/s at B=16 (the ~512 sequential slices cost
    # more than the 0.7 GB copy), and the B=192 compile still demanded
    # ~2x the ring (17.15 GB), so the capacity win did not materialize
    # either.  "auto" therefore resolves to the batched gather; "scan"
    # stays available as an explicit experimental knob.
    gi = cfg.engine.gather_impl
    if gi == "auto":
        gi = "gather"
    elif gi not in ("gather", "scan"):
        raise ValueError(f"bad gather_impl {gi!r}")

    def train_call(learner, replay, key, t):
        use_lstm = acfg.network.use_lstm_input
        step = T if use_lstm else 1
        return drqn.train(
            learner, replay, key, t, acfg, N,
            sample_fn=lambda k: sample_windows_cross_env(
                replay, k, acfg.batch_size, step
            ),
            # LSTM path: combined windows feed the fused triple-forward
            # train step (drqn.train_on_windows); the MLP path keeps the
            # sliced states/next rows
            sample_rows_fn=lambda ks: sample_window_rows_many(
                replay, ks, acfg.batch_size, step, windows_only=use_lstm,
                gather_impl=gi
            ),
        )

    def slot_core(carry: TrainCarry, t):
        """One slot WITHOUT the train event: inference, action selection,
        env step, shaping, replay/history update.  Returns
        (carry, logs-sans-loss, k_train) so the two dispatch grains below
        can share it.  ``k_train`` is split here so the RNG stream is
        identical whichever grain consumes it."""
        key, k_act, k_vel, k_train = jax.random.split(carry.key, 4)
        episode = (t // cfg.episode_interval).astype(jnp.int32)
        # positions are logged BEFORE the env step, as the reference does
        # (main_test.py:140-142 reads get_x_pos() before my_step)
        pos_pre = carry.env_state.pos_x

        # Slot-indexed mode switch (main_test.py:127-136); with load_model
        # the reference skips straight to greedy (the `not load_model`
        # guards).  The middle band uses the configured policy
        # (drl_drqn.py:97-106).
        explore_until = 0 if cfg.load_model else cfg.explore
        greedy_after = 0 if cfg.load_model else cfg.greedy

        # Epsilon decays only while the eps-greedy policy is actually
        # consulted: the reference's explore band returns before
        # policy.action (drl_drqn.py:167-169) and the greedy band bypasses
        # it (main_test.py:136), so EpsilonGreedy.update_eps never fires
        # there (policies.py:45-48).
        in_mid_band = (t >= explore_until) & (t < greedy_after)
        decayed = pol.eps_greedy_update(carry.eps_state, episode,
                                        acfg.eps_decay, acfg.eps_min)
        eps_state = jax.tree.map(
            lambda new, old: jnp.where(in_mid_band, new, old),
            decayed, carry.eps_state,
        )
        beta_state = pol.boltzman_update(pol.BoltzmanState(beta=carry.beta), t)
        q = qvalues(carry.learner, carry.history)  # [B, N, A]

        def select(k, qb):
            ke, kp = jax.random.split(k)
            rand = pol.random_action(ke, N, C)
            if acfg.policy == "softmax":
                mid, _ = pol.softmax_action(kp, qb, softmax_schedule, episode,
                                            acfg.temperature)
            elif acfg.policy == "boltzman":
                mid = pol.boltzman_action(
                    kp, qb, beta_state, t,
                    explore_start=acfg.explore_start,
                    explore_stop=acfg.explore_stop,
                    decay_rate=acfg.decay_rate, alpha=acfg.alpha,
                )
            elif acfg.policy == "eps_greedy":
                mid = pol.eps_greedy_action(kp, qb, eps_state.eps)
            else:
                mid = pol.greedy_action(qb)
            greedy = pol.greedy_action(qb)
            return jnp.where(t < explore_until, rand,
                             jnp.where(t < greedy_after, mid, greedy))

        actions = jax.vmap(select)(jax.random.split(k_act, B), q).astype(jnp.int32)

        env_state, obs, rewards = v_step(carry.env_state, actions, t)

        ia_hist = v_ia(env_state, t)                        # [B, IA]
        ia_sum = E.ia_penalty(ia_hist).astype(dtype)        # [B]

        next_state = v_obtain(env_state, obs, actions, rewards, episode,
                              eps_state.eps)

        sum_r = rewards.sum(axis=1)                         # [B] raw
        shaped = rewards
        sum_ia_prev = carry.sum_ia_prev
        if cfg.ia_averaging:
            delta = jnp.where(ia_sum > sum_ia_prev, -1.0,
                              jnp.where(ia_sum < sum_ia_prev, 1.0, 0.0))
            shaped = shaped + delta[:, None].astype(dtype)
            sum_ia_prev = ia_sum
        ia_counter, prev_actions = carry.ia_counter, carry.prev_actions
        if cfg.ia_penalty_enable:
            repeat = (shaped < 1) & (actions == prev_actions)
            ia_counter = jnp.where(repeat, ia_counter + 1, 0)
            shaped = jnp.where(ia_counter > cfg.ia_penalty_threshold,
                               jnp.asarray(cfg.ia_penalty_value, dtype), shaped)
        prev_actions = actions
        if cfg.global_reward_avg:
            shaped = shaped + (sum_r / N)[:, None]

        replay = v_add(carry.replay, carry.state, actions, shaped)
        history = history_push(carry.history, next_state)

        # Per-episode velocity randomization at episode end
        # (main_test.py:226-233 calls env.update_velocity(); no-op unless
        # mobility_vary, test_env.py:498-504).
        if env_cfg.mobility_vary:
            episode_end = t % cfg.episode_interval == cfg.episode_interval - 1
            kicked = jax.vmap(lambda s, k: E.update_velocity(env_cfg, s, k))(
                env_state, jax.random.split(k_vel, B)
            )
            env_state = env_state.replace(
                vel=jnp.where(episode_end, kicked.vel, env_state.vel)
            )

        carry = TrainCarry(
            env_state=env_state, history=history, state=next_state,
            replay=replay, learner=carry.learner, eps_state=eps_state,
            beta=beta_state.beta, sum_ia_prev=sum_ia_prev,
            ia_counter=ia_counter, prev_actions=prev_actions, key=key,
        )
        logs = {
            "sum_reward": sum_r,            # [B] raw per-slot sum (main_test.py:171)
            "actions": actions,             # [B, N]
            "eps": eps_state.eps,
            # pre-step positions, as the reference logs them before my_step
            # (main_test.py:140-142); `carry` above is already the NEXT
            # carry, so this must use the snapshot taken at slot entry
            "pos_x": pos_pre if cfg.save_positions else jnp.zeros((0,)),
        }
        return carry, logs, k_train

    def train_gate(t, replay):
        window = T if acfg.network.use_lstm_input else 1
        if cfg.train_after_episode:
            do_train = (
                (t % cfg.episode_interval == cfg.episode_interval - 1)
                & (t > acfg.batch_size + 10)
            )
        else:
            # Gate per-slot training on buffer fill: the reference would
            # raise in np.random.choice(replace=False) on an underfull
            # buffer (memory.py:184); here an ungated call would silently
            # pad the batch with zero-initialized windows.
            enough = (replay.count[0] - window) * B >= acfg.batch_size
            do_train = (t < cfg.training_stop) & enough
        if not cfg.training:
            do_train = jnp.asarray(False)
        return do_train

    def slot_step(carry: TrainCarry, t):
        carry, logs, k_train = slot_core(carry, t)
        learner, loss = jax.lax.cond(
            train_gate(t, carry.replay),
            lambda l: train_call(l, carry.replay, k_train, t),
            lambda l: (l, jnp.zeros((), dtype)),  # dtype: f64 runs must
            carry.learner,                        # match the train branch
        )
        carry = carry.replace(learner=learner)
        logs = dict(logs, loss=loss)
        return carry, logs

    def episode_step(carry: TrainCarry, e):
        """One full episode (``episode_interval`` slots + the episodic train
        event) -- the production dispatch grain for train_after_episode
        configs, bit-identical to ``episode_interval`` slot_step calls.

        Why it exists (TPU): slot_step wraps the train event in a
        ``lax.cond`` evaluated every slot; XLA passes the captured replay
        buffers (~200 MB at B=256) through the conditional by value, and the
        measured copies were 27% of the whole train event (profiled on
        v5e: 1.4 ms of 5.25 ms per event).  At episode grain the train call
        runs unconditionally -- straight-line code, no conditional, no
        copies -- and a ``jnp.where`` keeps the old learner while the
        reference gate (t > batch_size + 10, main_test.py:235) is still
        false; the discarded speculative train steps only happen in the
        first ~(batch_size+10)/interval episodes of a run."""
        t0 = e * cfg.episode_interval
        def body(c, t):
            c, logs, k_train = slot_core(c, t)
            return c, (logs, k_train)
        carry, (logs, k_trains) = jax.lax.scan(
            body, carry, t0 + jnp.arange(cfg.episode_interval),
            unroll=min(5, cfg.episode_interval))
        t_last = t0 + cfg.episode_interval - 1
        do_train = train_gate(t_last, carry.replay)
        trained, loss = train_call(carry.learner, carry.replay,
                                   k_trains[-1], t_last)
        learner = jax.tree.map(
            lambda new, old: jnp.where(do_train, new, old),
            trained, carry.learner)
        carry = carry.replace(learner=learner)
        # per-slot loss layout identical to slot_step: zeros except the
        # episode-end slot
        loss_row = jnp.zeros((cfg.episode_interval,), dtype).at[-1].set(
            jnp.where(do_train, loss, jnp.zeros((), dtype)))
        logs = dict(logs, loss=loss_row)
        return carry, logs

    @partial(jax.jit, static_argnames=("num_slots",))
    def run(key, num_slots: int):
        carry = init_carry(key)
        carry, logs = jax.lax.scan(slot_step, carry, jnp.arange(num_slots))
        return carry, logs

    # Episode-grain dispatch is only meaningful (and only bit-identical)
    # when the train cadence IS episodic; the runner falls back to
    # slot_step otherwise and for interval-unaligned chunk remainders.
    slot_step.episode_step = (
        episode_step if cfg.training and cfg.train_after_episode else None)
    slot_step.episode_interval = cfg.episode_interval
    return init_carry, slot_step, run


def run_experiment(cfg: ExperimentConfig, seed: int | None = None,
                   num_slots: int | None = None, dtype=jnp.float32):
    """Convenience: build and execute the full loop. Returns (carry, logs)."""
    _, _, run = make_train_functions(cfg, dtype)
    key = jax.random.PRNGKey(cfg.engine.seed if seed is None else seed)
    return run(key, cfg.time_slots if num_slots is None else num_slots)
