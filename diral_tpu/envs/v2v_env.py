"""Batched, pure-functional V2V resource-selection environment in JAX.

This is the TPU-native redesign of the reference environment stack
(reference envs/test_env.py + envs/network.py + envs/vehicle.py): the
mutating Vehicle/Network/TestEnv object graph becomes an ``EnvState``
pytree of flat arrays, and every step flavor is a pure function
``(cfg, state, actions, t) -> (state', obs, rew)`` that jits, vmaps over
thousands of env instances, and shards over a device mesh.

Vectorization map (reference construct -> here):

* per-channel Python collision scan (test_env.py:147-157)
  -> one-hot action matrix + per-channel masked reductions;
* ``find_closest_tx`` linear scan (network.py:378-398)
  -> masked argmin over a dense [N, N] distance matrix (first-occurrence
  argmin matches the reference's strict-< scan over ascending user ids);
* per-vehicle neighbor-table dicts (vehicle.py:20-70)
  -> [N, N] table arrays with seq-gated ``where`` merges;
* ``np.histogram`` positional distributions (network.py:473-513)
  -> ops.histogram masked equality-expansion histograms (bit-exact index
  math);
* mobility loop (network.py:189-206) -> one modular-arithmetic update.

Semantics follow the NumPy oracle (envs/oracle.py) exactly; golden tests
compare the two element-for-element in float64.  Sequencing that the
reference performs in channel order (piggyback merges feeding later
channels through the live-table aliasing quirk) is preserved by carrying
the table state through a per-channel loop; merges within one channel are
order-independent (a channel's transmitters are never its receivers, so no
table is both source and destination in the same channel).

Known deviations (out of the toy/BASELINE domain, documented):

* ``piggybacking=True`` observations are served in the REPAIRED fixed
  width the reference's own ``state_space`` sizing declares
  (``C + C*(C-1)``, test_env.py:71-79) rather than the faithful growing
  ``np.insert`` layout (test_env.py:241-254), which is data-dependent
  shape, crashes on ``prev_obs[None]`` when no transmitter is in range,
  and disagrees with that sizing.  See ``step_collision`` for the layout;
  the NumPy oracle carries both the faithful path and the repaired one
  (derived from the faithful path's logged insert payloads).
* ``state_type == 1`` with no in-range transmitter would crash the
  reference (test_env.py:230-232 indexes ``vehicles[None]``); here the
  merge is skipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from diral_tpu.config import EnvConfig
from diral_tpu.ops.distance import pairwise_distances, signed_dx
from diral_tpu.ops.histogram import masked_count_histogram, masked_weighted_histogram

STALENESS_CUTOFF = 20
NO_TX_DIST = 100000.0
IA_HORIZON = 100
PF_THRESHOLD = 10
PF_PENALTY = -10.0


class EnvState(struct.PyTreeNode):
    """Complete world state of one env instance (batch via vmap).

    Replaces the reference's Vehicle/Network object graph: positions and
    mobility (vehicle.py:9-15), per-vehicle neighbor tables
    (vehicle.py:20-33; row i = vehicle i's knowledge of vehicle j),
    packet-arrival bookkeeping (network.py:38-42), piggyback channel
    memory (test_env.py:77-79) and proportional-fair counters
    (test_env.py:87-92)."""

    pos_x: jax.Array      # [N] float
    pos_y: jax.Array      # [N] float
    vel: jax.Array        # [N] float
    direction: jax.Array  # [N] float, +1 right / -1 left
    table_x: jax.Array    # [N, N] float
    table_y: jax.Array    # [N, N] float
    table_seq: jax.Array  # [N, N] int32
    table_age: jax.Array  # [N, N] int32
    last_arrival: jax.Array  # [N, N] int32, (tx, rx), -1 = never/out-of-range
    prev_obs: jax.Array   # [N, C] float
    pf_counter: jax.Array  # [N] int32


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def _blank_state(cfg: EnvConfig, pos_x, pos_y, vel, direction, dtype) -> EnvState:
    n, c = cfg.num_users, cfg.num_channels
    # jnp.array (not asarray): on CPU, asarray can zero-copy alias a NumPy
    # buffer, so later in-place mutation by the caller (e.g. the oracle in
    # parity tests) would leak into this state.
    return EnvState(
        pos_x=jnp.array(pos_x, dtype),
        pos_y=jnp.array(pos_y, dtype),
        vel=jnp.array(vel, dtype),
        direction=jnp.array(direction, dtype),
        table_x=jnp.zeros((n, n), dtype),
        table_y=jnp.zeros((n, n), dtype),
        table_seq=jnp.zeros((n, n), jnp.int32),
        table_age=jnp.zeros((n, n), jnp.int32),
        last_arrival=jnp.full((n, n), -1, jnp.int32),
        prev_obs=jnp.zeros((n, c), dtype),
        pf_counter=jnp.zeros((n,), jnp.int32),
    )


def reset(cfg: EnvConfig, key: jax.Array, dtype=jnp.float32) -> EnvState:
    """Topology init with the reference's distributions and gating
    (network.py:92-119 via oracle._init_random_topology: integer x in
    [0, L), integer y in [0, H//2) (0 when H < 2 -- the toy's H=2 always
    gives y=0), speed U(1.1, 2.7), all moving right; randomized ONLY when
    mobility or the design topology is enabled, otherwise everything
    stays at the origin like the reference's uninitialized Network),
    drawn from JAX's threefry instead of the global NumPy/py RNGs.  For
    call-for-call RNG parity use the oracle + ``reset_from``."""
    n = cfg.num_users
    kx, ky, kv = jax.random.split(key, 3)
    if cfg.enable_design_topology:
        xs = jnp.asarray([0, 195, 390, 585, 780, 975][:n], dtype)
        ys = jnp.asarray([1, 1, 2, 2, 2, 2][:n], dtype)
        return _blank_state(cfg, xs, ys, jnp.ones(n, dtype), jnp.ones(n, dtype), dtype)
    if not cfg.mobility:
        z = jnp.zeros((n,), dtype)
        return _blank_state(cfg, z, z, z, jnp.ones(n, dtype), dtype)
    pos_x = jax.random.randint(kx, (n,), 0, cfg.highway_length).astype(dtype)
    half_h = cfg.highway_height // 2
    if half_h >= 1:
        pos_y = jax.random.randint(ky, (n,), 0, half_h).astype(dtype)
    else:
        pos_y = jnp.zeros((n,), dtype)
    if cfg.mobility_vary:
        vel = jnp.full((n,), 1.7, dtype)
    else:
        vel = jax.random.uniform(kv, (n,), dtype, 1.1, 2.7)
    return _blank_state(cfg, pos_x, pos_y, vel, jnp.ones(n, dtype), dtype)


def reset_fixed_4ue(cfg: EnvConfig, dtype=jnp.float32) -> EnvState:
    """Deterministic 4-vehicle fixture (network.py:81-90)."""
    return _blank_state(
        cfg, [3.0, 5.0, 3.0, 5.0], [1.0, 1.0, 2.0, 2.0],
        [0.5, 1.0, 1.25, 1.5], [1.0, 1.0, 1.0, 1.0], dtype,
    )


def reset_from(cfg: EnvConfig, pos_x, pos_y, vel, direction, dtype=jnp.float32) -> EnvState:
    """Inject an exact topology (oracle-parity entry point)."""
    return _blank_state(cfg, pos_x, pos_y, vel, direction, dtype)


def sample_actions(cfg: EnvConfig, key: jax.Array) -> jax.Array:
    """Uniform random action per user (test_env.py:116-122)."""
    return jax.random.randint(key, (cfg.num_users,), 0, cfg.num_channels)


# ---------------------------------------------------------------------------
# Internal building blocks
# ---------------------------------------------------------------------------


def _periodic_update(state: EnvState) -> EnvState:
    """All vehicles refresh their own table entry and age the rest
    (network.py:587-593 -> vehicle.py:56-70)."""
    n = state.table_x.shape[0]
    eye = jnp.eye(n, dtype=bool)
    return state.replace(
        table_x=jnp.where(eye, state.pos_x[:, None], state.table_x),
        table_y=jnp.where(eye, state.pos_y[:, None], state.table_y),
        table_seq=state.table_seq + eye.astype(state.table_seq.dtype),
        table_age=jnp.where(eye, 0, state.table_age + 1),
    )


# Below this vehicle count, min/argmin/row-gather lower to unrolled
# elementwise select folds instead of TPU variadic reduces / per-lane
# gathers: under an env vmap those reduce kernels cost ~200 us per call at
# B=8192 (the compiled toy step spent >60% of its time in them), while the
# unrolled folds fuse into neighbouring elementwise work.  Semantics are
# bit-identical: a strict-< fold IS first-occurrence argmin.  32 meets the
# pallas-kernel threshold from above, so no N hits the variadic reduces.
_UNROLL_N = 32


def _gather_rows(mat, ids):
    """mat[ids] (row gather) as an unrolled select fold for small N."""
    n = mat.shape[0]
    if n > _UNROLL_N:
        return mat[ids]
    acc = jnp.broadcast_to(mat[0], (ids.shape[0],) + mat.shape[1:])
    for tt in range(1, n):
        acc = jnp.where((ids == tt)[:, None], mat[tt], acc)
    return acc


def _min_argmin(vals, axis_len: int):
    """(min, first-occurrence argmin) over the last axis; unrolled fold for
    small N (exactly jnp.min/jnp.argmin semantics, incl. tie-break)."""
    if axis_len > _UNROLL_N:
        return vals.min(axis=-1), vals.argmin(axis=-1)
    best = vals[..., 0]
    best_i = jnp.zeros(best.shape, jnp.int32)
    for j in range(1, axis_len):
        better = vals[..., j] < best
        best = jnp.where(better, vals[..., j], best)
        best_i = jnp.where(better, j, best_i)
    return best, best_i


def _merge_tables(state: EnvState, rx_mask, tx_ids) -> EnvState:
    """Each rx with rx_mask merges tx_ids[rx]'s live table row into its own,
    entry-wise where the source sequence number is strictly newer
    (vehicle.py:35-47; live-table aliasing per vehicle.py:61)."""
    src_seq = _gather_rows(state.table_seq, tx_ids)
    newer = (src_seq > state.table_seq) & rx_mask[:, None]
    return state.replace(
        table_x=jnp.where(newer, _gather_rows(state.table_x, tx_ids),
                          state.table_x),
        table_y=jnp.where(newer, _gather_rows(state.table_y, tx_ids),
                          state.table_y),
        table_seq=jnp.where(newer, src_seq, state.table_seq),
        table_age=jnp.where(newer, 0, state.table_age),
    )


def _closest_tx(D, tx_mask, comm_range):
    """Per-receiver nearest in-range transmitter (network.py:378-398).

    Returns (dist [N], tx_id [N], has [N]); dist is NO_TX_DIST and has is
    False when no transmitter is within range.  First-occurrence argmin
    reproduces the reference's strict-< scan over ascending user ids."""
    cand = jnp.where(
        tx_mask[None, :] & (D < comm_range), D,
        jnp.asarray(NO_TX_DIST, D.dtype),
    )
    dist, tx_id = _min_argmin(cand, cand.shape[-1])
    has = dist < NO_TX_DIST
    return dist, tx_id, has


def _norm_distance(pos_x, D):
    """Distance between the (first) min-x and max-x vehicles
    (network.py:225-246; argmin/argmax first-occurrence matches the
    strict-< / strict-> scans)."""
    n = pos_x.shape[0]
    if n > _UNROLL_N:
        return D[jnp.argmin(pos_x), jnp.argmax(pos_x)]
    _, imin = _min_argmin(pos_x, n)
    _, imax = _min_argmin(-pos_x, n)  # strict-> fold == first argmax
    row = _gather_rows(D, imin[None])[0]
    acc = row[0]
    for j in range(1, n):
        acc = jnp.where(imax == j, row[j], acc)
    return acc


def _collision_reward(cfg: EnvConfig, D, norm_d, tx_mask, tot, dtype):
    """Shared reward for >=2 colliders on one channel (test_env.py:170-197
    designs 1-5; weight semantics network.py:273-300)."""
    tot_f = tot.astype(dtype)
    pair = tx_mask[:, None] & tx_mask[None, :]
    sum_d = jnp.sum(jnp.where(pair, D, 0)) / 2
    npairs = (tot * (tot - 1) // 2).astype(dtype)
    m = sum_d / npairs  # nan/inf when <2 colliders; always masked downstream
    if cfg.congestion_test:
        w = (m == norm_d).astype(dtype)
    else:
        w = (m > cfg.communication_range).astype(dtype)
    design = cfg.reward_design
    if design == 1:
        return -(1.0 - w / tot_f)
    if design == 2:
        return jnp.where(tot == 2, 2.0 * w - tot_f, -tot_f)
    if design == 3:
        return -jnp.exp(1.0 - 1.0 / tot_f)
    if design == 4:
        return 1.0 / tot_f
    if design == 5:
        return jnp.where((tot == 2) & (w == 1.0), 0.0, -1.0)
    raise ValueError(f"reward_design {design} undefined")


def _advance_mobility(cfg: EnvConfig, state: EnvState, t, trace) -> EnvState:
    """Modular x-advance or recorded-trace replay (network.py:189-206)."""
    if not cfg.mobility:
        return state
    if trace is not None:
        row = trace[t % trace.shape[0]][: cfg.num_users].astype(state.pos_x.dtype)
        return state.replace(pos_x=row)
    L = cfg.highway_length
    new_x = jnp.mod(state.pos_x + state.direction * state.vel + L, L)
    return state.replace(pos_x=new_x)


def update_velocity(cfg: EnvConfig, state: EnvState, key) -> EnvState:
    """Per-episode velocity kicks: +-0.55 with prob 1/3 each, clamped to
    [1.1, 2.77] (network.py:208-223), active only under mobility_vary
    (test_env.py:498-504)."""
    if not cfg.mobility_vary:
        return state
    r = jax.random.randint(key, state.vel.shape, 1, 4)
    vel = jnp.where(r == 1, jnp.minimum(state.vel + 0.55, 2.77), state.vel)
    vel = jnp.where(r == 2, jnp.maximum(state.vel - 0.55, 1.1), vel)
    return state.replace(vel=vel)


# ---------------------------------------------------------------------------
# Step flavors
# ---------------------------------------------------------------------------


# The reference walks channels sequentially because piggyback merges in an
# earlier channel feed later channels through the live-table aliasing
# (vehicle.py:61).  For small C the loop is unrolled into the program; for
# large C (e.g. the 50-resource scale config) it runs as a ``lax.scan`` over
# the channel axis -- same ops, same numerics, bounded program size.
CHANNEL_UNROLL_MAX = 8


def _channel_loop(c: int, body, carry):
    """Apply ``body(carry, ch) -> carry`` over channels 0..c-1, unrolled for
    small c and as a lax.scan otherwise."""
    if c <= CHANNEL_UNROLL_MAX:
        for ch in range(c):
            carry = body(carry, ch)
        return carry
    carry, _ = jax.lax.scan(
        lambda cr, ch: (body(cr, ch), None), carry, jnp.arange(c)
    )
    return carry


def step_collision(cfg: EnvConfig, state: EnvState, actions, t, trace=None):
    """``my_step`` semantics (test_env.py:124-266): per-channel collision
    rewards shared among colliders, half-duplex observations, piggyback
    merges from the closest transmitter, then mobility.

    ``piggybacking=True`` (test_env.py:241-254) is served in REPAIRED
    fixed width.  The faithful path grows each user's obs with
    ``np.insert(piggy_obs[user], ch, prev_obs[tx_id])`` per received
    channel: data-dependent shape, a ``prev_obs[None]`` crash when no
    transmitter is in range, and widths that disagree with the
    reference's own ``state_space`` sizing of ``C + C*(C-1)``
    (test_env.py:71-79, whose comment says the intent was zero padding).
    Here the intended fixed layout is produced directly::

        [ base obs (C) | block_0 (C) | ... | block_{C-2} (C) ]

    base = the regular channel obs row (tx_dist per received channel --
    exactly the values the faithful path writes at ``piggy_obs[u][ch]``);
    block_k = the payload for the k-th channel in ascending order
    skipping the user's own tx channel: ``prev_obs[closest_tx]`` when the
    channel carried an in-range transmission (state_type 2), zeros when
    the channel was empty or no transmitter was in range (the reference's
    crash case, repaired as zero padding).  ``prev_obs`` is last slot's
    obs matrix (test_env.py:262: ``self.prev_obs = obs`` post-loop).
    The NumPy oracle derives the same layout from the faithful path's
    logged insert payloads (oracle.piggy_fixed); golden tests assert
    bit-equality."""
    st = cfg.state
    n, c = cfg.num_users, cfg.num_channels
    dtype = state.pos_x.dtype
    acts = jax.nn.one_hot(actions, c, dtype=jnp.int32)  # [N, C]
    piggy = st.piggybacking

    if st.add_positional_dist_piggy:
        state = _periodic_update(state)
    prev_obs_in = state.prev_obs.astype(dtype)  # pre-step snapshot

    D = pairwise_distances(state.pos_x, state.pos_y)
    norm_d = _norm_distance(state.pos_x, D)
    tx_counts = acts.sum(axis=0)  # [C]

    def body(carry, ch):
        state, la, pf, rews, obs, blocks = carry
        txm = acts[:, ch] == 1
        tot = tx_counts[ch]
        transmission = tot > 0
        invoked = ~txm & transmission  # receivers that scan for a transmitter

        rewards_ch = _collision_reward(cfg, D, norm_d, txm, tot, dtype).astype(dtype)
        cd, cid, has = _closest_tx(D, txm, cfg.communication_range)

        if st.type == 1:
            rx_obs = jnp.where(invoked, jnp.asarray(1.0, dtype), 0)
        else:
            rx_obs = jnp.where(invoked, cd, 0)
        obs = obs.at[:, ch].set(jnp.where(txm, 0, rx_obs))

        r_tx = jnp.where(tot > 1, rewards_ch, jnp.asarray(1.0, dtype))
        rews = jnp.where(txm, r_tx, rews)
        if cfg.proportional_fair:
            coll = txm & (tot > 1)
            rews = jnp.where(coll & (pf > PF_THRESHOLD),
                             jnp.asarray(PF_PENALTY, dtype), rews)
            pf = jnp.where(coll, pf + 1, jnp.where(txm & (tot == 1), 0, pf))

        # find_closest_tx side effect: out-of-range (tx, rx) pairs reset to -1
        # for every receiver that scanned (network.py:394).
        oor = txm[:, None] & invoked[None, :] & (D >= cfg.communication_range)
        la = jnp.where(oor, -1, la)

        if st.add_positional_dist_piggy:
            state = _merge_tables(state, invoked & has, cid)
        if piggy and st.type == 2:
            payload = _gather_rows(prev_obs_in, cid)  # [N, C]
            blocks = blocks.at[:, ch].set(
                jnp.where((invoked & has)[:, None], payload, 0))
        return state, la, pf, rews, obs, blocks

    blocks0 = jnp.zeros((n, c, c), dtype) if piggy else jnp.zeros((0,), dtype)
    carry = (state, state.last_arrival, state.pf_counter,
             jnp.zeros((n,), dtype), jnp.zeros((n, c), dtype), blocks0)
    state, la, pf, rews, obs, blocks = _channel_loop(c, body, carry)

    state = state.replace(last_arrival=la, pf_counter=pf)
    if piggy:
        base = obs if st.type == 2 else jnp.zeros_like(obs)
        # compact [N, C, C] -> [N, C-1, C]: drop each user's own tx block
        k = jnp.arange(c - 1)[None, :]
        src = k + (k >= actions[:, None]).astype(k.dtype)  # [N, C-1]
        picked = jnp.take_along_axis(blocks, src[:, :, None], axis=1)
        obs_out = jnp.concatenate([base, picked.reshape(n, (c - 1) * c)], axis=1)
        state = state.replace(prev_obs=obs.astype(state.prev_obs.dtype))
    else:
        obs_out = obs
    state = _advance_mobility(cfg, state, t, trace)
    return state, obs_out, rews


def step_design(cfg: EnvConfig, state: EnvState, actions, t, trace=None):
    """``my_step_design`` semantics (test_env.py:269-349): rewards scoped to
    the transmitters within 2x communication range of each collider."""
    st = cfg.state
    n, c = cfg.num_users, cfg.num_channels
    dtype = state.pos_x.dtype
    acts = jax.nn.one_hot(actions, c, dtype=jnp.int32)

    if st.add_positional_dist_piggy:
        state = _periodic_update(state)

    D = pairwise_distances(state.pos_x, state.pos_y)
    two_r = 2 * cfg.communication_range

    def body(carry, ch):
        state, la, rews, obs = carry
        txm = acts[:, ch] == 1
        tot = txm.sum()
        invoked = ~txm & (tot > 0)

        # comm_range_tx per transmitter u: itself + other transmitters
        # within 2R (test_env.py:327-334).
        near = txm[None, :] & (D < two_r) & ~jnp.eye(n, dtype=bool)
        cnt = 1 + near.sum(axis=1)
        # cnt==2: the single in-range partner's distance; weight per
        # network.py:135-157 (always 0 on this domain, computed honestly).
        pair_d = jnp.sum(jnp.where(near, D, 0), axis=1)
        w2 = (pair_d > two_r).astype(dtype)
        cnt_f = cnt.astype(dtype)
        r_coll = jnp.where(cnt == 1, 1.0,
                           jnp.where(cnt == 2, jnp.where(w2 == 1.0, 0.0, -cnt_f),
                                     -cnt_f))
        r_tx = jnp.where(tot == 1, jnp.asarray(1.0, dtype), r_coll)
        rews = jnp.where(txm, r_tx, rews)

        obs = obs.at[:, ch].set(
            jnp.where(txm, 0, jnp.where(invoked, 1.0, 0.0)).astype(dtype)
        )

        cd, cid, has = _closest_tx(D, txm, cfg.communication_range)
        oor = txm[:, None] & invoked[None, :] & (D >= cfg.communication_range)
        la = jnp.where(oor, -1, la)
        if st.add_positional_dist_piggy:
            state = _merge_tables(state, invoked & has, cid)
        return state, la, rews, obs

    carry = (state, state.last_arrival, jnp.zeros((n,), dtype),
             jnp.zeros((n, c), dtype))
    state, la, rews, obs = _channel_loop(c, body, carry)
    state = state.replace(last_arrival=la)
    state = _advance_mobility(cfg, state, t, trace)
    return state, obs, rews


def step_channel(cfg: EnvConfig, state: EnvState, actions, t, trace=None):
    """``my_step_ch`` semantics (test_env.py:351-443): PRR-style reward --
    the fraction of in-range receivers whose nearest transmitter is you --
    mapped through reward designs 2/3/4, plus packet-arrival bookkeeping."""
    st = cfg.state
    n, c = cfg.num_users, cfg.num_channels
    dtype = state.pos_x.dtype
    acts = jax.nn.one_hot(actions, c, dtype=jnp.int32)

    if st.add_positional_dist_piggy:
        state = _periodic_update(state)

    D = pairwise_distances(state.pos_x, state.pos_y)
    R = cfg.communication_range

    design = cfg.reward_design
    if design not in (2, 3, 4):
        raise ValueError("my_step_ch defined for reward designs 2/3/4 only")

    if _pallas_step_wanted(cfg, dtype):
        from diral_tpu.ops.pallas_step import channel_phase

        tx, ty, ts, ta, la, rews, obs = channel_phase(
            state.pos_x, state.pos_y, actions, state.table_x, state.table_y,
            state.table_seq, state.table_age, state.last_arrival, t,
            c, float(R), design, st.add_positional_dist_piggy)
        state = state.replace(table_x=tx, table_y=ty, table_seq=ts,
                              table_age=ta, last_arrival=la)
        state = _advance_mobility(cfg, state, t, trace)
        return state, obs, rews

    def body(carry, ch):
        state, la, rews, obs = carry
        txm = acts[:, ch] == 1
        tot = txm.sum()
        invoked = ~txm & (tot > 0)

        cd, cid, has = _closest_tx(D, txm, R)

        # PRR per transmitter (test_env.py:384-404): receivers = non-tx in
        # range; received iff the receiver's nearest in-range tx is you.
        aud = txm[:, None] & (~txm)[None, :] & (D < R)  # [tx, rx]
        in_range = aud.sum(axis=1)
        received = (aud & has[None, :] & (cid[None, :] == jnp.arange(n)[:, None])).sum(axis=1)
        prr = jnp.where(in_range > 0,
                        received.astype(dtype) / in_range.astype(dtype),
                        jnp.asarray(1.0, dtype))

        if design == 3:
            r_coll, r_solo = 1.0 - jnp.exp(1.0 - prr), 1.0
        elif design == 4:
            r_coll, r_solo = -jnp.exp(1.0 - prr), float(jnp.e)
        else:
            r_coll, r_solo = -(1.0 - prr), 1.0
        r_tx = jnp.where(tot > 1, r_coll, jnp.asarray(r_solo, dtype))
        rews = jnp.where(txm, r_tx, rews)

        obs = obs.at[:, ch].set(
            jnp.where(txm, 0, jnp.where(invoked, 1.0, 0.0)).astype(dtype)
        )

        oor = txm[:, None] & invoked[None, :] & (D >= R)
        la = jnp.where(oor, -1, la)
        # arrival slot for each receiver's accepted transmitter (test_env.py:434-436)
        arr = (invoked & has)[None, :] & (cid[None, :] == jnp.arange(n)[:, None])
        la = jnp.where(arr, jnp.asarray(t, la.dtype), la)
        if st.add_positional_dist_piggy:
            state = _merge_tables(state, invoked & has, cid)
        return state, la, rews, obs

    carry = (state, state.last_arrival, jnp.zeros((n,), dtype),
             jnp.zeros((n, c), dtype))
    state, la, rews, obs = _channel_loop(c, body, carry)
    state = state.replace(last_arrival=la)
    state = _advance_mobility(cfg, state, t, trace)
    return state, obs, rews


def get_step_fn(cfg: EnvConfig, enable_channel: bool = False, design: bool = False):
    """Pick the step flavor the driver would use (main_test.py:143-147)."""
    if enable_channel:
        return step_channel
    if design:
        return step_design
    return step_collision


# ---------------------------------------------------------------------------
# Observation / state assembly
# ---------------------------------------------------------------------------


def _piggy_geometry(state: EnvState):
    """Signed distances from each vehicle's table entries to its own current
    position (network.py:538-558): d[u, o] uses u's *stored* position of o
    against u's *live* position; age gate < 20."""
    dx = state.table_x - state.pos_x[:, None]
    dy = state.table_y - state.pos_y[:, None]
    d = jnp.sqrt(dx * dx + dy * dy)
    sign = jnp.where(dx > 0.0, 1.0, -1.0).astype(d.dtype)
    n = d.shape[0]
    fresh = (state.table_age < STALENESS_CUTOFF) & ~jnp.eye(n, dtype=bool)
    return d, sign, fresh


def positional_dist_exact(cfg: EnvConfig, state: EnvState):
    """Sorted signed true distances / max distance, per user
    (network.py:409-430). [N, N-1]."""
    n = cfg.num_users
    D = pairwise_distances(state.pos_x, state.pos_y)
    signed = D * signed_dx(state.pos_x)
    eye = jnp.eye(n, dtype=bool)
    big = jnp.asarray(jnp.finfo(D.dtype).max, D.dtype)
    sorted_signed = jnp.sort(jnp.where(eye, big, signed), axis=1)[:, : n - 1]
    max_d = jnp.max(jnp.where(eye, -big, D), axis=1)
    return sorted_signed / max_d[:, None]


def positional_dist_piggy_type1(cfg: EnvConfig, state: EnvState):
    """Inf-norm-normalized weighted histogram over [-1, 1]
    (network.py:432-471). [N, num_bins]."""
    bins = cfg.state.num_bins
    d, sign, fresh = _piggy_geometry(state)
    signed = d * sign
    inf_norm = jnp.max(jnp.where(fresh, jnp.abs(signed), 0), axis=1)
    normed = signed / jnp.where(inf_norm > 0, inf_norm, 1)[:, None]
    hist = masked_weighted_histogram(normed, normed, fresh, -1.0, 1.0, bins)
    any_fresh = fresh.any(axis=1, keepdims=True)
    return jnp.where(any_fresh, hist, 0)


def _pallas_hist_wanted(cfg: EnvConfig, dtype) -> bool:
    impl = cfg.state.hist_impl
    if impl in ("xla", "lanes"):  # "lanes" forces the envs-in-lanes kernel
        return False
    if impl == "pallas":
        return True
    if impl != "auto":
        raise ValueError(f"bad hist_impl {impl!r}")
    # auto: the fused kernel wins where the XLA path's [N, N, bins] one-hot
    # expansion dominates; below that the 128-lane padding costs more than
    # it saves, and non-f32/non-TPU stays on the bit-exact canonical op
    return (cfg.num_users >= 32 and dtype == jnp.float32
            and jax.default_backend() == "tpu")


def _pallas_step_wanted(cfg: EnvConfig, dtype) -> bool:
    impl = cfg.step_impl
    if impl == "xla":
        return False
    if impl == "pallas":
        if dtype != jnp.float32:
            raise ValueError(
                "step_impl='pallas' is float32-only (the kernel would "
                "silently downcast); use the XLA path for float64 parity "
                "work")
        return True
    if impl != "auto":
        raise ValueError(f"bad step_impl {impl!r}")
    # auto: same shape of argument as _pallas_hist_wanted — the fused
    # kernel pays off once the per-channel [N, N] table round-trips
    # dominate; the kernel is f32-only (seq/age ride the MXU as exact
    # f32 images of ints < 2^24)
    return (cfg.num_users >= 32 and dtype == jnp.float32
            and jax.default_backend() == "tpu")


def _piggy_type2_from_parts(signed, valid, nbins: int, rng: float):
    """Batched-agnostic XLA tail of the type-2 piggy histogram:
    [..., N, N] signed distances + validity -> [..., N, nbins] normalized
    counts (network.py:473-513)."""
    hist = masked_count_histogram(signed, valid, -rng, rng, nbins)
    cnt = valid.sum(axis=-1).astype(hist.dtype)
    return jnp.where(cnt[..., None] > 0,
                     hist / jnp.where(cnt, cnt, 1)[..., None], 0)


@functools.lru_cache(maxsize=None)
def _piggy_type2_lanes_op(n: int, nbins: int, rng: float, force: bool):
    """custom_vmap wrapper: the per-env call is the canonical XLA path,
    but under the training loop's env vmap the batch is served by the
    envs-in-lanes Mosaic kernel (ops/pallas_kernels.piggy_histogram_lanes)
    -- the [B, N, N, bins] XLA expansion wastes >=87% of every tile on the
    tiny trailing dims at toy N (round-3 trace: ~42% of the whole step),
    while the kernel packs 128//(N*N) envs per lane row.  Counts are
    bit-identical (exact edge constants, integer-exact matmul reduction).
    A second vmap level (train-sweep) or f64/CPU falls back to the
    batched-agnostic XLA form inside the rule."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(signed, valid):
        return _piggy_type2_from_parts(signed, valid, nbins, rng)

    @op.def_vmap
    def rule(axis_size, in_batched, signed, valid):
        sb, vb = in_batched
        if not sb:
            signed = jnp.broadcast_to(signed, (axis_size,) + signed.shape)
        if not vb:
            valid = jnp.broadcast_to(valid, (axis_size,) + valid.shape)
        use_kernel = (signed.ndim == 3 and signed.dtype == jnp.float32
                      and n * n <= 128
                      and (force or jax.default_backend() == "tpu"))
        if use_kernel:
            from diral_tpu.ops.pallas_kernels import piggy_histogram_lanes

            B = signed.shape[0]
            hist, cnt = piggy_histogram_lanes(
                signed.reshape(B, n * n), valid.reshape(B, n * n),
                n, nbins, -rng, rng)
            out = jnp.where(cnt[..., None] > 0,
                            hist / jnp.where(cnt, cnt, 1)[..., None], 0)
        else:
            out = _piggy_type2_from_parts(signed, valid, nbins, rng)
        return out, True

    return op


def positional_dist_piggy_type2(cfg: EnvConfig, state: EnvState):
    """Count histogram over +-bin_range divided by visible-neighbor count
    (network.py:473-513) -- the toy config's view-based positional
    distribution. [N, num_bins]."""
    bins, rng = cfg.state.num_bins, cfg.bin_range
    if _pallas_hist_wanted(cfg, state.pos_x.dtype):
        from diral_tpu.ops.pallas_kernels import piggy_histogram

        return piggy_histogram(state.table_x, state.table_y, state.pos_x,
                               state.pos_y, state.table_age,
                               float(rng), bins)
    d, sign, fresh = _piggy_geometry(state)
    valid = fresh & (d < rng)
    impl = cfg.state.hist_impl
    # The envs-in-lanes kernel is NOT the auto path: an on-device A/B at
    # the toy bench shapes measured the engine headline at 62.1M
    # env-steps/s with it vs 78.0M on the XLA membership form (identical
    # reward checksums) -- the [B,16]->[B/8,128] pack relayout, the
    # per-step kernel launch and the [R,bins,E,N] unpack transpose cost
    # more than the tile waste they remove (results/lanes_hist_ab.json,
    # round 5; closes the round-3 "envs-in-lanes future work" thread with
    # a negative result).  It stays available behind hist_impl="lanes".
    if impl == "lanes" and cfg.num_users ** 2 <= 128:
        op = _piggy_type2_lanes_op(cfg.num_users, bins, float(rng), True)
        return op(d * sign, valid)
    hist = masked_count_histogram(d * sign, valid, -float(rng), float(rng), bins)
    cnt = valid.sum(axis=1).astype(hist.dtype)
    return jnp.where(cnt[:, None] > 0, hist / jnp.where(cnt, cnt, 1)[:, None], 0)


def obtain_state(cfg: EnvConfig, state: EnvState, obs, actions, rewards,
                 episode=0, epsilon=1.0):
    """Per-user state-vector assembly in the reference's field order
    (test_env.py:527-583). [N, state_space]."""
    st = cfg.state
    n = cfg.num_users
    dtype = state.pos_x.dtype
    parts = []
    if st.add_action:
        if st.action_index == "binary":
            parts.append(jax.nn.one_hot(actions, cfg.num_channels, dtype=dtype))
        elif st.action_index == "real":
            parts.append(actions.astype(dtype)[:, None])
        else:
            raise ValueError("bad action_index")
    if st.add_channel_obs:
        ob = obs.astype(dtype)
        if st.piggybacking:
            # The piggy obs rides the channel-obs slot at the sizing's full
            # C + C*(C-1) width (test_env.py:71-79,547).  Step flavors
            # without a piggyback path (my_step_design / my_step_ch, used
            # by the driver's pretrain phase, main_test.py:101-107) emit
            # plain [N, C] rows; zero-pad them to the fixed width (the
            # reference would feed the net a ragged state and crash).
            want = cfg.num_channels * cfg.num_channels
            if ob.shape[1] < want:
                ob = jnp.pad(ob, ((0, 0), (0, want - ob.shape[1])))
        parts.append(ob)
    if st.add_positional_dist:
        parts.append(positional_dist_exact(cfg, state))
    if st.add_positional_dist_piggy:
        if st.add_positional_dist_type == 1:
            parts.append(positional_dist_piggy_type1(cfg, state))
        elif st.add_positional_dist_type == 2:
            parts.append(positional_dist_piggy_type2(cfg, state))
        else:
            raise ValueError("bad add_positional_dist_type")
    if st.add_reward:
        parts.append(rewards.astype(dtype)[:, None])
    if st.add_index:
        parts.append((jnp.arange(n, dtype=dtype) + 1)[:, None])
    if st.add_position:
        parts.append(
            jnp.stack(
                [state.pos_x / cfg.highway_length, state.pos_y / cfg.highway_height],
                axis=1,
            )
        )
    if st.add_velocity:
        parts.append(state.vel[:, None])
    if cfg.enable_fingerprint:
        fp = jnp.stack(
            [jnp.full((n,), episode, dtype), jnp.full((n,), epsilon, dtype)], axis=1
        )
        parts.append(fp)
    return jnp.concatenate(parts, axis=1)


def state_generator(cfg: EnvConfig, actions, obs) -> jax.Array:
    """DQN-era state assembly (test_env.py:507-525): per user, one-hot
    action ++ the LAST user's full channel-observation row (the
    reference's ``obs[-1]`` "channel_alloc") ++ the user's own
    first-channel observation truncated to int (the ACK).
    [N, 2*C + 1]."""
    n, c = cfg.num_users, cfg.num_channels
    dtype = obs.dtype
    onehot = jax.nn.one_hot(actions, c, dtype=dtype)
    channel_alloc = jnp.broadcast_to(obs[-1], (n, obs.shape[1]))
    ack = jnp.trunc(obs[:, 0]).astype(dtype)[:, None]
    return jnp.concatenate([onehot, channel_alloc, ack], axis=1)


def information_age(state: EnvState, t) -> jax.Array:
    """Histogram of packet ages over in-coverage (tx, rx) pairs
    (network.py:560-574). [IA_HORIZON] int32."""
    n = state.last_arrival.shape[0]
    valid = (state.last_arrival != -1) & ~jnp.eye(n, dtype=bool)
    ia = t - state.last_arrival
    contributes = valid & (ia < IA_HORIZON) & (ia >= 0)
    onehot = (ia[..., None] == jnp.arange(IA_HORIZON)) & contributes[..., None]
    return onehot.sum(axis=(0, 1)).astype(jnp.int32)


def ia_penalty(ia_hist) -> jax.Array:
    """Weighted information-age sum (reference utils/misc.py:1-12)."""
    w = jnp.arange(1, ia_hist.shape[-1] + 1, dtype=jnp.float32)
    return jnp.sum(ia_hist * w, axis=-1)
