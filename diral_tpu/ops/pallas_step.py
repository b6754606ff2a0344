"""Pallas TPU kernel: the entire per-channel phase of ``step_channel``.

``my_step_ch`` (reference envs/test_env.py:351-443) iterates channels
sequentially; the iteration is irreducible because receivers merge the
*live* neighbor table of their accepted transmitter (vehicle.py:35-47,61),
so a table updated on channel k propagates transitively on channel k' > k
within the same slot.  The XLA ``lax.scan`` formulation round-trips the
four [B, N, N] tables plus last_arrival through HBM on every channel
iteration (~10 x 82 MB at B=2048/N=100), making the scale config HBM-bound
at ~13 ms per channel.  Per env, however, the whole working set is only
~250 KB — this kernel keeps it in VMEM for all C channels and touches HBM
once per step.

Per channel ch (bit-for-bit the semantics of envs/v2v_env.py::step_channel
body, itself cited to test_env.py:351-443):

* transmitter mask, closest in-range transmitter per receiver
  (first-occurrence argmin, network.py:378-398),
* PRR = receivers-reached / receivers-in-range, reward designs 2/3/4
  (test_env.py:384-404),
* half-duplex observation column (test_env.py:418-421),
* last-arrival bookkeeping: -1 for out-of-range pairs, slot index for
  accepted transmissions (test_env.py:427-436),
* seq-gated neighbor-table merge from the accepted transmitter's live
  table (vehicle.py:35-47).

Row-gathers by transmitter id are one-hot matmuls on the MXU (exact: a
0/1 matrix selects a single row; seq/x/y values are < 2^24 so their f32
images are exact).  All [N, N] work stays in VMEM at its logical shape
(Mosaic pads tiles internally); the only HBM traffic is the state
in/out.  Lift over the env axis with ``vmap``.

The matrices live in "receiver-major" layout (row r = receiver, col t =
transmitter, valid because D is symmetric); last_arrival is therefore
carried transposed and un-transposed by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diral_tpu.envs.v2v_env import NO_TX_DIST  # one sentinel, one definition

# table_seq rides the MXU as its float32 image inside the kernel
# (ts_ref[:].astype(f32)); integers are exact in f32 only below 2^24.  seq
# increments once per slot, so any run bounded below this is safe; callers
# that know the slot horizon (train/loop.py) enforce it up front.
MAX_EXACT_SEQ = 2 ** 24


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _channel_phase_kernel(px_c_ref, py_c_ref, px_r_ref, py_r_ref,
                          acts_c_ref, acts_r_ref,
                          tx_ref, ty_ref, ts_ref, ta_ref, la_t_ref,
                          slot_ref,
                          otx_ref, oty_ref, ots_ref, ota_ref, ola_t_ref,
                          orews_ref, oobs_t_ref, *,
                          c: int, comm_range: float, design: int,
                          merge: bool):
    """One env.  Inputs: positions in both layouts ([N, 1] and [1, N]),
    actions likewise (int32), tables [N, N], last_arrival TRANSPOSED
    [N, N], slot index in SMEM; shapes are logical -- Mosaic tiles/pads
    them internally with masked reductions.  Outputs: updated tables,
    transposed last_arrival, rewards [8, N] (row 0), transposed obs
    [Cp, N]."""
    np_ = tx_ref.shape[0]
    f32 = jnp.float32
    R = f32(comm_range)
    no_tx = f32(NO_TX_DIST)

    px_c = px_c_ref[:, 0:1]                  # [Np, 1]
    py_c = py_c_ref[:, 0:1]
    px_r = px_r_ref[0:1, :]                  # [1, Np]
    py_r = py_r_ref[0:1, :]
    acts_c = acts_c_ref[:, 0:1]              # [Np, 1] int32
    acts_r = acts_r_ref[0:1, :]              # [1, Np]
    t_slot = slot_ref[0]                     # int32 scalar

    # D[r, t] (ops/distance.py::pairwise_distances: dx = x_r - x_t)
    dx = px_c - px_r
    dy = py_c - py_r
    D = jnp.sqrt(dx * dx + dy * dy)          # [Np, Np]
    in_rng = D < R

    iota_col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    obs_rows = jax.lax.broadcasted_iota(
        jnp.int32, (oobs_t_ref.shape[0], np_), 0)

    def body(ch, carry):
        tx, ty, ts_f, ta, la_t, rews, obs_t = carry
        txm_r = acts_r == ch                 # [1, Np]
        txm_c = acts_c == ch                 # [Np, 1]
        tot = jnp.sum(txm_r.astype(f32))
        any_tx = tot > 0.0
        invoked_r = (~txm_r) & any_tx
        invoked_c = (~txm_c) & any_tx

        # closest in-range transmitter per receiver (network.py:378-398)
        cand = jnp.where(txm_r & in_rng, D, no_tx)           # [r, t]
        cd = jnp.min(cand, axis=1, keepdims=True)            # [Np, 1]
        achieved = cand == cd
        cid = jnp.min(jnp.where(achieved, iota_col, np_),
                      axis=1, keepdims=True)                  # [Np, 1]
        has_c = cd < no_tx                                    # [Np, 1]
        accept = iota_col == cid                              # [r, t] one-hot

        # PRR per transmitter (test_env.py:384-404); aud transposed to
        # [r, t] via D's symmetry
        aud_t = txm_r & (~txm_c) & in_rng                     # [r, t]
        in_range = jnp.sum(aud_t.astype(f32), axis=0, keepdims=True)
        got = aud_t & has_c & accept
        received = jnp.sum(got.astype(f32), axis=0, keepdims=True)
        prr = jnp.where(in_range > 0.0,
                        received / jnp.where(in_range > 0.0, in_range, 1.0),
                        1.0)                                  # [1, Np]

        if design == 3:
            r_coll, r_solo = 1.0 - jnp.exp(1.0 - prr), f32(1.0)
        elif design == 4:
            r_coll, r_solo = -jnp.exp(1.0 - prr), f32(jnp.e)
        else:
            r_coll, r_solo = -(1.0 - prr), f32(1.0)
        r_tx = jnp.where(tot > 1.0, r_coll, r_solo)
        rews = jnp.where(txm_r, r_tx, rews)

        # half-duplex obs column ch (test_env.py:418-421)
        col = jnp.where(txm_r, 0.0, jnp.where(invoked_r, 1.0, 0.0))
        obs_t = jnp.where(obs_rows == ch, col, obs_t)

        # last-arrival bookkeeping, in [r, t] layout (test_env.py:427-436)
        oor_t = txm_r & invoked_c & ~in_rng
        la_t = jnp.where(oor_t, -1, la_t)
        arr_t = (invoked_c & has_c) & accept
        la_t = jnp.where(arr_t, t_slot, la_t)

        if merge:
            # gather the accepted transmitter's LIVE table row via a
            # one-hot matmul (vehicle.py:35-47; transitive within the slot).
            # Precision.HIGHEST is required for exactness: the MXU's default
            # f32 path truncates inputs to bf16, which corrupts seq numbers
            # > 256 and position values (verified on-device; with HIGHEST
            # the one-hot gather is exact).
            hi = jax.lax.Precision.HIGHEST
            sel = accept.astype(f32)
            src_x = jnp.dot(sel, tx, preferred_element_type=f32, precision=hi)
            src_y = jnp.dot(sel, ty, preferred_element_type=f32, precision=hi)
            src_s = jnp.dot(sel, ts_f, preferred_element_type=f32,
                            precision=hi)
            newer = (src_s > ts_f) & (invoked_c & has_c)
            tx = jnp.where(newer, src_x, tx)
            ty = jnp.where(newer, src_y, ty)
            ts_f = jnp.where(newer, src_s, ts_f)
            ta = jnp.where(newer, 0, ta)
        return tx, ty, ts_f, ta, la_t, rews, obs_t

    carry = (
        tx_ref[:], ty_ref[:], ts_ref[:].astype(f32), ta_ref[:], la_t_ref[:],
        jnp.zeros((1, np_), f32),
        jnp.zeros((oobs_t_ref.shape[0], np_), f32),
    )
    tx, ty, ts_f, ta, la_t, rews, obs_t = jax.lax.fori_loop(
        0, c, body, carry)

    otx_ref[:] = tx
    oty_ref[:] = ty
    ots_ref[:] = ts_f.astype(jnp.int32)
    ota_ref[:] = ta
    ola_t_ref[:] = la_t
    orews_ref[:] = jnp.broadcast_to(rews, orews_ref.shape)
    oobs_t_ref[:] = obs_t


def channel_phase(pos_x, pos_y, actions, table_x, table_y, table_seq,
                  table_age, last_arrival, t, num_channels: int,
                  comm_range: float, design: int, merge: bool):
    """Fused per-channel phase of ``step_channel`` for ONE env.

    pos_x/pos_y: [N] f32, actions: [N] int32, tables/last_arrival: [N, N],
    t: int32 slot index.  Returns (table_x, table_y, table_seq, table_age,
    last_arrival, rewards [N], obs [N, C]).  vmap over a leading env axis.
    """
    # No explicit padding: Mosaic handles non-tile-aligned logical shapes
    # natively (internal tile padding, masked reductions).  Round 2 padded
    # every [N, N] operand to [128, 128] in XLA -- profiled at ~20% of the
    # scale config's slot work in pad + async-slice staging around the
    # kernel; the unpadded call is bit-identical (verified on device) and
    # skips all of it.
    n = pos_x.shape[0]
    cp = _round_up(max(num_channels, 1), 8)

    kernel = functools.partial(
        _channel_phase_kernel, c=num_channels, comm_range=float(comm_range),
        design=design, merge=merge)
    shapes = [
        jax.ShapeDtypeStruct((n, n), jnp.float32),   # table_x
        jax.ShapeDtypeStruct((n, n), jnp.float32),   # table_y
        jax.ShapeDtypeStruct((n, n), jnp.int32),     # table_seq
        jax.ShapeDtypeStruct((n, n), jnp.int32),     # table_age
        jax.ShapeDtypeStruct((n, n), jnp.int32),     # last_arrival^T
        jax.ShapeDtypeStruct((8, n), jnp.float32),   # rewards (row 0)
        jax.ShapeDtypeStruct((cp, n), jnp.float32),  # obs^T
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        interpret=jax.default_backend() != "tpu",
    )(
        pos_x.astype(jnp.float32)[:, None], pos_y.astype(jnp.float32)[:, None],
        pos_x.astype(jnp.float32)[None, :], pos_y.astype(jnp.float32)[None, :],
        actions.astype(jnp.int32)[:, None], actions.astype(jnp.int32)[None, :],
        table_x.astype(jnp.float32),
        table_y.astype(jnp.float32),
        table_seq.astype(jnp.int32),
        table_age.astype(jnp.int32),
        last_arrival.astype(jnp.int32).T,
        jnp.asarray(t, jnp.int32).reshape(1),
    )
    tx, ty, ts, ta, la_t, rews, obs_t = out
    return (tx, ty, ts, ta, la_t.T, rews[0], obs_t[:num_channels].T)
