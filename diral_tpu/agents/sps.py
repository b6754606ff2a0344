"""Semi-Persistent Scheduling (SPS), the 5G mode-4 baseline -- vectorized.

The reference implements per-UE SPS objects driven by RSSI sensing from the
RealNeS simulator (reference algorithms/v2x_sps.py): a reselection counter
in [5, 15], keep-probability 0.8 on expiry, and candidate-resource selection
by RSSI threshold with +3 dB relaxation until at least 20% of the selection
window qualifies, picking uniformly among the best-RSSI shortlist
(v2x_sps.py:24-74).  This is the comparison baseline for the paper's +20%
PRR claim (README.md:5).

Here the whole agent population is one pytree stepped in parallel:

* counter > 0  -> repeat previous subframe, decrement (v2x_sps.py:86-90);
* on expiry    -> counter ~ U{5, 15}; keep with p = 0.8 else reselect
  (v2x_sps.py:92-98; note the reference resets the counter with
  ``randint(5, 16)`` = U{5,16} inclusive at this site -- reproduced);
* reselection  -> threshold grown by +3 dB under ``lax.while_loop`` until
  >= floor(C/5) candidates (exclusive of the previous action), stable-rank
  by RSSI ascending, uniform choice among the first
  ``min(floor(C/5), |candidates|)`` (v2x_sps.py:36-74).

Since the toy world has no channel sounding, ``toy_rssi`` provides a
free-space sensing proxy so SPS and DIRAL can be compared on the same
mobility traces (the reference's comparison lived inside RealNeS; the
sensing model is a framework design choice, documented here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from diral_tpu.config import EnvConfig
from diral_tpu.ops.distance import pairwise_distances

NOISE_FLOOR_DB = -117.0   # idle-channel sensing level (v2x_sps.py:20 comment)
RX_BUSY_DB = -90.0        # reference scale: active resources sense much hotter


class SPSState(struct.PyTreeNode):
    prev_action: jax.Array  # [N] int32
    counter: jax.Array      # [N] int32


def sps_init(key, num_users: int, num_channels: int) -> SPSState:
    ka, kc = jax.random.split(key)
    return SPSState(
        # txSubframe = randint(0, C) inclusive in the reference
        # (v2x_sps.py:13, random.randint is closed) -- clip into range.
        prev_action=jnp.minimum(
            jax.random.randint(ka, (num_users,), 0, num_channels + 1),
            num_channels - 1,
        ).astype(jnp.int32),
        counter=jax.random.randint(kc, (num_users,), 5, 16).astype(jnp.int32),
    )


def _choose_new_resource(key, rssi, prev_action, rssi_threshold):
    """One agent's candidate selection (v2x_sps.py:24-74). rssi: [C]."""
    c = rssi.shape[0]
    if c == 1:  # degenerate one-resource window: nothing to reselect
        return jnp.zeros((), jnp.int32)
    # 20% of the window (Python2 integer division, v2x_sps.py:39), floored
    # at 1: with C < 5 the reference's min_sA = 0 makes it crash on an empty
    # shortlist; requiring at least one candidate also keeps the +3 dB
    # relaxation loop meaningful on small windows.
    min_sa = max(c // 5, 1)
    not_prev = jnp.arange(c) != prev_action

    def enough(thr):
        return jnp.sum(not_prev & (rssi < thr)) < min_sa

    thr = jax.lax.while_loop(
        lambda t: enough(t), lambda t: t + 3.0,
        jnp.asarray(rssi_threshold, rssi.dtype),
    )
    # membership uses the first threshold that passes the 20% floor, as in
    # the reference scan-then-increment loop (v2x_sps.py:41-50)
    candidates = not_prev & (rssi < thr)
    n_cand = jnp.sum(candidates)
    # stable ascending-RSSI rank among candidates (sorted(), v2x_sps.py:53)
    masked = jnp.where(candidates, rssi, jnp.inf)
    order = jnp.argsort(masked)  # stable
    # shortlist = first min(min_sA, |sA|) of the ascending-RSSI ranking
    # (v2x_sps.py:54-58); the while_loop above guarantees n_cand >= min_sa
    # >= 1 so the shortlist is never empty and never contains prev_action.
    shortlist_len = jnp.minimum(min_sa, n_cand)
    pick = jax.random.randint(key, (), 0, shortlist_len)
    return order[pick].astype(jnp.int32)


def sps_step(key, state: SPSState, rssi, rssi_threshold: float):
    """All agents advance one scheduling round. rssi: [N, C] sensed dB.
    Returns (actions [N], new state)."""
    n, c = rssi.shape
    k_cnt, k_keep, k_choose = jax.random.split(key, 3)
    expired = state.counter == 0

    new_counter_draw = jax.random.randint(k_cnt, (n,), 5, 17)  # U{5,16}, v2x_sps.py:92
    keep = jax.random.uniform(k_keep, (n,)) < 0.8

    chosen = jax.vmap(
        lambda k, r, p: _choose_new_resource(k, r, p, rssi_threshold)
    )(jax.random.split(k_choose, n), rssi, state.prev_action)

    reselect = expired & ~keep
    actions = jnp.where(reselect, chosen, state.prev_action).astype(jnp.int32)
    counter = jnp.where(expired, new_counter_draw, state.counter - 1).astype(jnp.int32)
    # prev_action updates only on actual reselection (v2x_sps.py:98-99)
    prev = jnp.where(reselect, actions, state.prev_action)
    return actions, SPSState(prev_action=prev, counter=counter)


def toy_rssi(cfg: EnvConfig, pos_x, pos_y, last_actions):
    """Free-space sensing proxy for the toy world: per (listener, channel),
    the strongest received power over last slot's transmitters on that
    channel; idle channels sense the noise floor.  [N], [N] , [N] -> [N, C]."""
    n, c = cfg.num_users, cfg.num_channels
    D = pairwise_distances(pos_x, pos_y)
    # received power in dB ~ -20 log10(d); transmitter itself excluded
    power = RX_BUSY_DB - 20.0 * jnp.log10(jnp.maximum(D, 1.0))
    eye = jnp.eye(n, dtype=bool)
    on_channel = jax.nn.one_hot(last_actions, c, dtype=bool)  # [N, C]
    # sensed[u, ch] = max over tx != u with action ch of power[u, tx]
    p = jnp.where(eye, -jnp.inf, power)[:, :, None]           # [u, tx, 1]
    contrib = jnp.where(on_channel[None, :, :], p, -jnp.inf)  # [u, tx, ch]
    sensed = contrib.max(axis=1)
    return jnp.maximum(sensed, NOISE_FLOOR_DB)
