"""Recurrent cells with fused gate matmuls.

The reference uses TF1 ``BasicLSTMCell`` (algorithms/drl_drqn.py:117) and
``GRUCell`` (algorithms/ps_drqn.py:146) via ``dynamic_rnn``.  Here each cell
is one [in+hidden, G*hidden] matmul per step -- a single MXU contraction --
scanned over time with ``lax.scan``.  Structural parity details preserved:
LSTM forget-gate bias offset of +1.0 (BasicLSTMCell default) and the
i, g, f, o gate layout; GRU with gate bias init 1.0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _glorot(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    lim = jnp.sqrt(6.0 / (fan_in + fan_out)).astype(dtype)
    return jax.random.uniform(key, shape, dtype, -lim, lim)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def lstm_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    return {
        "w": _glorot(key, (in_dim + hidden, 4 * hidden), dtype),
        "b": jnp.zeros((4 * hidden,), dtype),
    }


def lstm_cell(params, carry, x):
    """One step. carry = (c, h) each [B, H]; x [B, D]."""
    c, h = carry
    hidden = h.shape[-1]
    gates = jnp.concatenate([x, h], axis=-1) @ params["w"] + params["b"]
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return (new_c, new_h), new_h


def lstm_scan(params, xs, carry=None):
    """xs [B, T, D] -> (final_carry, hs [B, T, H])."""
    b = xs.shape[0]
    hidden = params["w"].shape[1] // 4
    if carry is None:
        zero = jnp.zeros((b, hidden), xs.dtype)
        carry = (zero, zero)
    carry, hs = jax.lax.scan(
        lambda c, x: lstm_cell(params, c, x), carry, jnp.swapaxes(xs, 0, 1)
    )
    return carry, jnp.swapaxes(hs, 0, 1)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------


def gru_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    kg, kc = jax.random.split(key)
    return {
        "wg": _glorot(kg, (in_dim + hidden, 2 * hidden), dtype),
        "bg": jnp.ones((2 * hidden,), dtype),  # TF GRUCell gate bias init 1.0
        "wc": _glorot(kc, (in_dim + hidden, hidden), dtype),
        "bc": jnp.zeros((hidden,), dtype),
    }


def gru_cell(params, h, x):
    """One step. h [B, H], x [B, D]."""
    xh = jnp.concatenate([x, h], axis=-1)
    rz = jax.nn.sigmoid(xh @ params["wg"] + params["bg"])
    r, z = jnp.split(rz, 2, axis=-1)
    cand = jnp.tanh(jnp.concatenate([x, r * h], axis=-1) @ params["wc"] + params["bc"])
    new_h = z * h + (1.0 - z) * cand
    return new_h, new_h


def gru_scan(params, xs, h=None):
    """xs [B, T, D] -> (final_h, hs [B, T, H])."""
    b = xs.shape[0]
    hidden = params["wc"].shape[1]
    if h is None:
        h = jnp.zeros((b, hidden), xs.dtype)
    h, hs = jax.lax.scan(
        lambda c, x: gru_cell(params, c, x), h, jnp.swapaxes(xs, 0, 1)
    )
    return h, jnp.swapaxes(hs, 0, 1)
