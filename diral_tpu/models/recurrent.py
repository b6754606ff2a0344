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
    """xs [B, T, D] -> (final_carry, hs [B, T, H]).

    TPU layout: the input projection for ALL timesteps is hoisted out of
    the time loop into one [B*T, D] x [D, 4H] MXU contraction, leaving
    only the [B, H] x [H, 4H] recurrent matmul per step; the short time
    loop (history windows are T <= 10) is fully unrolled so the backward
    pass is a flat graph XLA can fuse instead of a scanned one (measured
    1.4x on the DRQN train event).  Numerics differ from ``lstm_cell``'s
    concat-matmul only in f32 summation order (ULP-level).
    """
    b = xs.shape[0]
    hidden = params["w"].shape[1] // 4
    d = params["w"].shape[0] - hidden
    if carry is None:
        zero = jnp.zeros((b, hidden), xs.dtype)
        carry = (zero, zero)
    w_h = params["w"][d:]
    xg = xs @ params["w"][:d] + params["b"]  # [B, T, 4H], one contraction

    def body(c, g):
        cc, h = c
        gates = g + h @ w_h
        i, gg, f, o = jnp.split(gates, 4, axis=-1)
        new_c = cc * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(gg)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    t = xs.shape[1]
    carry, hs = jax.lax.scan(body, carry, jnp.swapaxes(xg, 0, 1),
                             unroll=True if t <= 16 else 4)
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
    """xs [B, T, D] -> (final_h, hs [B, T, H]).

    Same TPU layout as ``lstm_scan``: the input half of both gate
    projections is hoisted to one whole-window MXU contraction; only the
    hidden-state halves stay inside the (short, unrolled) time loop.
    ULP-level difference vs ``gru_cell``'s concat-matmul (f32 summation
    order)."""
    b, t, _ = xs.shape
    hidden = params["wc"].shape[1]
    d = params["wg"].shape[0] - hidden
    if h is None:
        h = jnp.zeros((b, hidden), xs.dtype)
    wg_h, wc_h = params["wg"][d:], params["wc"][d:]
    xg = xs @ params["wg"][:d] + params["bg"]  # [B, T, 2H]
    xc = xs @ params["wc"][:d] + params["bc"]  # [B, T, H]

    def body(hh, gx):
        g, c = gx
        r, z = jnp.split(jax.nn.sigmoid(g + hh @ wg_h), 2, axis=-1)
        cand = jnp.tanh(c + (r * hh) @ wc_h)
        new_h = z * hh + (1.0 - z) * cand
        return new_h, new_h

    h, hs = jax.lax.scan(
        body, h,
        (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(xc, 0, 1)),
        unroll=True if t <= 16 else 4)
    return h, jnp.swapaxes(hs, 0, 1)
