"""Fused Pallas LSTM window kernel: interpret-mode parity vs the canonical
XLA path (models/recurrent.lstm_scan), forward AND custom-VJP gradients.

The kernel's matmuls cast inputs to bf16 with f32 accumulation (the XLA
default-matmul-precision class on TPU); on CPU the XLA path runs full f32,
so forward parity here uses a bf16-appropriate tolerance.  Gradient parity
is checked against jax.grad of a pure-JAX replica of the kernel's exact
precision recipe (tight tolerance), so the hand-written backward math is
verified independently of the precision question.  The COMPILED Mosaic
path is validated on the real device by bench.py's parity gate
(bench_kernel_parity -- the bf16-gather incident rule, CLAUDE.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diral_tpu.models.recurrent import lstm_init, lstm_scan
from diral_tpu.ops.pallas_lstm import lstm_last, supported


def _ref_bf16_class(x, w, b):
    """Pure-JAX replica of the kernel's precision recipe: bf16-input
    matmuls, f32 accumulation and gate math, last-step hidden out."""
    f32 = jnp.float32
    B, T, D = x.shape
    H = w.shape[1] // 4
    wx, wh = w[:D], w[D:]
    dot = lambda a, m: jnp.dot(a.astype(jnp.bfloat16),
                               m.astype(jnp.bfloat16),
                               preferred_element_type=f32)
    h = jnp.zeros((B, H), f32)
    c = jnp.zeros((B, H), f32)
    for t in range(T):
        gates = dot(x[:, t], wx) + dot(h, wh) + b.astype(f32)
        i, g, f, o = jnp.split(gates, 4, axis=-1)
        c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jnp.tanh(c) * jax.nn.sigmoid(o)
    return h.astype(x.dtype)


@pytest.mark.parametrize("B,T,D,H", [(8, 6, 23, 128), (300, 5, 23, 256)])
def test_forward_matches_precision_replica(B, T, D, H):
    """Bit-level agreement with the same-precision JAX replica (both run
    bf16-input matmuls), including non-tile-multiple batches (padding)."""
    assert supported(jnp.float32, H)
    k = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(k)
    p = lstm_init(kw, D, H, jnp.float32)
    x = jax.random.normal(kx, (B, T, D), jnp.float32)
    got = np.asarray(jax.jit(lstm_last)(x, p["w"], p["b"]))
    want = np.asarray(jax.jit(_ref_bf16_class)(x, p["w"], p["b"]))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_forward_close_to_xla_scan():
    """Against the full-f32 canonical path the difference is bounded by
    the bf16 matmul-input cast (the documented precision class)."""
    B, T, D, H = 64, 6, 23, 128
    k = jax.random.PRNGKey(1)
    kx, kw = jax.random.split(k)
    p = lstm_init(kw, D, H, jnp.float32)
    x = jax.random.normal(kx, (B, T, D), jnp.float32)
    got = np.asarray(jax.jit(lstm_last)(x, p["w"], p["b"]))
    _, hs = jax.jit(lambda p_, x_: lstm_scan(p_, x_))(p, x)
    want = np.asarray(hs[:, -1])
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
    # and not degenerately equal-to-zero agreement
    assert np.abs(want).mean() > 1e-3


@pytest.mark.parametrize("B", [32, 200])
def test_custom_vjp_gradients(B):
    """d/d{x, w, b} of sum(head-weighted h_last) vs jax.grad of the
    precision replica.  Verifies the hand-written backward sweep (gate
    derivative chain, recurrent cotangent, weight-grad accumulation
    across batch tiles and the padded-row zero-contribution)."""
    T, D, H = 6, 23, 128
    k = jax.random.PRNGKey(2)
    kx, kw, kg = jax.random.split(k, 3)
    p = lstm_init(kw, D, H, jnp.float32)
    x = jax.random.normal(kx, (B, T, D), jnp.float32)
    gw = jax.random.normal(kg, (H,), jnp.float32)  # non-trivial cotangent

    loss_k = lambda x_, w_, b_: jnp.sum(lstm_last(x_, w_, b_) * gw)
    loss_r = lambda x_, w_, b_: jnp.sum(_ref_bf16_class(x_, w_, b_) * gw)
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(x, p["w"], p["b"])
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, p["w"], p["b"])
    # tolerance class: autodiff of the replica quantizes cotangents to
    # bf16 at the matmul-input casts (the kernel keeps them f32), so
    # agreement is at bf16 resolution; an algebra error in the
    # hand-written sweep would show up orders of magnitude above this
    for a, b_, name in zip(gk, gr, ("dx", "dw", "db")):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = np.maximum(np.abs(b_).max(), 1e-6)
        np.testing.assert_allclose(a / denom, b_ / denom, atol=1.5e-2,
                                   err_msg=name)


def test_bfloat16_inputs():
    B, T, D, H = 16, 6, 23, 128
    k = jax.random.PRNGKey(3)
    kx, kw = jax.random.split(k)
    p = lstm_init(kw, D, H, jnp.float32)
    pw = p["w"].astype(jnp.bfloat16)
    pb = p["b"].astype(jnp.bfloat16)
    x = jax.random.normal(kx, (B, T, D)).astype(jnp.bfloat16)
    got = jax.jit(lstm_last)(x, pw, pb)
    assert got.dtype == jnp.bfloat16 and got.shape == (B, H)
    want = jax.jit(_ref_bf16_class)(x, pw, pb)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_dual_kernel_matches_two_singles():
    """lstm_last_flat_dual (one kernel, shared x read -- the Double-DQN
    target path) must BIT-equal two independent lstm_last_flat calls."""
    from diral_tpu.ops.pallas_lstm import (flatten_window, lstm_last_flat,
                                           lstm_last_flat_dual)

    B, T, D, H = 300, 6, 23, 128
    k = jax.random.PRNGKey(5)
    kx, ka, kb = jax.random.split(k, 3)
    pa = lstm_init(ka, D, H, jnp.float32)
    pb = lstm_init(kb, D, H, jnp.float32)
    x2 = flatten_window(jax.random.normal(kx, (B, T, D), jnp.float32))
    ha, hb = jax.jit(lambda x_: lstm_last_flat_dual(
        x_, pa["w"], pa["b"], pb["w"], pb["b"], T))(x2)
    sa = jax.jit(lambda x_: lstm_last_flat(x_, pa["w"], pa["b"], T))(x2)
    sb = jax.jit(lambda x_: lstm_last_flat(x_, pb["w"], pb["b"], T))(x2)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(sa))
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(sb))


def test_unsupported_shapes_fall_back():
    assert not supported(jnp.float64, 128)   # the f64 parity suite
    assert not supported(jnp.float32, 200)   # unaligned hidden
    # qnets auto path must route unsupported cases to lstm_scan (smoke)
    import dataclasses

    from diral_tpu.config import toy_4ue_3r
    from diral_tpu.models import qnets

    cfg = toy_4ue_3r().agent
    cfg = dataclasses.replace(
        cfg, network=dataclasses.replace(cfg.network, layers=(200, 32)))
    params = qnets.drqn_init(jax.random.PRNGKey(0), 23, 3, cfg, jnp.float64)
    q = qnets.drqn_apply(params, jnp.zeros((4, cfg.step_size, 23),
                                           jnp.float64), cfg)
    assert q.shape == (4, 3)


def test_triple_kernel_matches_single_and_dual():
    """lstm_last_flat_triple (one kernel over the combined (T+1)-step
    window -- the fused train-step forward bundle) must BIT-equal the
    separate fwd kernel on steps 0..T-1 and dual kernel on steps 1..T."""
    from diral_tpu.ops.pallas_lstm import (flatten_window, lstm_last_flat,
                                           lstm_last_flat_dual,
                                           lstm_last_flat_triple,
                                           padded_dim)

    B, T, D, H = 300, 6, 23, 128
    Dp = padded_dim(D)
    k = jax.random.PRNGKey(6)
    kx, ka, kb = jax.random.split(k, 3)
    pa = lstm_init(ka, D, H, jnp.float32)
    pb = lstm_init(kb, D, H, jnp.float32)
    x2c = flatten_window(jax.random.normal(kx, (B, T + 1, D), jnp.float32))
    hs, hna, hnb = jax.jit(lambda x_: lstm_last_flat_triple(
        x_, pa["w"], pa["b"], pb["w"], pb["b"], T))(x2c)
    want_s = jax.jit(lambda x_: lstm_last_flat(
        x_[:, :T * Dp], pa["w"], pa["b"], T))(x2c)
    want_na, want_nb = jax.jit(lambda x_: lstm_last_flat_dual(
        x_[:, Dp:], pa["w"], pa["b"], pb["w"], pb["b"], T))(x2c)
    np.testing.assert_array_equal(np.asarray(hs), np.asarray(want_s))
    np.testing.assert_array_equal(np.asarray(hna), np.asarray(want_na))
    np.testing.assert_array_equal(np.asarray(hnb), np.asarray(want_nb))


def test_triple_kernel_gradients_match_single():
    """Gradients through h_s (the only differentiable output by contract)
    must BIT-equal the single kernel's custom VJP; the target-path
    cotangents are zero under the stop_gradient the callers apply."""
    from diral_tpu.ops.pallas_lstm import (flatten_window, lstm_last_flat,
                                           lstm_last_flat_triple,
                                           padded_dim)

    B, T, D, H = 64, 6, 23, 128
    Dp = padded_dim(D)
    k = jax.random.PRNGKey(7)
    kx, ka, kb = jax.random.split(k, 3)
    pa = lstm_init(ka, D, H, jnp.float32)
    pb = lstm_init(kb, D, H, jnp.float32)
    x2c = flatten_window(jax.random.normal(kx, (B, T + 1, D), jnp.float32))

    def f_triple(x_, w, b):
        hs, hna, hnb = lstm_last_flat_triple(x_, w, b, pb["w"], pb["b"], T)
        # target outputs consumed under stop_gradient, as drqn does
        tgt = jax.lax.stop_gradient(hna.sum() + hnb.sum())
        return (hs * hs).sum() + 0.0 * tgt

    def f_single(x_, w, b):
        hs = lstm_last_flat(x_[:, :T * Dp], w, b, T)
        return (hs * hs).sum()

    gt = jax.jit(jax.grad(f_triple, argnums=(0, 1, 2)))(x2c, pa["w"], pa["b"])
    gs = jax.jit(jax.grad(f_single, argnums=(0, 1, 2)))(x2c, pa["w"], pa["b"])
    # the triple op's input cotangent is zero BY CONTRACT (windows are
    # replay data, never differentiated -- the backward kernel skips dx)
    np.testing.assert_array_equal(np.asarray(gt[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(gt[1]), np.asarray(gs[1]))
    np.testing.assert_array_equal(np.asarray(gt[2]), np.asarray(gs[2]))
