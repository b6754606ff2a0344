"""Q-value networks: the DRQN LSTM net, feedforward MLP nets (with dueling
heads), and the PS-DRQN dense->GRU net.

Architectural parity:

* ``drqn`` -- BasicLSTMCell(layers[0]) over the history window, last-step
  output -> dense(layers[1]) + relu + layer_norm -> linear head
  (reference algorithms/drl_drqn.py:109-155, LSTM branch).  The MLP branch
  is dense+relu+layer_norm stacks with a linear head (same function,
  else-branch).
* ``ps_dqn`` -- 1-2 dense layers (relu or linear) with optional dueling
  value/advantage heads, ``q = v + a - mean(a)``
  (reference algorithms/ps_dqn.py:158-198).
* ``ps_drqn`` -- 1-2 dense relu layers -> GRU -> linear head; the dueling
  variant branches off the pre-RNN features as in the reference
  (algorithms/ps_drqn.py:119-166, where dueling heads read ``dense``, not
  the RNN output -- reproduced as-is).

Initialization defaults to glorot-uniform / zero-bias (TPU-sane);
``init_scheme="reference"`` reproduces the reference MLP's U[0,1) weights
and 0.1 biases (drl_drqn.py:124-147) for faithfulness experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diral_tpu.config import AgentConfig
from diral_tpu.models.recurrent import (
    gru_init,
    gru_scan,
    gru_cell,
    lstm_init,
    lstm_scan,
)


def _glorot(key, shape, dtype):
    lim = jnp.sqrt(6.0 / (shape[0] + shape[1])).astype(dtype)
    return jax.random.uniform(key, shape, dtype, -lim, lim)


def dense_init(key, in_dim, out_dim, dtype=jnp.float32, scheme="glorot"):
    if scheme == "reference":
        # tf.random_uniform default U[0,1) weights, 0.1 bias (drl_drqn.py:124-147)
        w = jax.random.uniform(key, (in_dim, out_dim), dtype, 0.0, 1.0)
        b = jnp.full((out_dim,), 0.1, dtype)
    else:
        w = _glorot(key, (in_dim, out_dim), dtype)
        b = jnp.zeros((out_dim,), dtype)
    return {"w": w, "b": b}


def dense(params, x):
    return x @ params["w"] + params["b"]


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps=1e-6):
    mean = x.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def _lstm_last(lstm_params, x, impl: str, step: int):
    """Last-step LSTM hidden over the history window -> [B, H].

    ``x`` is either [B, T, D] or the FLAT padded window [B, T*Dp]
    (ops/pallas_lstm.flatten_window layout -- hot paths carry windows
    flat to avoid the padded [B, T, D] tile layout, see pallas_lstm.py).

    ``impl``: "auto" picks the fused Pallas window kernel
    (ops/pallas_lstm.py -- one VMEM-resident pass, the train-event hot op)
    on TPU when dtype/shape allow, else the canonical XLA ``lstm_scan``;
    "pallas"/"xla" force a path.  The XLA path is the bit-parity
    implementation (float64 CPU suite); the kernel matches it within the
    default-matmul-precision class."""
    from diral_tpu.ops import pallas_lstm

    hidden = lstm_params["w"].shape[1] // 4
    d = lstm_params["w"].shape[0] - hidden
    flat = x.ndim == 2
    if impl == "xla":
        use_pallas = False
    else:
        ok = pallas_lstm.supported(x.dtype, hidden)
        if impl == "pallas":
            if not ok:
                raise ValueError(
                    f"network.lstm_impl='pallas' unsupported for "
                    f"dtype={x.dtype}, hidden={hidden}")
            use_pallas = True
        else:  # auto
            use_pallas = ok and jax.default_backend() == "tpu"
    if use_pallas:
        if flat:
            return pallas_lstm.lstm_last_flat(x, lstm_params["w"],
                                              lstm_params["b"], step)
        return pallas_lstm.lstm_last(x, lstm_params["w"], lstm_params["b"])
    if flat:
        x = pallas_lstm.unflatten_window(x, step, d)
    _, hs = lstm_scan(lstm_params, x)
    return hs[:, -1, :]


# ---------------------------------------------------------------------------
# DRQN net (the flagship: LSTM over the history window)
# ---------------------------------------------------------------------------


def drqn_init(key, state_dim: int, action_dim: int, cfg: AgentConfig,
              dtype=jnp.float32, scheme="glorot"):
    layers = cfg.network.layers
    keys = jax.random.split(key, 4)
    if cfg.network.use_lstm_input:
        params = {"lstm": lstm_init(keys[0], state_dim, layers[0], dtype)}
        feat_in = layers[0]
    else:
        params = {
            "fc1": dense_init(keys[0], state_dim, layers[0], dtype, scheme),
            "ln1": layer_norm_init(layers[0], dtype),
        }
        feat_in = layers[0]
    params["fc2"] = dense_init(keys[1], feat_in, layers[1], dtype, scheme)
    params["ln2"] = layer_norm_init(layers[1], dtype)
    if len(layers) == 3:
        params["fc3"] = dense_init(keys[2], layers[1], layers[2], dtype, scheme)
        params["ln3"] = layer_norm_init(layers[2], dtype)
        params["head"] = dense_init(keys[3], layers[2], action_dim, dtype, scheme)
    else:
        params["head"] = dense_init(keys[3], layers[1], action_dim, dtype, scheme)
    return params


def _maybe_bf16(params, x, cfg: AgentConfig):
    bf16 = cfg.network.compute_dtype == "bfloat16"
    if bf16:
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t
        )
        params = {k: (cast(v) if k in ("lstm", "fc1", "fc2", "fc3", "head")
                      else v) for k, v in params.items()}
        x = x.astype(jnp.bfloat16)
    return params, x, bf16


def _head_stack(params, h, cfg: AgentConfig, bf16: bool):
    """The post-feature dense/LN/head tail of the DRQN net."""
    def norm(ln, hh):
        # layer_norm statistics in f32 even under bf16 compute
        if bf16:
            return layer_norm(ln, hh.astype(jnp.float32)).astype(jnp.bfloat16)
        return layer_norm(ln, hh)

    h = norm(params["ln2"], jax.nn.relu(dense(params["fc2"], h)))
    if "fc3" in params:
        h = norm(params["ln3"], jax.nn.relu(dense(params["fc3"], h)))
    out = dense(params["head"], h)
    return out.astype(jnp.float32) if bf16 else out


def drqn_apply(params, x, cfg: AgentConfig):
    """x: [B, T, D] or flat [B, T*Dp] window (LSTM path; see
    ops/pallas_lstm.flatten_window) or [B, D] (MLP path) -> Q [B, A].

    With ``network.compute_dtype == "bfloat16"`` the activations and weights
    are cast to bf16 for the matmuls (master params stay f32; layer_norm and
    the Q head output compute in f32) -- the MXU fast path."""
    params, x, bf16 = _maybe_bf16(params, x, cfg)
    if cfg.network.use_lstm_input:
        h = _lstm_last(params["lstm"], x, cfg.network.lstm_impl,
                       cfg.step_size)
    else:
        def norm(ln, hh):
            if bf16:
                return layer_norm(
                    ln, hh.astype(jnp.float32)).astype(jnp.bfloat16)
            return layer_norm(ln, hh)

        h = norm(params["ln1"], jax.nn.relu(dense(params["fc1"], x)))
    return _head_stack(params, h, cfg, bf16)


def drqn_apply_triple(params, target_params, x2c, cfg: AgentConfig):
    """(Q_s, Q_na, Q_nb) from ONE combined flat (T+1)-step window
    [B, (T+1)*Dp] (ring-contiguity: the next_states window is the states
    window shifted one step):

      Q_s  -- online net on states (steps 0..T-1), DIFFERENTIABLE;
      Q_na -- online net on next_states (steps 1..T), target path;
      Q_nb -- target net on next_states, target path.

    Pallas path: one fused triple kernel sharing a single VMEM read of the
    window (ops/pallas_lstm.lstm_last_flat_triple; bit-identical to the
    separate fwd + dual kernels).  Q_na/Q_nb carry a stop-gradient
    CONTRACT (the kernel's VJP ignores their cotangents); callers must
    wrap the derived target in ``stop_gradient`` (drl_drqn.py:267-292
    never differentiates it).  Fallback: lane slices + drqn_apply(+dual),
    identical semantics on every backend/dtype."""
    from diral_tpu.ops import pallas_lstm

    assert cfg.network.use_lstm_input and x2c.ndim == 2
    T = cfg.step_size
    Dp = x2c.shape[1] // (T + 1)
    # the combined window must ride the kernel's padded per-step stride;
    # a wrong T or layout would otherwise slice misaligned lanes SILENTLY
    # on the fallback path (the Pallas path asserts internally)
    H_ = params["lstm"]["w"].shape[1] // 4
    assert Dp == pallas_lstm.padded_dim(params["lstm"]["w"].shape[0] - H_), (
        x2c.shape, T, Dp)
    use_triple = (
        cfg.network.lstm_impl in ("auto", "pallas")
        and pallas_lstm.supported(
            jnp.bfloat16 if cfg.network.compute_dtype == "bfloat16"
            else x2c.dtype,
            params["lstm"]["w"].shape[1] // 4)
        and (cfg.network.lstm_impl == "pallas"
             or jax.default_backend() == "tpu")
    )
    if not use_triple:
        q_s = drqn_apply(params, x2c[:, :T * Dp], cfg)
        q_na, q_nb = drqn_apply_dual(params, target_params, x2c[:, Dp:], cfg)
        return q_s, q_na, q_nb
    pa, xc, bf16 = _maybe_bf16(params, x2c, cfg)
    pb, _, _ = _maybe_bf16(target_params, x2c, cfg)
    h_s, h_na, h_nb = pallas_lstm.lstm_last_flat_triple(
        xc, pa["lstm"]["w"], pa["lstm"]["b"],
        pb["lstm"]["w"], pb["lstm"]["b"], T)
    return (_head_stack(pa, h_s, cfg, bf16),
            _head_stack(pa, h_na, cfg, bf16),
            _head_stack(pb, h_nb, cfg, bf16))


def drqn_apply_dual(params_a, params_b, x, cfg: AgentConfig):
    """(Q under params_a, Q under params_b) for the SAME input -- the
    Double-DQN target's online+target forwards on next_states
    (drl_drqn.py:267-292).  On the Pallas LSTM path the two recurrences
    run in ONE dual kernel sharing a single VMEM read of x (the window
    batch is the dominant event traffic at the scale config); otherwise
    falls back to two ``drqn_apply`` calls."""
    from diral_tpu.ops import pallas_lstm

    use_dual = (
        cfg.network.use_lstm_input
        and x.ndim == 2  # flat windows (the production sampler layout)
        and cfg.network.lstm_impl in ("auto", "pallas")
        and pallas_lstm.supported(
            jnp.bfloat16 if cfg.network.compute_dtype == "bfloat16"
            else x.dtype,
            params_a["lstm"]["w"].shape[1] // 4)
        and (cfg.network.lstm_impl == "pallas"
             or jax.default_backend() == "tpu")
    )
    if not use_dual:
        return drqn_apply(params_a, x, cfg), drqn_apply(params_b, x, cfg)
    pa, xa, bf16 = _maybe_bf16(params_a, x, cfg)
    pb, _, _ = _maybe_bf16(params_b, x, cfg)
    ha, hb = pallas_lstm.lstm_last_flat_dual(
        xa, pa["lstm"]["w"], pa["lstm"]["b"],
        pb["lstm"]["w"], pb["lstm"]["b"], cfg.step_size)
    return _head_stack(pa, ha, cfg, bf16), _head_stack(pb, hb, cfg, bf16)


# ---------------------------------------------------------------------------
# PS-DQN feedforward net (optional dueling)
# ---------------------------------------------------------------------------


def ps_dqn_init(key, state_dim: int, action_dim: int, cfg: AgentConfig,
                dtype=jnp.float32):
    layers = cfg.network.layers
    keys = jax.random.split(key, 4)
    params = {"fc1": dense_init(keys[0], state_dim, layers[0], dtype)}
    feat = layers[0]
    if len(layers) >= 2:
        params["fc2"] = dense_init(keys[1], feat, layers[1], dtype)
        feat = layers[1]
    if cfg.network.use_dueling:
        params["value"] = dense_init(keys[2], feat, 1, dtype)
        adv = dense_init(keys[3], feat, action_dim, dtype)
        del adv["b"]  # advantage head has no bias (ps_dqn.py:191-192)
        params["advantage"] = adv
    else:
        params["head"] = dense_init(keys[2], feat, action_dim, dtype)
    return params


def ps_dqn_apply(params, x, cfg: AgentConfig):
    act = (lambda v: v) if cfg.network.activation == "Linear" else jax.nn.relu
    h = act(dense(params["fc1"], x))
    if "fc2" in params:
        h = act(dense(params["fc2"], h))
    if cfg.network.use_dueling:
        v = dense(params["value"], h)
        a = h @ params["advantage"]["w"]
        return v + a - a.mean(axis=-1, keepdims=True)
    return dense(params["head"], h)


# ---------------------------------------------------------------------------
# PS-DRQN net (dense -> GRU -> head), with carried hidden state for inference
# ---------------------------------------------------------------------------


def ps_drqn_init(key, state_dim: int, action_dim: int, cfg: AgentConfig,
                 dtype=jnp.float32):
    layers = cfg.network.layers
    keys = jax.random.split(key, 5)
    params = {"fc1": dense_init(keys[0], state_dim, layers[0], dtype)}
    feat = layers[0]
    if len(layers) >= 2:
        params["fc2"] = dense_init(keys[1], feat, layers[1], dtype)
        feat = layers[1]
    params["gru"] = gru_init(keys[2], feat, feat, dtype)
    if cfg.network.use_dueling:
        params["value"] = dense_init(keys[3], feat, 1, dtype)
        adv = dense_init(keys[4], feat, action_dim, dtype)
        del adv["b"]
        params["advantage"] = adv
    else:
        params["head"] = dense_init(keys[3], feat, action_dim, dtype)
    return params


def _ps_drqn_features(params, x):
    h = jax.nn.relu(dense(params["fc1"], x))
    if "fc2" in params:
        h = jax.nn.relu(dense(params["fc2"], h))
    return h


def ps_drqn_hidden_size(params) -> int:
    return params["gru"]["wc"].shape[1]


def ps_drqn_apply_seq(params, x, cfg: AgentConfig, h0=None):
    """x: [B, T, D] -> (Q [B*T, A], final hidden [B, H]).  Matches the
    reference's flatten-then-reshape unroll (ps_drqn.py:146-162)."""
    feats = _ps_drqn_features(params, x)
    hN, hs = gru_scan(params["gru"], feats, h0)
    flat = hs.reshape(-1, hs.shape[-1])
    if cfg.network.use_dueling:
        # Reference dueling reads the pre-RNN dense features (ps_drqn.py:155-160).
        dflat = feats.reshape(-1, feats.shape[-1])
        v = dense(params["value"], dflat)
        a = dflat @ params["advantage"]["w"]
        q = v + a - a.sum(axis=-1, keepdims=True)
    else:
        q = dense(params["head"], flat)
    return q, hN


def ps_drqn_apply_step(params, x, h, cfg: AgentConfig):
    """Single inference step with carried per-agent hidden state
    (ps_drqn.py:195-231). x [B, D], h [B, H] -> (Q [B, A], new h)."""
    feats = _ps_drqn_features(params, x)
    new_h, _ = gru_cell(params["gru"], h, feats)
    if cfg.network.use_dueling:
        v = dense(params["value"], feats)
        a = feats @ params["advantage"]["w"]
        q = v + a - a.sum(axis=-1, keepdims=True)
    else:
        q = dense(params["head"], new_h)
    return q, new_h
