"""PPO actor-critic networks (reference algorithms/ps_ppo.py:27-62,130-138).

Feedforward: one dense+relu trunk per head, softmax policy over actions,
scalar value.  LSTM variant: separate LSTM encoders for actor and critic
(the reference deliberately keeps them unshared, ps_ppo.py:27-44), each
followed by dense+relu and its head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diral_tpu.config import AgentConfig
from diral_tpu.models.qnets import dense, dense_init
from diral_tpu.models.recurrent import lstm_init, lstm_scan


def ppo_init(key, state_dim: int, action_dim: int, cfg: AgentConfig,
             dtype=jnp.float32):
    hidden = cfg.network.layers[0]
    keys = jax.random.split(key, 8)
    params = {
        "actor_fc": dense_init(keys[0], hidden if cfg.network.use_lstm_input else state_dim, hidden, dtype),
        "actor_head": dense_init(keys[1], hidden, action_dim, dtype),
        "critic_fc": dense_init(keys[2], hidden if cfg.network.use_lstm_input else state_dim, hidden, dtype),
        "critic_head": dense_init(keys[3], hidden, 1, dtype),
    }
    if cfg.network.use_lstm_input:
        params["actor_lstm"] = lstm_init(keys[4], state_dim, hidden, dtype)
        params["critic_lstm"] = lstm_init(keys[5], state_dim, hidden, dtype)
    return params


def _encode(params, x, prefix, use_lstm, impl="auto"):
    if use_lstm:
        # same lowering policy as the DRQN net (models/qnets._lstm_last):
        # the fused Pallas window kernel on TPU when shapes/dtype allow
        # (its custom VJP serves PPO's encoder gradients), else the
        # canonical XLA lstm_scan (the float64 golden-test path)
        from diral_tpu.ops import pallas_lstm

        p = params[f"{prefix}_lstm"]
        hidden = p["w"].shape[1] // 4
        if (impl != "xla" and pallas_lstm.supported(x.dtype, hidden)
                and (impl == "pallas" or jax.default_backend() == "tpu")):
            return pallas_lstm.lstm_last(x, p["w"], p["b"])
        _, hs = lstm_scan(p, x)
        return hs[:, -1, :]
    return x


def ppo_policy_logits(params, x, cfg: AgentConfig):
    """x: [B, T, D] (LSTM) or [B, D] -> action logits [B, A]."""
    h = _encode(params, x, "actor", cfg.network.use_lstm_input,
                cfg.network.lstm_impl)
    h = jax.nn.relu(dense(params["actor_fc"], h))
    return dense(params["actor_head"], h)


def ppo_value(params, x, cfg: AgentConfig):
    """-> V [B]."""
    h = _encode(params, x, "critic", cfg.network.use_lstm_input,
                cfg.network.lstm_impl)
    h = jax.nn.relu(dense(params["critic_fc"], h))
    return dense(params["critic_head"], h)[..., 0]
