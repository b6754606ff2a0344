"""Scale-config smoke: the 100-vehicle / 50-resource path (scan channel
loop, PRR rewards, 100-dim state) compiles and steps, single-device and
sharded over the 8-device fake mesh with a reduced env batch."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diral_tpu.config import load_config
from diral_tpu.parallel.mesh import carry_shardings, make_mesh, shard_carry
from diral_tpu.train.loop import make_train_functions

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "scale_100v_50r.yaml")


def scale_cfg(num_envs):
    cfg = load_config(CFG_PATH)
    agent = dataclasses.replace(
        cfg.agent, batch_size=8, n_batch=1,
        network=dataclasses.replace(cfg.agent.network, layers=(32, 32)),
    )
    return dataclasses.replace(
        cfg, agent=agent, memory_size=64, explore=0,
        engine=dataclasses.replace(cfg.engine, num_envs=num_envs),
    )


def test_scale_config_loads():
    cfg = load_config(CFG_PATH)
    assert cfg.env.num_users == 100 and cfg.env.num_channels == 50
    assert cfg.env.state_space == 50 + 50  # one-hot action + 50 bins
    # 16: each env's replay is ~83 MB on device; thousands of envs are
    # the (replay-free) engine-bench regime, not the training default
    assert cfg.engine.num_envs == 16


def test_scale_single_device_step():
    cfg = scale_cfg(num_envs=2)
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    # t=49: episode end -> train branch runs
    carry, logs = jax.jit(slot_step)(carry, jnp.asarray(49))
    jax.block_until_ready(carry)
    assert logs["sum_reward"].shape == (2,)
    assert np.isfinite(np.asarray(logs["sum_reward"])).all()
    # PRR design-2 rewards live in [-1, 1] per user
    assert np.asarray(logs["sum_reward"]).min() >= -cfg.env.num_users


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_scale_sharded_step():
    cfg = scale_cfg(num_envs=8)
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    with mesh:
        sharded = shard_carry(carry, mesh)
        sh = carry_shardings(carry, mesh)
        step = jax.jit(slot_step, in_shardings=(sh, None),
                       out_shardings=(sh, None))
        out, logs = step(sharded, jnp.asarray(49))
        jax.block_until_ready(out)
    assert np.isfinite(np.asarray(logs["sum_reward"])).all()
