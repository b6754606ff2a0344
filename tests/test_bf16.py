"""bf16 compute path for the DRQN net: f32 master params, bf16 matmuls,
f32 layer-norm statistics and Q outputs; training stays stable."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.agents import drqn
from diral_tpu.models import qnets


def cfgs():
    base = toy_4ue_3r().agent
    f32 = dataclasses.replace(
        base, batch_size=16, n_batch=1,
        network=dataclasses.replace(base.network, layers=(32, 32)),
    )
    bf16 = dataclasses.replace(
        f32, network=dataclasses.replace(f32.network,
                                         compute_dtype="bfloat16"),
    )
    return f32, bf16


def test_bf16_close_to_f32_and_f32_output():
    f32, bf16 = cfgs()
    params = qnets.drqn_init(jax.random.PRNGKey(0), 23, 3, f32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 23), jnp.float32)
    q32 = qnets.drqn_apply(params, x, f32)
    qbf = qnets.drqn_apply(params, x, bf16)
    assert qbf.dtype == jnp.float32
    # bf16 has ~3 decimal digits; Q magnitudes here are O(1)
    np.testing.assert_allclose(np.asarray(qbf), np.asarray(q32), atol=0.15)
    assert not np.array_equal(np.asarray(qbf), np.asarray(q32))


def test_bf16_training_stable():
    _, bf16 = cfgs()
    learner = drqn.init_learner(jax.random.PRNGKey(0), 23, 3, bf16)
    rng = jax.random.PRNGKey(5)
    batch = {
        "states": jax.random.normal(rng, (8, 6, 4, 23)),
        "next_states": jax.random.normal(jax.random.fold_in(rng, 1),
                                         (8, 6, 4, 23)),
        "actions": jax.random.randint(jax.random.fold_in(rng, 2),
                                      (8, 6, 4), 0, 3),
        "rewards": jax.random.normal(jax.random.fold_in(rng, 3), (8, 6, 4)),
    }
    losses = []
    for i in range(30):
        learner, loss = drqn.train_on_batch(learner, batch, bf16, 4)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # fits the fixed batch
    # master params stayed f32
    for leaf in jax.tree.leaves(learner.params):
        assert leaf.dtype == jnp.float32
