"""Multi-chip sharding tests on the 8-device fake CPU platform
(SURVEY.md section 4d): the sharded training step must compile, execute,
and agree numerically with the single-device run."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diral_tpu.config import toy_4ue_3r
from diral_tpu.parallel.mesh import carry_shardings, make_mesh, shard_carry
from diral_tpu.train.loop import make_train_functions


def tiny_cfg(num_envs):
    cfg = toy_4ue_3r(
        time_slots=64, memory_size=64, explore=0, greedy=10_000,
        training=True, train_after_episode=True, save_positions=False,
    )
    return dataclasses.replace(
        cfg,
        agent=dataclasses.replace(
            cfg.agent, batch_size=8, n_batch=1, target_update=25,
            network=dataclasses.replace(cfg.agent.network, layers=(16, 16)),
        ),
        engine=dataclasses.replace(cfg.engine, num_envs=num_envs),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sharded_train_step_matches_single_device():
    cfg = tiny_cfg(num_envs=8)
    init_carry, slot_step, _ = make_train_functions(cfg, jnp.float32)
    carry0 = jax.jit(init_carry)(jax.random.PRNGKey(0))

    # single-device reference
    ref_carry, ref_logs = jax.jit(slot_step)(carry0, jnp.asarray(49))

    mesh = make_mesh(8)
    with mesh:
        sharded = shard_carry(carry0, mesh)
        sh = carry_shardings(carry0, mesh)
        step = jax.jit(slot_step, in_shardings=(sh, None),
                       out_shardings=(sh, None))
        out_carry, out_logs = step(sharded, jnp.asarray(49))
        jax.block_until_ready(out_carry)

    np.testing.assert_allclose(
        np.asarray(out_logs["sum_reward"]), np.asarray(ref_logs["sum_reward"]),
        rtol=1e-6,
    )
    # learner params identical across placements (gradient psum == local sum)
    for a, b in zip(jax.tree.leaves(out_carry.learner.params),
                    jax.tree.leaves(ref_carry.learner.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_model_parallel_mesh():
    """DP x TP mesh: params shard over the model axis and the step still runs."""
    cfg = tiny_cfg(num_envs=8)
    init_carry, slot_step, _ = make_train_functions(cfg, jnp.float32)
    carry0 = jax.jit(init_carry)(jax.random.PRNGKey(0))
    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        sharded = shard_carry(carry0, mesh)
        # the LSTM kernel actually got a model-sharded layout
        lstm_w = sharded.learner.params["lstm"]["w"]
        assert "model" in str(lstm_w.sharding.spec)
        sh = carry_shardings(carry0, mesh)
        step = jax.jit(slot_step, in_shardings=(sh, None),
                       out_shardings=(sh, None))
        out_carry, out_logs = step(sharded, jnp.asarray(49))
        jax.block_until_ready(out_carry)
    assert np.isfinite(np.asarray(out_logs["sum_reward"])).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_episode_grain_dp_tp_matches_single_device():
    """VERDICT r2 #4: the production episode-grain dispatch
    (loop.episode_step -- one unconditional train event per episode) under
    a data=4,model=2 mesh must agree numerically with the identical
    episode_step calls on a single placement.  Covers the TP axis with an
    equality check (test_model_parallel_mesh only asserts finiteness) and
    the episode grain (test_sharded_train_step_matches_single_device only
    covers slot grain, DP-only)."""
    cfg = tiny_cfg(num_envs=8)
    init_carry, slot_step, _ = make_train_functions(cfg, jnp.float32)
    episode_step = slot_step.episode_step
    assert episode_step is not None
    carry0 = jax.jit(init_carry)(jax.random.PRNGKey(0))

    # single-placement reference: two episodes (the second one trains:
    # its last slot t=49 passes the t > batch_size + 10 gate)
    ref = jax.jit(episode_step)
    ref_carry, ref_logs0 = ref(carry0, jnp.asarray(0))
    ref_carry, ref_logs1 = ref(ref_carry, jnp.asarray(1))
    jax.block_until_ready(ref_carry)

    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        sharded = shard_carry(carry0, mesh)
        # params really live on the model axis
        assert "model" in str(sharded.learner.params["lstm"]["w"].sharding.spec)
        sh = carry_shardings(carry0, mesh)
        step = jax.jit(episode_step, in_shardings=(sh, None),
                       out_shardings=(sh, None))
        out_carry, out_logs0 = step(sharded, jnp.asarray(0))
        out_carry, out_logs1 = step(out_carry, jnp.asarray(1))
        jax.block_until_ready(out_carry)

    for out_logs, ref_logs in ((out_logs0, ref_logs0), (out_logs1, ref_logs1)):
        # env-path quantities are per-shard elementwise: tight
        np.testing.assert_allclose(np.asarray(out_logs["sum_reward"]),
                                   np.asarray(ref_logs["sum_reward"]),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out_logs["actions"]),
                                      np.asarray(ref_logs["actions"]))
    # train event fired in episode 1 (nonzero loss at the episode-end slot)
    assert np.asarray(ref_logs1["loss"])[-1] != 0
    np.testing.assert_allclose(np.asarray(out_logs1["loss"]),
                               np.asarray(ref_logs1["loss"]),
                               rtol=2e-5, atol=2e-6)
    # post-train learner params: TP matmul + gradient psum reorder float
    # reductions -> tiered tolerance (same as the DP-only test above)
    for a, b in zip(jax.tree.leaves(out_carry.learner.params),
                    jax.tree.leaves(ref_carry.learner.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_train_experiment_mesh_production_path(tmp_path):
    """VERDICT r1 #2: multi-device as a *production* path.  ``train
    --mesh data=8`` (train_experiment(mesh=...)) must reproduce the
    single-device run end-to-end -- full short schedule, chunked
    dispatch, checkpoint written and resumed under sharding."""
    from diral_tpu.train.runner import train_experiment

    cfg = tiny_cfg(num_envs=8)
    cfg = dataclasses.replace(cfg, time_slots=64, save_freq=32,
                              save_results=False, save_model=True,
                              simulations=1)

    # single-device reference: straight 64-slot run, chunk 32
    _, ref = train_experiment(cfg, workdir=str(tmp_path / "ref"),
                              chunk_size=32, verbose=False)

    # sharded run interrupted at slot 32 (checkpoint), then resumed to 64
    wd = str(tmp_path / "mesh")
    train_experiment(dataclasses.replace(cfg, time_slots=32), workdir=wd,
                     chunk_size=32, verbose=False, mesh="data=8")
    carry, out = train_experiment(cfg, workdir=wd, chunk_size=32,
                                  verbose=False, resume=True, mesh="data=8")

    # resumed sharded second half == single-device second half
    np.testing.assert_allclose(out["sum_reward"], ref["sum_reward"][32:],
                               rtol=1e-6)
    np.testing.assert_array_equal(out["actions"], ref["actions"][32:])
    # the carry really lives on the 8-device mesh
    assert len(carry.history.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_mesh_from_spec_validation():
    from diral_tpu.parallel.mesh import mesh_from_spec
    from diral_tpu.train.runner import train_experiment

    m = mesh_from_spec("data=4,model=2")
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="unknown mesh axis"):
        mesh_from_spec("pipeline=2")
    with pytest.raises(ValueError, match="divisible"):
        train_experiment(tiny_cfg(num_envs=6), mesh="data=4")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sampler_collective_lowering_and_volume():
    """VERDICT r3 #7: the DP communication cost of the cross-env window
    sampler, pinned at the HLO level.  Under a data-sharded mesh GSPMD
    must serve the cross-env gather with masked partial gathers + ONE
    all-reduce of the GATHERED BATCH (n_batch*batch windows) -- never an
    all-gather/all-reduce of the full replay buffer, which would scale
    with memory_size instead of batch_size.  The projected bytes from
    loop.sampler_collective_bytes must match the all-reduce operand
    actually emitted."""
    import re

    from diral_tpu.train.loop import sampler_collective_bytes

    cfg = tiny_cfg(num_envs=8)
    cfg = dataclasses.replace(
        cfg, agent=dataclasses.replace(cfg.agent, n_batch=2))
    init_carry, slot_step, _ = make_train_functions(cfg, jnp.float32)
    episode_step = slot_step.episode_step
    carry0 = jax.jit(init_carry)(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    with mesh:
        sh = carry_shardings(carry0, mesh)
        txt = (jax.jit(episode_step, in_shardings=(sh, None),
                       out_shardings=(sh, None))
               .lower(carry0, jnp.asarray(1)).compile().as_text())

    # every f32 all-reduce operand, as element counts
    ars = [np.prod([int(d) for d in re.findall(r"\d+", dims)])
           for dims in re.findall(r"all-reduce[^=]*= \(?f32\[([\d,]*)\]", txt)]
    acc = sampler_collective_bytes(cfg)
    want_elems = acc["gathered_elems"]
    assert want_elems in ars, (ars, want_elems)
    # the LARGEST collective is exactly the gathered batch -- nothing
    # replay-sized (scaling with memory_size) crosses the wire
    assert max(ars) == want_elems, (ars, want_elems)
    ags = [np.prod([int(d) for d in re.findall(r"\d+", dims)])
           for dims in re.findall(r"all-gather[^=]*= \(?f32\[([\d,]*)\]", txt)]
    assert all(a <= want_elems for a in ags), ags


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_graft_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 3
    g.dryrun_multichip(8)
