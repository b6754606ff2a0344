"""Runner + checkpoint tests: chunked execution equals monolithic scan,
checkpoint round-trip is exact, artifacts land in the reference layout."""

import dataclasses
import os

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.train import checkpoint as ckpt
from diral_tpu.train.loop import make_train_functions
from diral_tpu.train.runner import train_experiment


def small_cfg(tmp, **over):
    cfg = toy_4ue_3r(
        experiment_name="ckpt_test", time_slots=120, memory_size=128,
        save_freq=60, explore=20, training=True, train_after_episode=True,
        save_positions=True, save_model=True,
    )
    agent = dataclasses.replace(
        cfg.agent, batch_size=16, n_batch=1, target_update=25,
        network=dataclasses.replace(cfg.agent.network, layers=(16, 16)),
    )
    return dataclasses.replace(cfg, agent=agent, **over)


def test_chunked_equals_monolithic(tmp_path):
    cfg = small_cfg(tmp_path, save_model=False, save_results=False)
    init_carry, slot_step, run = make_train_functions(cfg)
    _, logs_mono = run(jax.random.PRNGKey(5), 120)

    # chunked: same seed, chunks of 40
    carry = jax.jit(init_carry)(jax.random.PRNGKey(5))
    outs = []
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, t0, n):
        return jax.lax.scan(slot_step, carry, t0 + jnp.arange(n))

    for t0 in (0, 40, 80):
        carry, logs = run_chunk(carry, jnp.asarray(t0), 40)
        outs.append(np.asarray(logs["sum_reward"]))
    np.testing.assert_allclose(
        np.concatenate(outs), np.asarray(logs_mono["sum_reward"]), rtol=1e-6
    )


def test_checkpoint_roundtrip_exact(tmp_path):
    cfg = small_cfg(tmp_path)
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    carry, _ = jax.jit(slot_step)(carry, jnp.asarray(0))

    mgr = ckpt.checkpoint_manager(str(tmp_path / "ck"))
    ckpt.save(mgr, 1, carry)
    restored, step = ckpt.restore(mgr, carry)
    assert step == 1
    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from restored state matches continuing from original
    c1, l1 = jax.jit(slot_step)(carry, jnp.asarray(1))
    c2, l2 = jax.jit(slot_step)(restored, jnp.asarray(1))
    np.testing.assert_array_equal(np.asarray(l1["sum_reward"]),
                                  np.asarray(l2["sum_reward"]))


def _legacy_views(carry):
    """Reconstruct the pre-round-4 carry pieces from a current (flat)
    carry: 4D replay rows, 4D [B, T, N, D] history."""
    from diral_tpu.ops.pallas_lstm import padded_dim

    fused = carry.replay
    N, d = fused.num_users, fused.state_dim
    core = fused.buf[:, :fused.capacity].reshape(
        fused.buf.shape[0], fused.capacity, N,
        fused.user_stride)[..., :d + 2]  # drop the stride pad lanes
    D = carry.state.shape[-1]
    Dp = padded_dim(D)
    B, _, L = carry.history.shape
    T = L // Dp
    hist4 = jnp.transpose(
        carry.history.reshape(B, N, T, Dp)[..., :D], (0, 2, 1, 3))
    return core, hist4, d


@pytest.mark.parametrize("era", ["split", "fused4d"])
def test_restore_legacy_checkpoints(tmp_path, era):
    """Checkpoints from earlier carry layouts must still restore: the shim
    detects the structure mismatch and converts bit-exactly (ADVICE r3:
    no migration path existed).  Two legacy eras: pre-round-3 split
    WindowReplay buffers, and round-3's fused 4D replay -- both with the
    4D [B, T, N, D] history."""
    from diral_tpu.agents.replay import FusedWindowReplay, WindowReplay

    cfg = small_cfg(tmp_path)
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(3))
    carry, _ = jax.jit(slot_step)(carry, jnp.asarray(0))

    core, hist4, d = _legacy_views(carry)
    if era == "split":
        states = core[..., :d]
        legacy = WindowReplay(
            states=states,
            actions=core[..., d + 1].astype(jnp.int32),
            rewards=core[..., d],
            # next_states = states one slot later (unbroken-chain invariant)
            next_states=jnp.roll(states, -1, axis=1),
            ptr=carry.replay.ptr,
            count=carry.replay.count,
        )
    else:
        legacy = FusedWindowReplay(
            buf=core, ptr=carry.replay.ptr, count=carry.replay.count,
            pad=0, num_users=carry.replay.num_users)
    legacy_carry = carry.replace(replay=legacy, history=hist4)
    mgr = ckpt.checkpoint_manager(str(tmp_path / f"legacy_{era}"))
    ckpt.save(mgr, 7, legacy_carry)

    restored, step = ckpt.restore(mgr, carry)
    assert step == 7
    assert type(restored.replay) is type(carry.replay)
    np.testing.assert_array_equal(np.asarray(restored.replay.buf),
                                  np.asarray(carry.replay.buf))
    np.testing.assert_array_equal(np.asarray(restored.history),
                                  np.asarray(carry.history))
    for a, b in zip(jax.tree.leaves(carry.learner),
                    jax.tree.leaves(restored.learner)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the restored carry steps identically to the original
    c1, l1 = jax.jit(slot_step)(carry, jnp.asarray(1))
    c2, l2 = jax.jit(slot_step)(restored, jnp.asarray(1))
    np.testing.assert_array_equal(np.asarray(l1["sum_reward"]),
                                  np.asarray(l2["sum_reward"]))


def test_fused_replay_dtype_guard_and_batch_capacity():
    """ADVICE r3: a replay dtype that cannot represent the action-id range
    exactly must be rejected at creation; capacity/state_dim must be
    batch-aware on the vmapped production pytree."""
    import pytest

    from diral_tpu.agents.replay import FusedWindowReplay

    with pytest.raises(ValueError, match="exactly"):
        FusedWindowReplay.create(8, 4, 5, jnp.bfloat16, num_actions=300)
    # fine within the mantissa
    FusedWindowReplay.create(8, 4, 5, jnp.bfloat16, num_actions=256)
    FusedWindowReplay.create(8, 4, 5, jnp.float32, num_actions=300)

    single = FusedWindowReplay.create(8, 4, 5, jnp.float32)
    assert single.capacity == 8 and single.state_dim == 5
    batched = jax.vmap(
        lambda _: FusedWindowReplay.create(8, 4, 5, jnp.float32)
    )(jnp.arange(3))
    assert batched.capacity == 8 and batched.state_dim == 5


def test_runner_artifacts_layout(tmp_path):
    cfg = small_cfg(tmp_path)
    train_experiment(cfg, workdir=str(tmp_path), seed=1, chunk_size=60,
                     verbose=False)
    d = tmp_path / "save_results" / "test" / "ckpt_test"
    assert (d / "rewards_sim0.npy").exists()
    assert (d / "actions_sim0.npy").exists()
    assert (d / "positions_sim0.npy").exists()
    rewards = np.load(d / "rewards_sim0.npy")
    assert rewards.shape[0] == 120
    ck = tmp_path / "save_model" / "test" / "ckpt_test"
    assert ckpt.latest_step(str(ck)) == 120

    # resume completes without retraining from scratch; the dumped arrays
    # must cover the WHOLE run (reference accumulates per-slot logs over
    # the full run), with the pre-crash slots preloaded from disk
    cfg2 = dataclasses.replace(cfg, time_slots=180)
    carry, out = train_experiment(cfg2, workdir=str(tmp_path), seed=1,
                                  chunk_size=60, resume=True, verbose=False)
    assert out["sum_reward"].shape[0] == 180
    rewards2 = np.load(d / "rewards_sim0.npy")
    assert rewards2.shape[0] == 180
    np.testing.assert_array_equal(rewards2[:120], rewards)


def test_resume_cold_start_and_saves_without_save_model(tmp_path):
    """--resume on an empty workdir must cold-start (not raise), and a
    resume-enabled run must WRITE checkpoints even with save_model=False,
    so a restart loop that always passes --resume makes progress."""
    cfg = small_cfg(tmp_path)
    cfg = dataclasses.replace(cfg, save_model=False)
    train_experiment(cfg, workdir=str(tmp_path), seed=2, chunk_size=60,
                     resume=True, verbose=False)
    ck = tmp_path / "save_model" / "test" / "ckpt_test"
    assert ckpt.latest_step(str(ck)) == cfg.time_slots
    cfg2 = dataclasses.replace(cfg, time_slots=cfg.time_slots + 60)
    _, out = train_experiment(cfg2, workdir=str(tmp_path), seed=2,
                              chunk_size=60, resume=True, verbose=False)
    # resumed (not retrained): full-run arrays = preloaded 120 + new 60
    assert out["sum_reward"].shape[0] == cfg.time_slots + 60


def test_best_checkpoint_tracking(tmp_path):
    """The runner keeps the best-chunk-mean-reward snapshot in
    <ckpt_dir>_best with a best_metric.json marker (the greedy-collapse
    mitigation: greedy eval can use the pre-collapse policy via --best)."""
    import json

    cfg = small_cfg(tmp_path, save_results=False)
    wd = str(tmp_path / "run")
    train_experiment(cfg, workdir=wd, chunk_size=60, verbose=False)

    best_dir = os.path.join(wd, "save_model", "test", "ckpt_test_best")
    marker = os.path.join(best_dir, "best_metric.json")
    assert os.path.exists(marker)
    with open(marker) as f:
        best = json.load(f)
    assert best["step"] in (60, 120)

    # the best snapshot restores and its step matches the marker
    init_carry, _, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    mgr = ckpt.checkpoint_manager(best_dir)
    _, step = ckpt.restore(mgr, carry)
    assert step == best["step"]

    # the marker metric equals the actual chunk-mean of the kept step:
    # rerun and compare the two chunk means
    _, out = train_experiment(small_cfg(tmp_path, save_model=False,
                                        save_results=False),
                              workdir=str(tmp_path / "ref"), chunk_size=60,
                              verbose=False)
    chunk_means = [out["sum_reward"][:60].mean(), out["sum_reward"][60:].mean()]
    np.testing.assert_allclose(best["mean_sum_reward"],
                               max(chunk_means), rtol=1e-6)


def test_bf16_storage_checkpoint_exact_resume(tmp_path):
    """The round-5 bf16 STORAGE mode (replay ring + history in bf16)
    must checkpoint/restore exactly and resume bit-identically -- the
    carry's dtypes ride the pytree, so Orbax round-trips them, but this
    pins it against regressions in the storage-dtype plumbing."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from diral_tpu.config import toy_4ue_3r
    from diral_tpu.train.loop import make_train_functions
    from diral_tpu.train import checkpoint as CK

    cfg = toy_4ue_3r(time_slots=200, memory_size=128, explore=20,
                     save_positions=False)
    cfg = dataclasses.replace(
        cfg,
        engine=dataclasses.replace(cfg.engine, num_envs=2),
        agent=dataclasses.replace(
            cfg.agent, batch_size=16, n_batch=1,
            network=dataclasses.replace(cfg.agent.network, layers=(32, 32),
                                        compute_dtype="bfloat16")))
    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    step = jax.jit(lambda c, ts: jax.lax.scan(slot_step, c, ts))
    carry, _ = step(carry, jnp.arange(0, 100))
    assert carry.replay.buf.dtype == jnp.bfloat16
    assert carry.history.dtype == jnp.bfloat16

    mgr = CK.checkpoint_manager(str(tmp_path / "ck"))
    CK.save(mgr, 100, carry)
    mgr.wait_until_finished()
    restored, t0 = CK.restore(mgr, carry)
    assert t0 == 100
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        carry, restored)
    _, l1 = step(carry, jnp.arange(100, 200))
    _, l2 = step(restored, jnp.arange(100, 200))
    np.testing.assert_array_equal(np.asarray(l1["sum_reward"]),
                                  np.asarray(l2["sum_reward"]))
