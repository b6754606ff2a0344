"""Host-side experiment runner: chunked device scans + periodic artifacts.

The device does ``chunk_size`` slots per dispatch (one jitted scan); the
host only touches data at chunk boundaries -- to append logs, print the
reference-style episode telemetry, dump npy results every ``save_freq``
slots (main_test.py:238-258) and checkpoint (main_test.py:260-264).  The
multi-simulation outer loop matches ``marl_test``'s
``for simulation in range(simulations)`` (main_test.py:43-44).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import ExperimentConfig
from diral_tpu.train import checkpoint as ckpt
from diral_tpu.train.loop import make_train_functions
from diral_tpu.train.metrics import ResultWriter


def make_chunk_runner(slot_step, mesh=None, carry_shapes=None):
    """Jitted chunked scan over slots; THE device dispatch of production
    training (used by train_experiment and bench.py's scaling bench).

    Two compiled grains share one signature ``run_chunk(carry, t0, n)``
    (slots in, slots out):

    * episode grain -- when the config trains after episodes and the chunk
      aligns to ``episode_interval``, the scan body is ``episode_step``
      (loop.py): no per-slot ``lax.cond`` around the train event, so XLA
      emits no conditional-operand copies of the replay (measured 27% of
      the train event on v5e).  Bit-identical to slot grain.
    * slot grain -- the general fallback (per-slot cadence, unaligned
      remainder chunks).

    With a mesh, in/out shardings pin the carry to the parallel layout
    (env axis on "data", params replicated or TP on "model") so GSPMD
    compiles one SPMD program per chunk; without one, plain jit.  The
    carry is donated either way: the previous chunk's training state is
    dead, XLA reuses its HBM buffers in place."""
    kw = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from diral_tpu.parallel.mesh import carry_shardings

        sh = carry_shardings(carry_shapes, mesh)
        repl = NamedSharding(mesh, P())
        # logs come out replicated: they are small per-slot scalars/rows,
        # and a replicated layout keeps np.asarray on them valid on every
        # process of a multi-host run
        kw = dict(in_shardings=(sh, repl), out_shardings=(sh, repl))
    else:
        sh = None

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,), **kw)
    def run_slots(carry, t0, n: int):
        return jax.lax.scan(slot_step, carry, t0 + jnp.arange(n))

    episode_step = getattr(slot_step, "episode_step", None)
    interval = getattr(slot_step, "episode_interval", 0)
    if episode_step is None:
        return run_slots, sh

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,), **kw)
    def run_episodes(carry, t0, n: int):
        carry, logs = jax.lax.scan(
            episode_step, carry,
            t0 // interval + jnp.arange(n // interval))
        # [episodes, interval, ...] -> per-slot layout, same as run_slots
        logs = jax.tree.map(
            lambda x: x.reshape((n,) + x.shape[2:]), logs)
        return carry, logs

    def run_chunk(carry, t0, n: int):
        t0_i = int(t0)
        if t0_i % interval == 0 and n % interval == 0 and n > 0:
            return run_episodes(carry, jnp.asarray(t0), n)
        return run_slots(carry, jnp.asarray(t0), n)

    return run_chunk, sh


def train_experiment(cfg: ExperimentConfig, workdir: str = ".",
                     seed: int | None = None, chunk_size: int | None = None,
                     resume: bool = False, simulation: int = 0,
                     dtype=jnp.float32, verbose: bool = True,
                     mesh=None):
    """Run one simulation of the experiment. Returns (carry, logs dict).

    ``mesh`` is either a ``jax.sharding.Mesh`` or a CLI spec string like
    ``"data=8"`` / ``"data=4,model=2"`` (parallel/mesh.py layout): env
    instances shard over "data", Q-net hidden dims over "model".  All
    artifacts (episode lines, npy dumps, checkpoints) behave identically;
    checkpoints save/restore through Orbax with the sharded layout."""
    if isinstance(mesh, str):
        from diral_tpu.parallel.mesh import mesh_from_spec
        mesh = mesh_from_spec(mesh)
    if mesh is not None:
        ndata = mesh.shape["data"]
        if cfg.engine.num_envs % ndata:
            raise ValueError(
                f"num_envs={cfg.engine.num_envs} must be divisible by the "
                f"data-axis size {ndata} (--mesh)")
    trace = None
    if cfg.env.load_positions:
        # recorded-mobility replay fixture (main_test.py:118 ->
        # network.py:171-199)
        trace = np.load(cfg.env.load_file_pos)
        if verbose:
            print(f"Load the saved positions !!! ({trace.shape})")
    init_carry, slot_step, _ = make_train_functions(cfg, dtype, trace=trace)
    chunk = chunk_size or max(1, min(cfg.save_freq, 5000))

    key = jax.random.PRNGKey(cfg.engine.seed if seed is None else seed)
    key = jax.random.fold_in(key, simulation)
    if mesh is not None:
        # init directly into the sharded layout (works multi-host: the
        # init computation itself is SPMD; no host-side device_put of
        # the full carry)
        shapes = jax.eval_shape(init_carry, key)
        run_chunk, sh = make_chunk_runner(slot_step, mesh, shapes)
        carry = jax.jit(init_carry, out_shardings=sh)(key)
    else:
        run_chunk, _ = make_chunk_runner(slot_step)
        carry = jax.jit(init_carry)(key)

    mgr = None
    t = 0
    ckpt_dir = os.path.join(workdir, "save_model", "test",
                            cfg.experiment_name or "experiment")
    if cfg.save_model or resume:
        mgr = ckpt.checkpoint_manager(ckpt_dir)
    # Best-checkpoint tracking: parameter-shared eps-greedy DQN can collapse
    # to the degenerate all-same-channel equilibrium at the greedy switch
    # (2/8 seeds in the RESULTS.md sweep).  Alongside the rolling latest
    # checkpoints, the snapshot with the best chunk-mean sum reward is kept
    # in <ckpt_dir>_best, so greedy evaluation can use the pre-collapse
    # policy: `eval/compare-sps --checkpoint DIR --best`.
    mgr_best, best_metric = None, float("-inf")
    best_dir = ckpt_dir + "_best"
    if cfg.save_model:
        mgr_best = ckpt.checkpoint_manager(best_dir, max_to_keep=1)
        marker = os.path.join(best_dir, "best_metric.json")
        if resume and os.path.exists(marker):
            import json as _json

            with open(marker) as f:
                best_metric = _json.load(f)["mean_sum_reward"]
    if resume:
        # a restart loop passes --resume unconditionally; an empty
        # checkpoint dir means cold start, not an error
        if mgr.latest_step() is None:
            if verbose:
                print("no checkpoint yet; starting fresh")
        else:
            carry, t = ckpt.restore(mgr, carry)
            if verbose:
                print(f"resumed from slot {t}")

    # host-local artifacts are process-0-only on a multi-host run
    # (checkpoint saves stay on every process: Orbax saving is collective)
    primary = jax.process_index() == 0
    writer = ResultWriter(workdir, cfg.experiment_name or "experiment",
                          simulation) if primary else None
    rewards, actions, positions, losses = [], [], [], []
    if t > 0 and primary:
        # --resume continuity: re-seed the result arrays with the slots
        # already dumped, so the reference-layout npy files cover the whole
        # run (the reference accumulates per-slot logs over the full run)
        prev_r, prev_a, prev_p = writer.load_arrays(upto=t)
        if prev_r is not None:
            rewards.append(prev_r)
        if prev_a is not None:
            actions.append(prev_a)
        if cfg.save_positions and prev_p is not None:
            positions.append(prev_p)
        if rewards:
            # losses are not dumped to npy, so the preloaded slots have no
            # recorded loss; pad with NaN so out['loss'] stays slot-aligned
            # with out['sum_reward'] across a resume
            losses.append(np.full((rewards[0].shape[0],), np.nan, np.float32))

    while t < cfg.time_slots:
        n = min(chunk, cfg.time_slots - t)
        carry, logs = run_chunk(carry, t, n)
        rewards.append(np.asarray(logs["sum_reward"]))
        actions.append(np.asarray(logs["actions"]))
        losses.append(np.asarray(logs["loss"]))
        if cfg.save_positions:
            positions.append(np.asarray(logs["pos_x"]))
        t += n

        eps = float(np.asarray(logs["eps"])[-1])
        mean_r = float(rewards[-1][:, 0].mean())
        if writer is not None:
            if verbose:
                writer.episode_line(t - 1, eps,
                                    cfg.env.num_channels - mean_r, mean_r)
            writer.log({"slot": t, "eps": eps, "mean_sum_reward": mean_r,
                        "loss": float(losses[-1][-1])})

        if writer is not None and cfg.save_results and (
            t % cfg.save_freq == 0 or t >= cfg.time_slots
        ):
            writer.save_arrays(
                np.concatenate(rewards),
                np.concatenate(actions),
                np.concatenate(positions) if positions else None,
            )
        # mgr exists iff save_model or --resume; a resume-enabled run must
        # also write checkpoints or the next restart has nothing to load
        if mgr is not None and (
            t % cfg.save_freq == 0 or t >= cfg.time_slots
        ):
            ckpt.save(mgr, t, carry)
            all_env_mean = float(rewards[-1].mean())
            if mgr_best is not None and all_env_mean > best_metric:
                best_metric = all_env_mean
                ckpt.save(mgr_best, t, carry)
                if primary:
                    import json as _json

                    with open(os.path.join(best_dir,
                                           "best_metric.json"), "w") as f:
                        _json.dump({"step": t,
                                    "mean_sum_reward": best_metric}, f)

    if writer is not None:
        writer.close()
    out = {
        "sum_reward": np.concatenate(rewards),
        "actions": np.concatenate(actions),
        "loss": np.concatenate(losses),
    }
    if positions:
        out["pos_x"] = np.concatenate(positions)
    return carry, out


def run_all_simulations(cfg: ExperimentConfig, workdir: str = ".", **kw):
    """marl_test's outer loop (main_test.py:43-44)."""
    results = []
    for sim in range(cfg.simulations):
        print(f"-=-= experiment: {cfg.experiment_name} SIMULATION {sim + 1} =-=-")
        results.append(train_experiment(cfg, workdir, simulation=sim, **kw))
    return results
