"""Golden parity: the batched JAX env engine vs the NumPy oracle.

The oracle (diral_tpu/envs/oracle.py) transliterates the reference
environment semantics (reference envs/test_env.py, envs/network.py,
envs/vehicle.py); these tests drive both engines step-for-step from
identical topologies and action streams and demand bit-exact float64
agreement on observations, rewards, state vectors, neighbor tables and
information age.
"""

import dataclasses
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diral_tpu.config import toy_4ue_3r
from diral_tpu.envs import oracle as onp
from diral_tpu.envs import v2v_env as jenv

F64 = jnp.float64


def make_oracle(cfg, seed=0):
    return onp.OracleEnv(cfg, np.random.RandomState(seed), random.Random(seed + 1))


def jax_state_from_oracle(cfg, o):
    return jenv.reset_from(cfg, o.pos_x, o.pos_y, o.vel, o.direction, dtype=F64)


def rollout_compare(cfg, steps=60, seed=0, flavor="collision", rtol=0.0, atol=0.0,
                    state_atol=0.0):
    """Run oracle and JAX env in lockstep; compare everything each step."""
    o = make_oracle(cfg, seed)
    s = jax_state_from_oracle(cfg, o)
    step_fn = {
        "collision": jenv.step_collision,
        "design": jenv.step_design,
        "channel": jenv.step_channel,
    }[flavor]
    jit_step = jax.jit(step_fn, static_argnums=0)
    jit_obtain = jax.jit(jenv.obtain_state, static_argnums=(0, 5, 6))
    rng = np.random.RandomState(seed + 7)

    for t in range(steps):
        actions = rng.randint(0, cfg.num_channels, size=cfg.num_users)

        if flavor == "collision":
            obs_o, _, rew_o = o.my_step(actions, t)
        elif flavor == "design":
            obs_o, rew_o = o.my_step_design(actions, t)
        else:
            obs_o, rew_o = o.my_step_ch(actions, t)

        s, obs_j, rew_j = jit_step(cfg, s, jnp.asarray(actions), t)

        np.testing.assert_allclose(np.asarray(obs_j), obs_o, rtol=rtol, atol=atol,
                                   err_msg=f"obs mismatch at t={t}")
        np.testing.assert_allclose(np.asarray(rew_j), rew_o, rtol=rtol, atol=atol,
                                   err_msg=f"rew mismatch at t={t}")

        # world + table state
        np.testing.assert_array_equal(np.asarray(s.pos_x), o.pos_x)
        np.testing.assert_array_equal(np.asarray(s.table_seq), o.table_seq)
        np.testing.assert_array_equal(np.asarray(s.table_age), o.table_age)
        np.testing.assert_allclose(np.asarray(s.table_x), o.table_x, rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(s.last_arrival), o.last_arrival)

        st_o = o.obtain_state(obs_o, actions, rew_o, episode_number=3, epsilon=0.5)
        st_j = jit_obtain(cfg, s, obs_j, jnp.asarray(actions),
                          jnp.asarray(rew_o), 3, 0.5)
        np.testing.assert_allclose(np.asarray(st_j), st_o, rtol=rtol, atol=state_atol,
                                   err_msg=f"state mismatch at t={t}")

        ia_o = o.get_information_age(t)
        ia_j = jenv.information_age(s, t)
        np.testing.assert_array_equal(np.asarray(ia_j), ia_o)


def test_toy_4ue_3r_bitexact():
    """The flagship BASELINE config: 4 UE / 3 channels, reward design 2,
    congestion weighting, type-2 piggy positional distribution."""
    cfg = toy_4ue_3r().env
    rollout_compare(cfg, steps=120, seed=0)


def test_toy_multiple_seeds():
    cfg = toy_4ue_3r().env
    for seed in (1, 2, 3):
        rollout_compare(cfg, steps=50, seed=seed)


def test_more_users_channels():
    cfg = dataclasses.replace(
        toy_4ue_3r().env, num_users=7, num_channels=5, highway_length=300
    )
    rollout_compare(cfg, steps=60, seed=4)


def test_scan_channel_loop_parity():
    """C > CHANNEL_UNROLL_MAX switches the per-channel walk to lax.scan
    (the 50-resource scale path); numerics must stay bit-exact."""
    assert 12 > jenv.CHANNEL_UNROLL_MAX
    cfg = dataclasses.replace(
        toy_4ue_3r().env, num_users=16, num_channels=12, highway_length=400
    )
    rollout_compare(cfg, steps=30, seed=42)
    cfg2 = dataclasses.replace(cfg, communication_range=80.0)
    rollout_compare(cfg2, steps=30, seed=43, flavor="channel")
    rollout_compare(cfg2, steps=30, seed=44, flavor="design")


@pytest.mark.parametrize("design", [1, 2, 3, 4, 5])
def test_reward_designs(design):
    cfg = dataclasses.replace(toy_4ue_3r().env, reward_design=design)
    # Design 3 rewards go through exp(); XLA's exp may differ from libm by 1 ULP.
    tol = 1e-15 if design == 3 else 0.0
    rollout_compare(cfg, steps=40, seed=10 + design, rtol=tol, atol=tol)


def test_non_congestion_weighting():
    """weight = avg collider distance > communication_range (network.py:291-295)."""
    cfg = dataclasses.replace(
        toy_4ue_3r().env, congestion_test=False, communication_range=30.0
    )
    rollout_compare(cfg, steps=40, seed=21)


def test_state_type_1():
    cfg = dataclasses.replace(
        toy_4ue_3r().env,
        state=dataclasses.replace(toy_4ue_3r().env.state, type=1),
    )
    rollout_compare(cfg, steps=40, seed=5)


def test_design_step_parity():
    cfg = dataclasses.replace(toy_4ue_3r().env, communication_range=40.0)
    rollout_compare(cfg, steps=60, seed=6, flavor="design")


@pytest.mark.parametrize("design", [2, 3, 4])
def test_channel_step_parity(design):
    cfg = dataclasses.replace(
        toy_4ue_3r().env, reward_design=design, communication_range=60.0,
        num_users=6, num_channels=4,
    )
    # Designs 3/4 rewards go through exp(); allow 1-ULP transcendental skew.
    tol = 0.0 if design == 2 else 1e-15
    rollout_compare(cfg, steps=60, seed=30 + design, flavor="channel",
                    rtol=tol, atol=tol)


def test_full_state_features():
    """Every obtain_state feature toggle at once (except piggybacking)."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(
        base,
        enable_fingerprint=True,
        state=dataclasses.replace(
            base.state,
            add_reward=True,
            add_index=True,
            add_velocity=True,
            add_position=True,
            add_channel_obs=True,
            add_positional_dist=True,
        ),
    )
    o = make_oracle(cfg, 11)
    assert cfg.state_space == 3 + 3 + 20 + 1 + 1 + 2 + 1 + 2 + (cfg.num_users - 1)
    # add_position divides by a compile-time constant (highway_length); XLA
    # strength-reduces that to multiply-by-reciprocal, 1 ULP off exact
    # division.  All discrete/toy-path features remain bit-exact.
    rollout_compare(cfg, steps=40, seed=11, atol=0, state_atol=1e-15)


def test_type1_histogram_close():
    """Type-1 weighted histogram: summation order differs from np.histogram's
    sorted accumulation, so allow ULP-scale tolerance."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(
        base,
        state=dataclasses.replace(base.state, add_positional_dist_type=1),
    )
    rollout_compare(cfg, steps=40, seed=12, atol=1e-12, state_atol=1e-12)


def test_real_action_index():
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(
        base, state=dataclasses.replace(base.state, action_index="real")
    )
    assert cfg.state_space == 1 + 20
    rollout_compare(cfg, steps=30, seed=13)


def test_proportional_fair():
    cfg = dataclasses.replace(toy_4ue_3r().env, proportional_fair=True)
    rollout_compare(cfg, steps=80, seed=14)


def test_trace_replay():
    """Recorded-position replay path (network.py:171-199)."""
    cfg = toy_4ue_3r().env
    trace = np.random.RandomState(0).uniform(0, 100, size=(7, cfg.num_users))
    o = make_oracle(cfg, 15)
    o.load_trace(trace)
    s = jax_state_from_oracle(cfg, o)
    jt = jnp.asarray(trace, F64)
    rng = np.random.RandomState(16)
    for t in range(25):
        actions = rng.randint(0, cfg.num_channels, size=cfg.num_users)
        obs_o, _, rew_o = o.my_step(actions, t)
        s, obs_j, rew_j = jenv.step_collision(cfg, s, jnp.asarray(actions), t, trace=jt)
        np.testing.assert_array_equal(np.asarray(obs_j), obs_o)
        np.testing.assert_array_equal(np.asarray(rew_j), rew_o)
        np.testing.assert_array_equal(np.asarray(s.pos_x), o.pos_x)


def test_state_generator_parity():
    """DQN-era state assembly (test_env.py:507-525): one-hot action ++ the
    last user's channel-obs row ++ int-truncated own first-channel obs."""
    cfg = toy_4ue_3r().env
    o = make_oracle(cfg, seed=9)
    s = jax_state_from_oracle(cfg, o)
    jit_step = jax.jit(jenv.step_collision, static_argnums=0)
    jit_gen = jax.jit(jenv.state_generator, static_argnums=0)
    rng = np.random.RandomState(11)
    for t in range(40):
        actions = rng.randint(0, cfg.num_channels, size=cfg.num_users)
        obs_o, _, _ = o.my_step(actions, t)
        s, obs_j, _ = jit_step(cfg, s, jnp.asarray(actions), t)
        sg_o = o.state_generator(actions, obs_o)
        sg_j = jit_gen(cfg, jnp.asarray(actions), obs_j)
        np.testing.assert_array_equal(np.asarray(sg_j), np.asarray(sg_o),
                                      err_msg=f"state_generator at t={t}")


def test_state_generator_parity_state_type_1():
    """state_type 1 obs carries binary closest-tx flags (the toy default is
    type 2, distance obs, which exercises the int() ACK truncation); both
    obs flavors must assemble identically."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(base, state=dataclasses.replace(base.state, type=1))
    o = make_oracle(cfg, seed=13)
    s = jax_state_from_oracle(cfg, o)
    jit_step = jax.jit(jenv.step_collision, static_argnums=0)
    jit_gen = jax.jit(jenv.state_generator, static_argnums=0)
    rng = np.random.RandomState(17)
    for t in range(40):
        actions = rng.randint(0, cfg.num_channels, size=cfg.num_users)
        obs_o, _, _ = o.my_step(actions, t)
        s, obs_j, _ = jit_step(cfg, s, jnp.asarray(actions), t)
        sg_o = o.state_generator(actions, obs_o)
        sg_j = jit_gen(cfg, jnp.asarray(actions), obs_j)
        np.testing.assert_array_equal(np.asarray(sg_j), np.asarray(sg_o),
                                      err_msg=f"state_generator at t={t}")


def _piggy_rollout(cfg, steps, seed):
    """Engine [N, C*C] piggy obs vs the oracle's repaired layout, bit-exact;
    the oracle layout is derived from the faithful path's logged np.insert
    payloads (oracle.my_step), which are themselves golden-tested against
    the real reference env (tests/test_reference_parity.py)."""
    n, c = cfg.num_users, cfg.num_channels
    o = make_oracle(cfg, seed)
    s = jax_state_from_oracle(cfg, o)
    jit_step = jax.jit(jenv.step_collision, static_argnums=0)
    jit_obtain = jax.jit(jenv.obtain_state, static_argnums=(0, 5, 6))
    rng = np.random.RandomState(seed + 7)
    for t in range(steps):
        actions = rng.randint(0, c, size=n)
        obs_o, piggy_o, rew_o = o.my_step(actions, t)
        s, obs_j, rew_j = jit_step(cfg, s, jnp.asarray(actions), t)
        assert obs_j.shape == (n, c * c)
        np.testing.assert_array_equal(np.asarray(obs_j), o.piggy_fixed,
                                      err_msg=f"piggy fixed obs t={t}")
        np.testing.assert_array_equal(np.asarray(rew_j), rew_o)
        np.testing.assert_array_equal(np.asarray(s.prev_obs), o.prev_obs)
        np.testing.assert_array_equal(np.asarray(s.table_seq), o.table_seq)
        # the fixed obs feeds obtain_state at exactly the sizing's width
        st_j = jit_obtain(cfg, s, obs_j, jnp.asarray(actions),
                          jnp.asarray(rew_o), 0, 1.0)
        st_o = o.obtain_state(o.piggy_fixed, actions, rew_o)
        np.testing.assert_array_equal(np.asarray(st_j), np.asarray(st_o))
        assert np.asarray(st_j).shape == (n, cfg.state_space)


def test_piggybacking_fixed_width():
    """Repaired fixed-width piggybacking (VERDICT r2 #2): width matches the
    reference's own state_space sizing C + C*(C-1) (test_env.py:71-79)."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(
        base, state=dataclasses.replace(
            base.state, piggybacking=True, add_channel_obs=True))
    assert cfg.state_space == 3 + 3 + 3 * 2 + 20
    _piggy_rollout(cfg, steps=80, seed=23)


def test_piggybacking_no_inrange_tx_zero_pads():
    """Tiny communication range: find_closest_tx returns (1e5, None) -- the
    reference path crashes on prev_obs[None] (test_env.py:241-243); the
    repair zero-pads that block.  Base slots still carry the 1e5 sentinel
    distance like the plain obs does."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(
        base, communication_range=2.0, highway_length=1000,
        state=dataclasses.replace(
            base.state, piggybacking=True, add_channel_obs=True))
    _piggy_rollout(cfg, steps=60, seed=29)


def test_piggybacking_state_type_1():
    """Under state_type 1 the faithful path never inserts payloads (only the
    empty-channel zeros), so the repaired obs is all-zero padding."""
    base = toy_4ue_3r().env
    cfg = dataclasses.replace(
        base, state=dataclasses.replace(
            base.state, piggybacking=True, add_channel_obs=True, type=1))
    _piggy_rollout(cfg, steps=40, seed=31)


def test_piggybacking_more_channels():
    cfg = dataclasses.replace(
        toy_4ue_3r().env, num_users=6, num_channels=5, highway_length=300,
        state=dataclasses.replace(
            toy_4ue_3r().env.state, piggybacking=True, add_channel_obs=True))
    assert cfg.state_space == 5 + 5 + 5 * 4 + 20
    _piggy_rollout(cfg, steps=60, seed=37)


def test_sample_uniform():
    cfg = toy_4ue_3r().env
    acts = jenv.sample_actions(cfg, jax.random.PRNGKey(0))
    assert acts.shape == (cfg.num_users,)
    assert ((np.asarray(acts) >= 0) & (np.asarray(acts) < cfg.num_channels)).all()


def test_vmap_batch_consistency():
    """A vmapped batch of envs must agree with per-instance stepping."""
    cfg = toy_4ue_3r().env
    B = 8
    oracles = [make_oracle(cfg, 100 + b) for b in range(B)]
    states = [jax_state_from_oracle(cfg, o) for o in oracles]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    step_b = jax.jit(
        jax.vmap(lambda s, a, t: jenv.step_collision(cfg, s, a, t)),
        static_argnums=(),
    )
    rng = np.random.RandomState(17)
    for t in range(20):
        actions = rng.randint(0, cfg.num_channels, size=(B, cfg.num_users))
        batched, obs_j, rew_j = step_b(
            batched, jnp.asarray(actions), jnp.full((B,), t)
        )
        for b, o in enumerate(oracles):
            obs_o, _, rew_o = o.my_step(actions[b], t)
            np.testing.assert_array_equal(np.asarray(obs_j[b]), obs_o)
            np.testing.assert_array_equal(np.asarray(rew_j[b]), rew_o)
