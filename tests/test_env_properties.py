"""Property tests on the vectorized env (SURVEY.md section 4b): invariants
that must hold for arbitrary actions/topologies, complementing the golden
parity tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from diral_tpu.config import toy_4ue_3r
from diral_tpu.envs import v2v_env as E


CFG = toy_4ue_3r().env


def rollout(cfg, steps=40, seed=0, flavor=E.step_collision):
    key = jax.random.PRNGKey(seed)
    state = E.reset(cfg, key, jnp.float64)
    rng = np.random.RandomState(seed)
    step = jax.jit(flavor, static_argnums=0)
    for t in range(steps):
        actions = jnp.asarray(rng.randint(0, cfg.num_channels, cfg.num_users))
        state, obs, rew = step(cfg, state, actions, t)
        yield t, actions, state, obs, rew


def test_half_duplex_invariant():
    """A transmitter never observes its own channel (test_env.py:206)."""
    for t, actions, state, obs, rew in rollout(CFG, 60):
        own = np.asarray(obs)[np.arange(CFG.num_users), np.asarray(actions)]
        np.testing.assert_array_equal(own, 0.0)


def test_solo_transmitter_rewarded():
    """Design 2: a user alone on its channel always gets +1."""
    for t, actions, state, obs, rew in rollout(CFG, 60, seed=1):
        counts = np.bincount(np.asarray(actions), minlength=CFG.num_channels)
        for u in range(CFG.num_users):
            if counts[actions[u]] == 1:
                assert float(rew[u]) == 1.0


def test_collision_rewards_shared_and_nonpositive():
    """Design 2 colliders share one non-positive reward per channel."""
    for t, actions, state, obs, rew in rollout(CFG, 60, seed=2):
        a = np.asarray(actions)
        counts = np.bincount(a, minlength=CFG.num_channels)
        for ch in range(CFG.num_channels):
            if counts[ch] >= 2:
                vals = np.asarray(rew)[a == ch]
                assert (vals == vals[0]).all()       # shared
                assert vals[0] <= 0.0                # 2w - n <= 0 for n >= 2


def test_positions_wrap_in_highway():
    cfg = dataclasses.replace(CFG, highway_length=50)
    for t, actions, state, obs, rew in rollout(cfg, 200, seed=3):
        x = np.asarray(state.pos_x)
        assert (x >= 0).all() and (x < 50).all()


def test_histogram_mass():
    """Type-2 positional distribution rows sum to 1 when any neighbor is
    visible, else to 0 (network.py:500-505)."""
    for t, actions, state, obs, rew in rollout(CFG, 50, seed=4):
        h = np.asarray(E.positional_dist_piggy_type2(CFG, state))
        sums = h.sum(axis=1)
        age = np.asarray(state.table_age)
        for u in range(CFG.num_users):
            fresh = [(o != u) and age[u, o] < 20 for o in range(CFG.num_users)]
            if any(fresh):  # bin_range 500 > any toy distance: all visible
                np.testing.assert_allclose(sums[u], 1.0, rtol=1e-12)
            else:
                assert sums[u] == 0.0


def test_table_age_dynamics():
    """Ages reset on own entry / merge, otherwise grow by one per slot."""
    prev_age = None
    for t, actions, state, obs, rew in rollout(CFG, 30, seed=5):
        age = np.asarray(state.table_age)
        assert (np.diag(age) == 0).all()
        if prev_age is not None:
            assert ((age <= prev_age + 1)).all()
        prev_age = age


def test_seq_numbers_monotone():
    prev = None
    for t, actions, state, obs, rew in rollout(CFG, 30, seed=6):
        seq = np.asarray(state.table_seq)
        assert (np.diag(seq) == t + 1).all()  # one own-seq bump per step
        if prev is not None:
            assert (seq >= prev).all()
        prev = seq


def test_channel_step_reward_bounds():
    """my_step_ch design 2: rewards in [-1, 1]."""
    cfg = dataclasses.replace(CFG, communication_range=60.0, num_users=8,
                              num_channels=4)
    for t, actions, state, obs, rew in rollout(cfg, 50, seed=7,
                                               flavor=E.step_channel):
        r = np.asarray(rew)
        assert (r >= -1.0).all() and (r <= 1.0).all()


def test_unrolled_fold_helpers_match_jnp_semantics():
    """_min_argmin / _gather_rows are bit-identical to jnp.min/argmin and
    row indexing, including first-occurrence tie-breaks on duplicated
    values (the reference's strict-< scans)."""
    import numpy as np
    from diral_tpu.envs.v2v_env import _min_argmin, _gather_rows

    key = jax.random.PRNGKey(0)
    for n in (2, 3, 7, 16, 31):
        # force ties: values drawn from a tiny integer set
        vals = jax.random.randint(key, (5, n), 0, 3).astype(jnp.float32)
        mn, am = _min_argmin(vals, n)
        np.testing.assert_array_equal(np.asarray(mn), np.asarray(vals.min(-1)))
        np.testing.assert_array_equal(np.asarray(am),
                                      np.asarray(vals.argmin(-1)))
        mat = jax.random.normal(jax.random.fold_in(key, n), (n, 4))
        ids = jax.random.randint(jax.random.fold_in(key, n + 99), (n,), 0, n)
        np.testing.assert_array_equal(np.asarray(_gather_rows(mat, ids)),
                                      np.asarray(mat[ids]))


def test_bin_membership_equals_index_form():
    """The gather-free membership histogram must agree bit-for-bit with the
    np.histogram index math (histogram_bin_indices) AND with np.histogram
    itself, on adversarial values: exact edges, the floats one ULP either
    side of every edge, and both range endpoints -- in f32 and f64."""
    from diral_tpu.ops.histogram import (bin_membership,
                                         histogram_bin_indices)

    for dtype, lo, hi, nbins in [(np.float32, -500.0, 500.0, 20),
                                 (np.float64, -500.0, 500.0, 20),
                                 (np.float64, -1.0, 1.0, 13),
                                 (np.float32, 0.0, 737.5, 7)]:
        edges = np.linspace(dtype(lo), dtype(hi), nbins + 1, dtype=dtype)
        vals = np.concatenate([
            edges,
            np.nextafter(edges, dtype(np.inf), dtype=dtype),
            np.nextafter(edges, dtype(-np.inf), dtype=dtype),
            np.linspace(dtype(lo), dtype(hi), 997, dtype=dtype),
        ])
        member = np.asarray(bin_membership(jnp.asarray(vals), lo, hi, nbins))
        idx = np.asarray(histogram_bin_indices(jnp.asarray(vals), lo, hi,
                                               nbins))
        # range mask under XLA semantics (like the real ops): XLA flushes
        # subnormals, so a host-side mask would disagree on values like
        # nextafter(0, -1)
        in_range = np.asarray((jnp.asarray(vals) >= lo)
                              & (jnp.asarray(vals) <= hi))
        onehot = (idx[:, None] == np.arange(nbins)) & in_range[:, None]
        np.testing.assert_array_equal(member, onehot)
        if dtype is np.float64:
            # np.histogram cross-check (f64 only: np.histogram builds its
            # edges in float64 regardless of the values' dtype, so f32
            # near-edge values legitimately classify against different
            # edge images -- parity work runs in f64, where they agree).
            # Subnormals are excluded: XLA flushes them to zero before
            # comparing (nextafter(0, -1) lands right-of-edge under XLA,
            # left-of-edge under NumPy) -- unreachable for real distances.
            normal = (vals == 0) | (np.abs(vals) >= np.finfo(dtype).tiny)
            keep = in_range & normal
            counts = np.histogram(vals[keep], nbins, range=(lo, hi))[0]
            np.testing.assert_array_equal(member[keep].sum(axis=0), counts)
