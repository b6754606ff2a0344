"""Single-instance NumPy oracle of the V2V resource-selection environment.

This is the semantic ground truth the batched JAX engine is golden-tested
against (the "bit-exactness anchor", SURVEY.md section 7 step 1).  It
reproduces, step for step, the behavior of the reference environment stack
(reference envs/test_env.py `TestEnv`, envs/network.py `Network`,
envs/vehicle.py `Vehicle`) -- including its quirks -- but is written
array-first (flat [N]/[N,N] state, float64) rather than as mutating object
graphs, because that is the layout the JAX engine mirrors.

Reproduced reference quirks (each cited; these are load-bearing for parity):

* Neighbor tables start all-zero (vehicle.py:24-33), so initially every
  vehicle "knows" every other vehicle at position (0, 0) with age 0 -- the
  first ~20 steps of positional-distribution observations contain these
  phantom entries until ages cross the staleness cutoff (network.py:547).
* ``periodic_update`` *aliases* the transmitted table to the live table
  (vehicle.py:61 is a reference assignment, not a copy), so a piggybacked
  message carries the transmitter's *current* table, including merges that
  happened earlier in the same step's channel loop.  We therefore merge
  directly from live tables.
* ``find_closest_tx`` has the side effect of resetting
  ``last_arrival_time[tx][rx] = -1`` for every out-of-range tx (network.py:394),
  in *every* step flavor that calls it.
* The toy reward weight is 1 iff the two colliders are exactly the
  global (min-x, max-x) pair: equality of the pair distance with the norm
  distance (network.py:284-290), with first-index tie-breaking in the
  min/max scan (network.py:235-241).
* ``my_step_design``'s two-collider weight is computed against
  ``2*communication_range`` on members already gated to be *within*
  ``2*communication_range`` (test_env.py:333 + network.py:150), so it is
  always 0 and the reward is always -2 for a pair; reproduced mechanically.
* In ``my_step`` with ``state_type == 1``, the piggyback merge is issued
  without a None check on the closest transmitter (test_env.py:230-232);
  the reference would crash indexing ``vehicles[None]``.  We raise a
  ``TypeError`` in that (out-of-domain) case.

RNG call order matches the reference call-for-call so that seeded runs are
reproducible: topology init draws ``np_rng.randint`` for x then y then
``py_rng.uniform`` for velocity per user (network.py:103-110), ``sample``
uses ``np_rng.choice`` (test_env.py:121), per-episode velocity updates use
``py_rng.randrange`` (network.py:214).
"""

from __future__ import annotations

import math
import random as _random
from itertools import combinations

import numpy as np

from diral_tpu.config import EnvConfig

STALENESS_CUTOFF = 20        # table entries older than this are invisible (network.py:547)
NO_TX_DIST = 100000.0        # find_closest_tx's "no in-range transmitter" (network.py:385)
IA_HORIZON = 100             # information-age histogram length (network.py:566)


class OracleEnv:
    """Reference-semantics V2V environment, one instance, NumPy float64."""

    def __init__(self, cfg: EnvConfig, np_rng: np.random.RandomState | None = None,
                 py_rng: _random.Random | None = None):
        self.cfg = cfg
        self.np_rng = np_rng if np_rng is not None else np.random.RandomState()
        self.py_rng = py_rng if py_rng is not None else _random.Random()
        n = cfg.num_users
        self.N = n
        self.C = cfg.num_channels

        # --- world state ------------------------------------------------
        self.pos_x = np.zeros(n)
        self.pos_y = np.zeros(n)
        self.vel = np.zeros(n)
        self.direction = np.ones(n)          # +1 right, -1 left
        # row i = vehicle i's knowledge of vehicle j (vehicle.py:24-33)
        self.table_x = np.zeros((n, n))
        self.table_y = np.zeros((n, n))
        self.table_seq = np.zeros((n, n), dtype=np.int64)
        self.table_age = np.zeros((n, n), dtype=np.int64)
        # last packet arrival slot per (tx, rx); -1 = never / out of range
        self.last_arrival = np.full((n, n), -1, dtype=np.int64)
        # piggybacking channel-observation memory (test_env.py:77-79)
        self.prev_obs = np.zeros((n, self.C))
        # proportional-fair counters (test_env.py:87-92)
        self.pf_counter = np.zeros(n, dtype=np.int64)
        self.pf_threshold = 10
        self.pf_penalty = -10.0

        self.trace: np.ndarray | None = None  # recorded x-position replay

        if cfg.enable_design_topology:
            self._init_design_topology()
        elif cfg.mobility:
            self._init_random_topology()

    # ------------------------------------------------------------------
    # Topology initialization
    # ------------------------------------------------------------------

    def _init_random_topology(self):
        """Random highway, one direction (network.py:92-119; the left-lane
        branch is dead code because ``user % 1 == 0`` is always true)."""
        L, H = self.cfg.highway_length, self.cfg.highway_height
        for u in range(self.N):
            self.pos_x[u] = self.np_rng.randint(0, L)
            self.pos_y[u] = self.np_rng.randint(0, int(H / 2)) if H // 2 >= 1 else 0
            if self.cfg.mobility_vary:
                self.vel[u] = 1.7
            else:
                self.vel[u] = self.py_rng.uniform(1.1, 2.7)
            self.direction[u] = 1.0

    def _init_design_topology(self):
        """Six-vehicle 975 m fixture (network.py:69-79)."""
        xs = [0, 195, 390, 585, 780, 975]
        ys = [1, 1, 2, 2, 2, 2]
        for u in range(min(self.N, 6)):
            self.pos_x[u], self.pos_y[u] = xs[u], ys[u]
            self.vel[u] = 1.0
            self.direction[u] = 1.0

    def init_fixed_4ue(self):
        """Four-vehicle fixture (network.py:81-90; dead in the reference via
        ``and 0`` at network.py:55 but kept as a reproducible test topology)."""
        self.pos_x[:] = [3, 5, 3, 5][: self.N]
        self.pos_y[:] = [1, 1, 2, 2][: self.N]
        self.vel[:] = [0.5, 1.0, 1.25, 1.5][: self.N]
        self.direction[:] = 1.0

    def set_positions(self, pos_x, pos_y, vel=None, direction=None):
        """Inject an exact topology (used to match the JAX engine's reset)."""
        self.pos_x[:] = pos_x
        self.pos_y[:] = pos_y
        if vel is not None:
            self.vel[:] = vel
        if direction is not None:
            self.direction[:] = direction

    def load_trace(self, trace: np.ndarray):
        """Replay recorded x-positions (network.py:171-199)."""
        self.trace = np.asarray(trace, dtype=np.float64)

    # ------------------------------------------------------------------
    # Geometry
    # ------------------------------------------------------------------

    def dist(self, a: int, b: int) -> float:
        return math.sqrt(
            (self.pos_x[b] - self.pos_x[a]) ** 2 + (self.pos_y[b] - self.pos_y[a]) ** 2
        )

    def _norm_pair(self) -> tuple[int, int]:
        """First-index min-x / max-x users (network.py:231-241 strict scans)."""
        x_min, x_max = self.cfg.highway_length + 1, -self.cfg.highway_length - 1
        u_min = u_max = 0
        for u in range(self.N):
            if self.pos_x[u] < x_min:
                x_min, u_min = self.pos_x[u], u
            if self.pos_x[u] > x_max:
                x_max, u_max = self.pos_x[u], u
        return u_min, u_max

    def calculate_norm(self) -> float:
        u_min, u_max = self._norm_pair()
        return self.dist(u_min, u_max)

    def _avg_distance(self, users) -> float:
        ds = [self.dist(a, b) for a, b in combinations(users, 2)]
        return sum(ds) / len(ds)

    def _reward_weight(self, colliders) -> float:
        """network.py:273-300: toy -> 1 iff pair avg distance equals the norm;
        otherwise 1 iff avg distance exceeds communication range."""
        m = self._avg_distance(colliders)
        if self.cfg.congestion_test:
            return 1.0 if m == self.calculate_norm() else 0.0
        return 1.0 if m > self.cfg.communication_range else 0.0

    def find_closest_tx(self, tx_ids, rx: int, *, arrival_slot: int | None = None):
        """network.py:378-398 incl. the last_arrival side effect; optionally
        records an arrival slot for the accepted transmitter (my_step_ch path,
        test_env.py:434-436 performs that assignment at the call site)."""
        min_dist, min_tx = NO_TX_DIST, None
        for tx in tx_ids:
            d = self.dist(tx, rx)
            if d < self.cfg.communication_range:
                if d < min_dist:
                    min_dist, min_tx = d, tx
            else:
                self.last_arrival[tx, rx] = -1
        if arrival_slot is not None and min_tx is not None:
            self.last_arrival[min_tx, rx] = arrival_slot
        return min_dist, min_tx

    # ------------------------------------------------------------------
    # Neighbor tables (vehicle.py semantics)
    # ------------------------------------------------------------------

    def periodic_update(self):
        """vehicle.py:56-70 for every vehicle (network.py:587-593): each
        vehicle refreshes its own entry (position + seq bump, age 0) and ages
        every other entry by one."""
        idx = np.arange(self.N)
        self.table_age += 1
        self.table_seq[idx, idx] += 1
        self.table_x[idx, idx] = self.pos_x
        self.table_y[idx, idx] = self.pos_y
        self.table_age[idx, idx] = 0

    def received_update(self, rx: int, tx: int):
        """Seq-number-gated merge of tx's (live) table into rx's
        (vehicle.py:35-47 via network.py:576-585; the transmitted snapshot
        aliases the live table, vehicle.py:61)."""
        newer = self.table_seq[tx] > self.table_seq[rx]
        self.table_x[rx, newer] = self.table_x[tx, newer]
        self.table_y[rx, newer] = self.table_y[tx, newer]
        self.table_seq[rx, newer] = self.table_seq[tx, newer]
        self.table_age[rx, newer] = 0

    def dist_piggy(self, rx: int, tx: int):
        """network.py:538-558: tx's table entry for rx vs tx's current
        position; success gated on entry age < 20."""
        if not (self.cfg.mobility or self.cfg.enable_design_topology):
            raise RuntimeError("dist_piggy requires mobility or design topology")
        if self.table_age[tx, rx] < STALENESS_CUTOFF:
            dx = self.table_x[tx, rx] - self.pos_x[tx]
            dy = self.table_y[tx, rx] - self.pos_y[tx]
            d = math.sqrt(dx * dx + dy * dy)
            sign = 1.0 if dx > 0.0 else -1.0
            return True, d, sign
        return False, None, None

    # ------------------------------------------------------------------
    # Mobility
    # ------------------------------------------------------------------

    def update_mobility(self, timestep: int):
        """network.py:302-306 / 189-206: advance x with modulo wraparound, or
        replay a recorded trace."""
        if not self.cfg.mobility:
            return
        L = self.cfg.highway_length
        if self.trace is not None:
            t = timestep % len(self.trace)
            self.pos_x[:] = self.trace[t][: self.N]
        else:
            self.pos_x[:] = (self.pos_x + self.direction * self.vel + L) % L

    def update_velocity(self):
        """Per-episode velocity randomization (network.py:208-223), gated on
        mobility_vary at the env level (test_env.py:498-504)."""
        if not self.cfg.mobility_vary:
            return
        for u in range(self.N):
            r = self.py_rng.randrange(1, 4)
            if r == 1:
                self.vel[u] = min(self.vel[u] + 0.55, 2.77)
            elif r == 2:
                self.vel[u] = max(self.vel[u] - 0.55, 1.1)

    # ------------------------------------------------------------------
    # Step functions
    # ------------------------------------------------------------------

    def sample(self) -> np.ndarray:
        """Uniform random action per user (test_env.py:116-122)."""
        return self.np_rng.choice(np.arange(self.C), size=self.N)

    def _one_hot_actions(self, actions) -> np.ndarray:
        acts = np.zeros((self.N, self.C), dtype=np.int64)
        acts[np.arange(self.N), np.asarray(actions, dtype=np.int64)] = 1
        return acts

    def my_step(self, actions, timestep: int):
        """test_env.py:124-266: per-channel collision detection, the five
        reward designs, half-duplex observations, piggyback table merges,
        then mobility.  Returns (obs[N,C], piggy_obs or None, rews[N])."""
        cfg = self.cfg
        st = cfg.state
        acts = self._one_hot_actions(actions)
        obs = np.zeros((self.N, self.C))
        rews = np.zeros(self.N)
        piggy_obs = [np.zeros(self.C) for _ in range(self.N)] if st.piggybacking else None
        # (user, channel) -> the C-wide payload the faithful path inserts
        # (or would insert: the reference's prev_obs[None] crash case and
        # the empty-channel case both log zeros).  The REPAIRED fixed-width
        # observation (v2v_env.step_collision docstring) is derived from
        # this log below, so it is built from exactly what the reference
        # inserts, just placed at the zero-padded fixed layout the
        # reference's own state_space sizing intends (test_env.py:71-79).
        piggy_log: dict[tuple[int, int], np.ndarray] = {}

        if st.add_positional_dist_piggy:
            self.periodic_update()

        for ch in range(self.C):
            transmitters = [u for u in range(self.N) if acts[u, ch] == 1]
            tot = len(transmitters)
            transmission = tot > 0
            reward = 0.0
            rewards = 0.0
            if tot == 1:
                reward = 1.0
            elif tot >= 2:
                if cfg.reward_design == 1:
                    w = self._reward_weight(transmitters)
                    rewards = -1.0 * (1.0 - w / float(tot))
                elif cfg.reward_design == 2:
                    if tot == 2:
                        w = self._reward_weight(transmitters)
                        rewards = 2.0 * w - float(tot)
                    else:
                        rewards = 0.0 - float(tot)
                elif cfg.reward_design == 3:
                    rewards = -1.0 * math.exp(1.0 - 1.0 / float(tot))
                elif cfg.reward_design == 4:
                    rewards = 1.0 / float(tot)
                elif cfg.reward_design == 5:
                    if tot == 2:
                        w = self._reward_weight(transmitters)
                        rewards = 0.0 if w == 1.0 else -1.0
                    else:
                        rewards = -1.0
                else:
                    raise ValueError(f"reward_design {cfg.reward_design} undefined")

            for u in range(self.N):
                if acts[u, ch] == 1:
                    obs[u, ch] = 0.0  # half-duplex (test_env.py:206)
                    if piggy_obs is not None:
                        piggy_obs[u][ch] = 0.0
                    if tot > 1:
                        rews[u] = rewards
                        if cfg.proportional_fair:
                            if self.pf_counter[u] > self.pf_threshold:
                                rews[u] = self.pf_penalty
                            self.pf_counter[u] += 1
                    else:
                        rews[u] = reward
                        if cfg.proportional_fair:
                            self.pf_counter[u] = 0
                else:
                    if transmission:
                        if st.type == 1:
                            obs[u, ch] = 1.0
                            _, tx_id = self.find_closest_tx(transmitters, u)
                            if st.add_positional_dist_piggy:
                                if tx_id is None:
                                    raise TypeError(
                                        "state_type 1 merge with no in-range tx "
                                        "(reference crash at test_env.py:232)"
                                    )
                                self.received_update(rx=u, tx=tx_id)
                        elif st.type == 2:
                            tx_dist, tx_id = self.find_closest_tx(transmitters, u)
                            if st.add_positional_dist_piggy and tx_id is not None:
                                self.received_update(rx=u, tx=tx_id)
                            obs[u, ch] = tx_dist
                            if piggy_obs is not None:
                                tmp = self.prev_obs[tx_id] if tx_id is not None else None
                                piggy_obs[u][ch] = tx_dist
                                if tmp is not None:
                                    piggy_obs[u] = np.insert(piggy_obs[u], ch, tmp)
                                piggy_log[(u, ch)] = (
                                    tmp.copy() if tmp is not None
                                    else np.zeros(self.C)
                                )
                    else:
                        if piggy_obs is not None:
                            piggy_obs[u] = np.insert(
                                piggy_obs[u], ch, np.zeros(self.C)
                            )
                            piggy_log[(u, ch)] = np.zeros(self.C)

        self.update_mobility(timestep)
        if piggy_obs is not None:
            # Repaired fixed-width layout: base obs ++ (C-1) payload blocks
            # in ascending channel order skipping the user's own tx channel
            # (v2v_env.step_collision docstring).  Built BEFORE prev_obs
            # updates, from the faithful path's logged payloads.
            fixed = np.zeros((self.N, self.C * self.C))
            if st.type == 2:
                fixed[:, : self.C] = obs
            for u in range(self.N):
                k = 0
                for ch in range(self.C):
                    if ch == int(actions[u]):
                        continue
                    blk = piggy_log.get((u, ch))
                    if blk is not None:
                        lo = self.C + k * self.C
                        fixed[u, lo : lo + self.C] = blk
                    k += 1
            self.piggy_fixed = fixed
            self.prev_obs = obs.copy()
        return obs, piggy_obs, rews

    def my_step_design(self, actions, timestep: int):
        """test_env.py:269-316: communication-range-scoped collision rewards."""
        st = self.cfg.state
        acts = self._one_hot_actions(actions)
        obs = np.zeros((self.N, self.C))
        rews = np.zeros(self.N)

        if st.add_positional_dist_piggy:
            self.periodic_update()

        for ch in range(self.C):
            transmitters = [u for u in range(self.N) if acts[u, ch] == 1]
            tot = len(transmitters)
            for u in range(self.N):
                if acts[u, ch] == 1:
                    obs[u, ch] = 0.0
                    if tot == 1:
                        rews[u] = 1.0
                    else:
                        rews[u] = self._reward_design_scoped(u, transmitters)
                else:
                    if tot > 0:
                        obs[u, ch] = 1.0
                        _, tx_id = self.find_closest_tx(transmitters, u)
                        if st.add_positional_dist_piggy and tx_id is not None:
                            self.received_update(rx=u, tx=tx_id)

        self.update_mobility(timestep)
        return obs, rews

    def _reward_design_scoped(self, tx_user: int, transmitters) -> float:
        """test_env.py:319-349 + network.py:122-157."""
        in_range = [tx_user]
        for other in transmitters:
            if other == tx_user:
                continue
            if self.dist(tx_user, other) < 2 * self.cfg.communication_range:
                in_range.append(other)
        if len(in_range) == 1:
            return 1.0
        if len(in_range) == 2:
            m = self._avg_distance(in_range)
            w = 1.0 if m > self.cfg.communication_range * 2 else 0.0
            return 0.0 if w == 1.0 else -float(len(in_range))
        return -float(len(in_range))

    def my_step_ch(self, actions, timestep: int):
        """test_env.py:351-443: PRR-style rewards -- fraction of in-range
        receivers whose nearest in-range transmitter is you."""
        cfg = self.cfg
        st = cfg.state
        acts = self._one_hot_actions(actions)
        obs = np.zeros((self.N, self.C))
        rews = np.zeros(self.N)

        if st.add_positional_dist_piggy:
            self.periodic_update()

        for ch in range(self.C):
            transmitters = [u for u in range(self.N) if acts[u, ch] == 1]
            tot = len(transmitters)
            transmission = tot > 0

            prr = {}
            if tot > 1:
                for tx in transmitters:
                    received = in_range = 0
                    for rx in range(self.N):
                        if rx in transmitters:
                            continue  # half-duplex
                        if self.dist(tx, rx) >= cfg.communication_range:
                            continue
                        in_range += 1
                        _, nearest = self.find_closest_tx(transmitters, rx)
                        if nearest == tx:
                            received += 1
                    prr[tx] = received / in_range if in_range > 0 else 1.0

            for u in range(self.N):
                if acts[u, ch] == 1:
                    obs[u, ch] = 0.0
                    if tot > 1:
                        R = prr[u]
                        if cfg.reward_design == 3:
                            rews[u] = 1.0 - math.exp(1.0 - R)
                        elif cfg.reward_design == 4:
                            rews[u] = -1.0 * math.exp(1.0 - R)
                        elif cfg.reward_design == 2:
                            rews[u] = -1.0 * (1.0 - R)
                        else:
                            raise ValueError("reward_design undefined for my_step_ch")
                    else:
                        if cfg.reward_design == 3:
                            rews[u] = 1.0
                        elif cfg.reward_design == 4:
                            rews[u] = math.exp(1.0)
                        elif cfg.reward_design == 2:
                            rews[u] = 1.0
                        else:
                            raise ValueError("reward_design undefined for my_step_ch")
                else:
                    if transmission:
                        obs[u, ch] = 1.0
                        _, tx_id = self.find_closest_tx(
                            transmitters, u, arrival_slot=timestep
                        )
                        if tx_id is not None and st.add_positional_dist_piggy:
                            self.received_update(rx=u, tx=tx_id)

        self.update_mobility(timestep)
        return obs, rews

    # ------------------------------------------------------------------
    # Observation / state assembly
    # ------------------------------------------------------------------

    def get_positional_dist(self, user: int) -> np.ndarray:
        """Exact sorted signed distances / max distance (network.py:409-430)."""
        dists, max_d = [], 0.0
        for other in range(self.N):
            if other == user:
                continue
            d = self.dist(other, user)
            max_d = max(max_d, d)
            sign = 1.0 if self.pos_x[other] - self.pos_x[user] > 0.0 else -1.0
            dists.append(d * sign)
        return np.array(sorted(dists)) / max_d

    def get_positional_dist_piggy(self, user: int) -> np.ndarray:
        """Type-1 histogram: inf-norm-normalized weighted histogram over
        [-1, 1] (network.py:432-471)."""
        bins = self.cfg.state.num_bins
        dists = []
        for other in range(self.N):
            if other == user:
                continue
            ok, d, sign = self.dist_piggy(other, user)
            if ok:
                dists.append(d * sign)
        if not dists:
            return np.zeros(bins, dtype=int)
        edges = np.linspace(-1, 1, bins + 1)
        norm = np.linalg.norm(dists, np.inf)
        normed = np.array(sorted(dists)) / norm
        return np.histogram(normed, edges, weights=normed)[0]

    def get_positional_dist_2_piggy(self, user: int) -> np.ndarray:
        """Type-2 histogram: count histogram over +-bin_range divided by the
        number of visible neighbors (network.py:473-513) -- the view-based
        positional distribution used by the toy config."""
        bins = self.cfg.state.num_bins
        rng = self.cfg.bin_range
        dists = []
        for other in range(self.N):
            if other == user:
                continue
            ok, d, sign = self.dist_piggy(other, user)
            if ok and d < rng:
                dists.append(d * sign)
        if not dists:
            return np.zeros(bins, dtype=int)
        counts = np.histogram(sorted(dists), bins, range=(-rng, rng))[0]
        return counts / float(len(dists))

    def obtain_state(self, obs, actions, rewards, episode_number=0, epsilon=1.0):
        """Per-user state assembly in reference field order
        (test_env.py:527-583).  Returns [N, state_space]."""
        cfg, st = self.cfg, self.cfg.state
        out = []
        for u in range(self.N):
            parts = []
            if st.add_action:
                if st.action_index == "binary":
                    vec = np.zeros(self.C)
                    vec[int(actions[u])] = 1.0
                    parts.append(vec)
                elif st.action_index == "real":
                    parts.append(np.array([float(actions[u])]))
                else:
                    raise ValueError("bad action_index")
            if st.add_channel_obs:
                parts.append(np.asarray(obs[u], dtype=np.float64))
            if st.add_positional_dist:
                parts.append(self.get_positional_dist(u))
            if st.add_positional_dist_piggy:
                if st.add_positional_dist_type == 1:
                    parts.append(self.get_positional_dist_piggy(u))
                elif st.add_positional_dist_type == 2:
                    parts.append(self.get_positional_dist_2_piggy(u))
                else:
                    raise ValueError("bad add_positional_dist_type")
            if st.add_reward:
                parts.append(np.array([float(rewards[u])]))
            if st.add_index:
                parts.append(np.array([float(u + 1)]))
            if st.add_position:
                parts.append(
                    np.array(
                        [
                            self.pos_x[u] / cfg.highway_length,
                            self.pos_y[u] / cfg.highway_height,
                        ]
                    )
                )
            if st.add_velocity:
                parts.append(np.array([self.vel[u]]))
            if cfg.enable_fingerprint:
                parts.append(np.array([float(episode_number), float(epsilon)]))
            out.append(np.concatenate(parts) if parts else np.zeros(0))
        return np.stack(out)

    def state_generator(self, actions, obs):
        """DQN-era state: one-hot action + channel obs + ACK (test_env.py:507-525)."""
        out = []
        for u in range(self.N):
            vec = np.zeros(self.C)
            vec[int(actions[u])] = 1.0
            vec = np.append(vec, obs[-1])
            vec = np.append(vec, int(obs[u][0]))
            out.append(vec)
        return out

    # ------------------------------------------------------------------
    # Metrics
    # ------------------------------------------------------------------

    def get_information_age(self, timestep: int) -> np.ndarray:
        """Histogram of packet ages over all in-coverage (tx, rx) pairs
        (network.py:560-574)."""
        hist = np.zeros(IA_HORIZON, dtype=np.int64)
        for tx in range(self.N):
            for rx in range(self.N):
                if tx != rx and self.last_arrival[tx, rx] != -1:
                    ia = timestep - self.last_arrival[tx, rx]
                    if ia < IA_HORIZON:
                        hist[ia] += 1
        return hist


def calculate_ia_penalty(ia) -> float:
    """Weighted information-age sum (reference utils/misc.py:1-12)."""
    return float(sum((i + 1) * v for i, v in enumerate(ia)))
