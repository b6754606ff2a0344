// Toy-RealNeS: a C++ discrete-event V2V simulator stand-in that speaks the
// reference's agent protocol (see ../ma_messages.proto; roles per reference
// envs/realness_bridge.py -- the simulator is the connecting/requesting
// side, the agent binds and grants).
//
// The real RealNeS (C++/TCL, absent from the reference repo) computed
// channel physics and mobility and drove the agent with per-user
// sequence-numbered scheduling requests carrying piggybacked neighbor
// tables (message catalog: envs/ma_messages_pb2.py).  This stand-in
// reproduces that interaction pattern over the toy world model:
//
//   per round (SN), per vehicle: send MA_SchedulingRequestSynDist
//     {user_id, neighbor table, SN, reward of previous round}
//   <- MA_SchedulingGrant{time_stamp = chosen resource}  (stop on request)
//   then: per-transmitter raw PRR (reported in the request's reward field;
//   the agent maps PRR -> reward, realness_env.py:377-394), seq-gated
//   neighbor-table merges from each receiver's closest transmitter, and
//   modular mobility advance -- the same world rules as the Python oracle.
//
// Request modes (last CLI arg, default "dist"):
//   dist  MA_SchedulingRequestSynDist with the piggybacked neighbor table
//         (reference get_observation_syn_dist path, realness_env.py:360-396)
//   syn   MA_SchedulingRequestSyn with per-channel sensed RSSI (int dB) as
//         state; the UE's own last-transmit channel is zeroed, matching the
//         reference's "already set to zero from the simulator" half-duplex
//         note (realness_env.py:343-344); agent path get_observation_syn
//   sps   SPS_SchedulingRequestSyn with per-channel sensed RSSI (double dB)
//         -- the selection window the reference's v2x_sps consumed
//         (realness_bridge.py:195-208)
//
// An optional reward-collector endpoint serves MA_RewardSentAll on a second
// port (REP role), mirroring the reference's :5557 collector.
//
// Framing: 4-byte big-endian length + protobuf payload (the repo's
// transport.py framing; a libzmq build only needs the framing swapped).
//
// Build: see Makefile (protoc --cpp_out + g++ -lprotobuf).

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cmath>
#include <mutex>
#include <cstdint>
#include <cstring>
#include <iostream>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include "ma_messages.pb.h"

namespace {

// ---------------------------------------------------------------------
// framed-TCP helpers
// ---------------------------------------------------------------------

bool send_all(int fd, const char* buf, size_t n) {
  while (n > 0) {
    ssize_t w = ::send(fd, buf, n, 0);
    if (w <= 0) return false;
    buf += w;
    n -= static_cast<size_t>(w);
  }
  return true;
}

bool recv_all(int fd, char* buf, size_t n) {
  while (n > 0) {
    ssize_t r = ::recv(fd, buf, n, 0);
    if (r <= 0) return false;
    buf += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

bool send_frame(int fd, const std::string& payload) {
  uint32_t len = htonl(static_cast<uint32_t>(payload.size()));
  return send_all(fd, reinterpret_cast<const char*>(&len), 4) &&
         send_all(fd, payload.data(), payload.size());
}

bool recv_frame(int fd, std::string* out) {
  uint32_t len_be;
  if (!recv_all(fd, reinterpret_cast<char*>(&len_be), 4)) return false;
  uint32_t len = ntohl(len_be);
  out->resize(len);
  return recv_all(fd, out->data(), len);
}

int connect_to(const std::string& host, int port) {
  addrinfo hints{}, *res;
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  std::string port_s = std::to_string(port);
  for (int attempt = 0; attempt < 100; ++attempt) {
    if (getaddrinfo(host.c_str(), port_s.c_str(), &hints, &res) == 0) {
      int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
      if (fd >= 0 && connect(fd, res->ai_addr, res->ai_addrlen) == 0) {
        freeaddrinfo(res);
        return fd;
      }
      if (fd >= 0) close(fd);
      freeaddrinfo(res);
    }
    usleep(100 * 1000);
  }
  return -1;
}

// ---------------------------------------------------------------------
// world model (matches the Python oracle's toy rules)
// ---------------------------------------------------------------------

struct World {
  int n, c;
  double highway_len, comm_range;
  std::vector<double> x, y, vel;
  // tables[i][j]: i's knowledge of j (vehicle.py:20-33 semantics)
  std::vector<std::vector<float>> tx, ty;
  std::vector<std::vector<int>> tseq, tage;
  std::vector<float> reward;
  std::mutex reward_mu;  // guards reward: collector thread reads concurrently
  std::mt19937 rng;

  World(int n_, int c_, double len, double range, uint32_t seed)
      : n(n_), c(c_), highway_len(len), comm_range(range),
        x(n), y(n, 0.0), vel(n),
        tx(n, std::vector<float>(n, 0.f)), ty(n, std::vector<float>(n, 0.f)),
        tseq(n, std::vector<int>(n, 0)), tage(n, std::vector<int>(n, 0)),
        reward(n, 0.f), rng(seed) {
    std::uniform_int_distribution<int> px(0, static_cast<int>(len) - 1);
    std::uniform_real_distribution<double> pv(1.1, 2.7);
    for (int i = 0; i < n; ++i) {
      x[i] = px(rng);
      vel[i] = pv(rng);
    }
  }

  double dist(int a, int b) const {
    double dx = x[b] - x[a], dy = y[b] - y[a];
    return std::sqrt(dx * dx + dy * dy);
  }

  // Free-space sensing proxy, the same model as the agent-side toy_rssi
  // (diral_tpu/agents/sps.py): per channel, the strongest received power
  // over last round's transmitters on that channel; idle channels sense
  // the noise floor (v2x_sps.py:20 comment scale).
  std::vector<double> sense_rssi(int u, const std::vector<int>& last) const {
    constexpr double kNoiseFloor = -117.0, kRxBusy = -90.0;
    std::vector<double> out(c, kNoiseFloor);
    for (int t = 0; t < n; ++t) {
      if (t == u) continue;
      double p = kRxBusy - 20.0 * std::log10(std::max(dist(u, t), 1.0));
      out[last[t]] = std::max(out[last[t]], p);
    }
    return out;
  }

  // vehicle.py:56-70 for everyone
  void periodic_update() {
    for (int i = 0; i < n; ++i) {
      for (int j = 0; j < n; ++j) tage[i][j] += 1;
      tseq[i][i] += 1;
      tx[i][i] = static_cast<float>(x[i]);
      ty[i][i] = static_cast<float>(y[i]);
      tage[i][i] = 0;
    }
  }

  // vehicle.py:35-47 seq-gated merge of src's live table into dst's
  void merge(int dst, int src) {
    for (int j = 0; j < n; ++j) {
      if (tseq[src][j] > tseq[dst][j]) {
        tx[dst][j] = tx[src][j];
        ty[dst][j] = ty[src][j];
        tseq[dst][j] = tseq[src][j];
        tage[dst][j] = 0;
      }
    }
  }

  // my_step_ch rules, reward design 2 (test_env.py:351-443)
  void step(const std::vector<int>& actions) {
    periodic_update();
    std::vector<int> count(c, 0);
    for (int u = 0; u < n; ++u) count[actions[u]] += 1;

    // Raw PRR per transmitter -- the agent side maps PRR -> reward
    // (realness_env.py:377-394), as the real RealNeS reported raw PRR.
    std::vector<float> new_reward(n, 0.f);
    for (int u = 0; u < n; ++u) {
      int ch = actions[u];
      if (count[ch] == 1) {
        new_reward[u] = 1.0f;
        continue;
      }
      int in_range = 0, received = 0;
      for (int r = 0; r < n; ++r) {
        if (actions[r] == ch) continue;  // half duplex on this channel
        if (dist(u, r) >= comm_range) continue;
        in_range += 1;
        // nearest in-range co-channel transmitter to r
        double best = 1e18;
        int best_tx = -1;
        for (int t = 0; t < n; ++t) {
          if (actions[t] != ch) continue;
          double d = dist(t, r);
          if (d < comm_range && d < best) {
            best = d;
            best_tx = t;
          }
        }
        if (best_tx == u) received += 1;
      }
      float prr = in_range > 0 ? static_cast<float>(received) / in_range : 1.0f;
      new_reward[u] = prr;
    }
    {
      std::lock_guard<std::mutex> lock(reward_mu);
      reward = new_reward;
    }

    // receivers merge from their closest in-range transmitter per channel
    for (int ch = 0; ch < c; ++ch) {
      if (count[ch] == 0) continue;
      for (int r = 0; r < n; ++r) {
        if (actions[r] == ch) continue;
        double best = 1e18;
        int best_tx = -1;
        for (int t = 0; t < n; ++t) {
          if (actions[t] != ch) continue;
          double d = dist(t, r);
          if (d < comm_range && d < best) {
            best = d;
            best_tx = t;
          }
        }
        if (best_tx >= 0) merge(r, best_tx);
      }
    }

    // mobility (network.py:189-206), all rightbound
    for (int u = 0; u < n; ++u)
      x[u] = std::fmod(x[u] + vel[u] + highway_len, highway_len);
  }
};

// reward collector endpoint (REP role on reward_port)
void reward_collector(int port, World* world, std::atomic<bool>* stop) {
  int lfd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = INADDR_ANY;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(lfd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      listen(lfd, 1) != 0) {
    std::cerr << "reward collector: bind failed on " << port << "\n";
    close(lfd);
    return;
  }
  while (!stop->load()) {
    int fd = accept(lfd, nullptr, nullptr);
    if (fd < 0) break;
    std::string req;
    while (recv_frame(fd, &req)) {
      MA_RewardSentAll all;
      {
        std::lock_guard<std::mutex> lock(world->reward_mu);
        for (int u = 0; u < world->n; ++u) {
          MA_RewardSent* r = all.add_all_rewards();
          r->set_user_id(u);
          r->set_sn(0);
          r->set_reward(world->reward[u]);
        }
      }
      if (!send_frame(fd, all.SerializeAsString())) break;
    }
    close(fd);
  }
  close(lfd);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 6) {
    std::cerr << "usage: realnes_sim <host> <port> <num_users> <num_channels>"
                 " <rounds> [seed] [reward_port] [mode: dist|syn|sps]\n";
    return 2;
  }
  std::string host = argv[1];
  int port = std::atoi(argv[2]);
  int n = std::atoi(argv[3]);
  int c = std::atoi(argv[4]);
  int rounds = std::atoi(argv[5]);
  uint32_t seed = argc > 6 ? static_cast<uint32_t>(std::strtoul(argv[6], nullptr, 10)) : 0u;
  int reward_port = argc > 7 ? std::atoi(argv[7]) : 0;
  std::string mode = argc > 8 ? argv[8] : "dist";
  if (mode != "dist" && mode != "syn" && mode != "sps") {
    std::cerr << "unknown mode " << mode << "\n";
    return 2;
  }

  World world(n, c, /*len=*/100.0, /*range=*/250.0, seed);

  std::atomic<bool> stop{false};
  std::thread collector;
  if (reward_port > 0)
    collector = std::thread(reward_collector, reward_port, &world, &stop);

  int fd = connect_to(host, port);
  if (fd < 0) {
    std::cerr << "cannot connect to agent at " << host << ":" << port << "\n";
    return 1;
  }

  // init handshake: the agent subtracts one disabled user
  // (realness_bridge.py:88), so advertise n + 1.
  {
    MA_SimInitMsg init;
    init.set_total_users(n + 1);
    init.set_action_space(c);
    // dist: neighbor-table entries per request; syn/sps: per-channel RSSI
    init.set_state_space(mode == "dist" ? n : c);
    init.set_state_space_type(2);  // RSSI-flavored (realness_env.py:335)
    if (!send_frame(fd, init.SerializeAsString())) return 1;
    std::string ack_raw;
    if (!recv_frame(fd, &ack_raw)) return 1;
    MA_SimInitAck ack;
    ack.ParseFromString(ack_raw);
  }

  std::vector<int> actions(n, 0);
  bool stopped = false;
  for (int sn = 0; sn < rounds && !stopped; ++sn) {
    for (int u = 0; u < n; ++u) {
      // RealNeS user ids are 1-based ("user 0 disabled"); the agent side
      // subtracts one (realness_env.py:368, realness_bridge.py:88).
      std::string payload;
      if (mode == "dist") {
        MA_SchedulingRequestSynDist req;
        req.set_user_id(u + 1);
        req.set_sn(sn);
        req.set_reward(world.reward[u]);
        for (int j = 0; j < n; ++j) {
          MA_NeighborTableEntry* e = req.add_neighbor();
          e->set_pos_x(world.tx[u][j]);
          e->set_pos_y(world.ty[u][j]);
          e->set_seq_num(world.tseq[u][j]);
          e->set_last_update(world.tage[u][j]);
        }
        payload = req.SerializeAsString();
      } else if (mode == "syn") {
        MA_SchedulingRequestSyn req;
        req.set_user_id(u + 1);
        req.set_sn(sn);
        req.set_reward(world.reward[u]);
        std::vector<double> rssi = world.sense_rssi(u, actions);
        // half duplex: the UE cannot sense the channel it transmitted on;
        // the simulator zeroes it (realness_env.py:343-344 note)
        rssi[actions[u]] = 0.0;
        for (double v : rssi) req.add_state(static_cast<int32_t>(v));
        payload = req.SerializeAsString();
      } else {  // sps
        SPS_SchedulingRequestSyn req;
        req.set_user_id(u + 1);
        req.set_sn(sn);
        req.set_reward(world.reward[u]);
        for (double v : world.sense_rssi(u, actions)) req.add_state(v);
        payload = req.SerializeAsString();
      }
      if (!send_frame(fd, payload)) { stopped = true; break; }
      std::string grant_raw;
      if (!recv_frame(fd, &grant_raw)) { stopped = true; break; }
      MA_SchedulingGrant grant;
      grant.ParseFromString(grant_raw);
      if (grant.stop_simulation()) { stopped = true; break; }
      actions[u] = grant.time_stamp();
    }
    if (!stopped) world.step(actions);
  }

  close(fd);
  stop.store(true);
  if (collector.joinable()) {
    // poke the collector loop out of accept()
    int poke = connect_to("127.0.0.1", reward_port);
    if (poke >= 0) close(poke);
    collector.join();
  }
  std::cerr << "realnes_sim: finished\n";
  return 0;
}
