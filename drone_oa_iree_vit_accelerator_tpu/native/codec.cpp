// Native runtime: UDP wire codec + serve loop.
//
// C++ counterpart of the reference's on-device inference server shell
// (reference samples/inference_udp_FPGA_custom_dispatch/main.cpp): the
// socket loop, packet (un)packing and byte-order handling live in native
// code; the model step is invoked through a callback (the Python side
// binds it to the jitted TPU program — the analog of the reference
// calling into the IREE VM).
//
// Wire protocol (reference main.cpp:33-48, 320-370):
//   request  = 5424 bytes: 5400 x u8 depth image (60x90), f32 BE desired
//              velocity, f32 BE position-x, 4 x f32 BE quaternion (wxyz)
//   reply    = 12 bytes: 3 x f32 velocity command, HOST byte order
//              (the reference's pack_reply does not swap, main.cpp:358-370)
//
// Build: g++ -O3 -shared -fPIC -o libdoa_native.so codec.cpp

#include <arpa/inet.h>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

namespace {

constexpr size_t kImageSize = 5400;
constexpr size_t kRequestSize = kImageSize + 4 + 4 + 16;  // 5424
constexpr size_t kReplySize = 12;

float be_to_float(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  v = ntohl(v);
  float f;
  std::memcpy(&f, &v, 4);
  return f;
}

void float_to_be(float f, uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, &f, 4);
  v = htonl(v);
  std::memcpy(p, &v, 4);
}

}  // namespace

extern "C" {

// Parse one request packet. scalars_out = {vel, pos_x, qw, qx, qy, qz}.
// Returns 0 on success, -1 on short packet.
int doa_unpack_frame(const uint8_t* packet, size_t len, uint8_t* image_out,
                     float* scalars_out) {
  if (len < kRequestSize) return -1;
  std::memcpy(image_out, packet, kImageSize);
  const uint8_t* p = packet + kImageSize;
  scalars_out[0] = be_to_float(p + 0);   // desired velocity
  scalars_out[1] = be_to_float(p + 4);   // position x
  for (int i = 0; i < 4; ++i) scalars_out[2 + i] = be_to_float(p + 8 + 4 * i);
  return 0;
}

// Pack the 3-float velocity command reply (host byte order, matching the
// reference's htonf_noswap).
void doa_pack_reply(const float* cmd3, uint8_t* out12) {
  std::memcpy(out12, cmd3, kReplySize);
}

// Pack a request packet (used by test/sim clients).
void doa_pack_frame(const uint8_t* image5400, float vel, float pos_x,
                    const float* quat4, uint8_t* out5424) {
  std::memcpy(out5424, image5400, kImageSize);
  uint8_t* p = out5424 + kImageSize;
  float_to_be(vel, p + 0);
  float_to_be(pos_x, p + 4);
  for (int i = 0; i < 4; ++i) float_to_be(quat4[i], p + 8 + 4 * i);
}

// Parse a reply (host byte order).
void doa_unpack_reply(const uint8_t* in12, float* cmd3_out) {
  std::memcpy(cmd3_out, in12, kReplySize);
}

// Per-frame handler: fill reply[12]; return 0 to reply, nonzero to drop.
typedef int (*doa_frame_cb)(const uint8_t* packet, size_t len, uint8_t* reply,
                            void* user);

// Blocking UDP serve loop on 0.0.0.0:port. Checks *stop_flag between
// packets (100 ms socket timeout). Returns frames served, or -errno.
long doa_udp_serve(uint16_t port, doa_frame_cb cb, void* user,
                   volatile int* stop_flag) {
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -errno;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  struct timeval tv = {0, 100 * 1000};
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));

  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = INADDR_ANY;
  addr.sin_port = htons(port);
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    long err = -errno;
    close(fd);
    return err;
  }

  uint8_t buf[kRequestSize + 64];
  uint8_t reply[kReplySize];
  long frames = 0;
  while (!(stop_flag && *stop_flag)) {
    sockaddr_in peer{};
    socklen_t peer_len = sizeof(peer);
    ssize_t n = recvfrom(fd, buf, sizeof(buf), 0,
                         reinterpret_cast<sockaddr*>(&peer), &peer_len);
    if (n < 0) {
      if (errno == EAGAIN || errno == EWOULDBLOCK || errno == EINTR) continue;
      close(fd);
      return -errno;
    }
    if (cb(buf, static_cast<size_t>(n), reply, user) == 0) {
      sendto(fd, reply, kReplySize, 0, reinterpret_cast<sockaddr*>(&peer),
             peer_len);
      ++frames;
    }
  }
  close(fd);
  return frames;
}

// ---- Fleet serve loop (multi-drone batching) ----
//
// Batch handler: n valid requests, each kRequestSize bytes, concatenated
// in `packets`; `peers[i]` is an opaque stable client key (ipv4<<16 |
// port). The handler fills replies (n x 12 bytes) and send_ok (n flags,
// nonzero = send reply i). Return 0 to send flagged replies, nonzero to
// drop the whole tick (the loop keeps serving either way).
typedef int (*doa_batch_cb)(const uint8_t* packets, const uint64_t* peers,
                            int n, uint8_t* replies, uint8_t* send_ok,
                            void* user);

// Blocking UDP fleet loop on 0.0.0.0:port (port 0 = ephemeral; the bound
// port is written to *bound_port_out when non-null). Gathers up to
// `capacity` distinct peers per tick: blocks for the first packet (100 ms
// stop-flag poll), then drains for `window_us` microseconds using the
// remaining-time socket timeout (no busy spin — this host has one core).
// Duplicate packets from one peer within a tick keep the LAST frame.
// Returns frames served, or -errno.
long doa_udp_serve_fleet(uint16_t port, int capacity, int window_us,
                         doa_batch_cb cb, void* user,
                         volatile int* stop_flag, int* bound_port_out) {
  if (capacity < 1 || capacity > 4096) return -EINVAL;
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -errno;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));

  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = INADDR_ANY;
  addr.sin_port = htons(port);
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    long err = -errno;
    close(fd);
    return err;
  }
  if (bound_port_out) {
    sockaddr_in bound{};
    socklen_t blen = sizeof(bound);
    getsockname(fd, reinterpret_cast<sockaddr*>(&bound), &blen);
    *bound_port_out = ntohs(bound.sin_port);
  }

  auto set_timeout_us = [&](long us) {
    struct timeval tv = {us / 1000000, static_cast<suseconds_t>(us % 1000000)};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  };

  uint8_t* packets = new uint8_t[static_cast<size_t>(capacity) * kRequestSize];
  uint64_t* peer_keys = new uint64_t[capacity];
  sockaddr_in* peer_addrs = new sockaddr_in[capacity];
  uint8_t* replies = new uint8_t[static_cast<size_t>(capacity) * kReplySize];
  uint8_t* send_ok = new uint8_t[capacity];
  uint8_t buf[kRequestSize + 64];
  long frames = 0;
  long err = 0;

  while (!(stop_flag && *stop_flag)) {
    set_timeout_us(100 * 1000);
    sockaddr_in peer{};
    socklen_t peer_len = sizeof(peer);
    ssize_t m = recvfrom(fd, buf, sizeof(buf), 0,
                         reinterpret_cast<sockaddr*>(&peer), &peer_len);
    if (m < 0) {
      if (errno == EAGAIN || errno == EWOULDBLOCK || errno == EINTR) continue;
      err = -errno;  // hard socket error: report it (contract: -errno)
      break;
    }
    int n = 0;
    auto add = [&](const uint8_t* pkt, ssize_t len, const sockaddr_in& from) {
      if (len < static_cast<ssize_t>(kRequestSize)) return;  // short: drop
      uint64_t key = (static_cast<uint64_t>(ntohl(from.sin_addr.s_addr)) << 16)
                     | ntohs(from.sin_port);
      for (int i = 0; i < n; ++i) {
        if (peer_keys[i] == key) {  // same peer again: keep the LAST frame
          std::memcpy(packets + static_cast<size_t>(i) * kRequestSize, pkt,
                      kRequestSize);
          return;
        }
      }
      if (n >= capacity) return;  // strangers beyond capacity: drop here
      peer_keys[n] = key;
      peer_addrs[n] = from;
      std::memcpy(packets + static_cast<size_t>(n) * kRequestSize, pkt,
                  kRequestSize);
      ++n;
    };
    add(buf, m, peer);

    // Drain window: remaining-time timeouts, no spin.
    struct timeval t0;
    gettimeofday(&t0, nullptr);
    while (n < capacity) {
      struct timeval now;
      gettimeofday(&now, nullptr);
      long elapsed = (now.tv_sec - t0.tv_sec) * 1000000L
                     + (now.tv_usec - t0.tv_usec);
      long remain = window_us - elapsed;
      if (remain <= 0) break;
      set_timeout_us(remain);
      peer_len = sizeof(peer);
      m = recvfrom(fd, buf, sizeof(buf), 0,
                   reinterpret_cast<sockaddr*>(&peer), &peer_len);
      if (m < 0) {
        if (errno == EINTR) continue;
        if (errno != EAGAIN && errno != EWOULDBLOCK) err = -errno;
        break;  // window expired (EAGAIN) or hard error (recorded)
      }
      add(buf, m, peer);
    }
    if (err) break;
    if (n == 0) continue;
    std::memset(send_ok, 0, capacity);
    if (cb(packets, peer_keys, n, replies, send_ok, user) == 0) {
      for (int i = 0; i < n; ++i) {
        if (!send_ok[i]) continue;
        sendto(fd, replies + static_cast<size_t>(i) * kReplySize, kReplySize,
               0, reinterpret_cast<sockaddr*>(&peer_addrs[i]),
               sizeof(peer_addrs[i]));
        ++frames;
      }
    }
  }
  delete[] packets;
  delete[] peer_keys;
  delete[] peer_addrs;
  delete[] replies;
  delete[] send_ok;
  close(fd);
  return err ? err : frames;
}

}  // extern "C"
