// UART protocol core for embedded (SoC) controllers.
//
// C++ implementation of the PC side of the framed serial protocol the
// reference drives from Python (/root/reference/Controllers/
// controller_embedded.py:101-346): SOF 0xAA frames, message types
// STATE=0x01 / GET_SPEC=0x02 / PING=0x03 / SPEC_COOKIE=0x04, CRC-8 with
// reflected polynomial 0x8C, GET_SPEC handshake returning
// [version, n_inputs, n_outputs, token_len] + fixed 24-byte ASCII name
// tokens, raw little-endian float32 controller outputs.
//
// Exposed as a C ABI for ctypes binding.  Works over a real termios serial
// device or any file descriptor (pty fakes in tests).

#include <algorithm>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <poll.h>
#include <termios.h>
#include <time.h>
#include <unistd.h>

namespace {

constexpr uint8_t SERIAL_SOF = 0xAA;
constexpr uint8_t MSG_TYPE_STATE = 0x01;
constexpr uint8_t MSG_TYPE_GET_SPEC = 0x02;
constexpr uint8_t MSG_TYPE_PING = 0x03;
constexpr uint8_t MSG_TYPE_SPEC_COOKIE = 0x04;
constexpr int NAME_TOKEN_LEN = 24;

uint8_t crc8(const uint8_t* msg, int len) {
  // Dallas/Maxim CRC-8, reflected polynomial 0x8C (bitwise, LSB-first).
  uint8_t crc = 0x00;
  for (int i = 0; i < len; ++i) {
    uint8_t val = msg[i];
    for (int b = 0; b < 8; ++b) {
      uint8_t mix = (crc ^ val) & 0x01;
      crc >>= 1;
      if (mix) crc ^= 0x8C;
      val >>= 1;
    }
  }
  return crc;
}

struct Uart {
  int fd = -1;
  bool owns_fd = true;
  // Pending spec adopted after a SPEC_COOKIE announcement.
  bool has_pending_spec = false;
  int pending_version = 0;
  int pending_n_outputs = 0;
  std::string pending_names;  // comma separated
  // Bytes read past a matched frame by the resync scanner — consumed by
  // subsequent reads before touching the fd (a pipelined reply must not
  // be lost when the scanner over-reads).
  std::vector<uint8_t> backlog;
};

speed_t baud_to_speed(int baud) {
  switch (baud) {
    case 9600: return B9600;
    case 19200: return B19200;
    case 38400: return B38400;
    case 57600: return B57600;
    case 115200: return B115200;
    case 230400: return B230400;
#ifdef B460800
    case 460800: return B460800;
#endif
#ifdef B921600
    case 921600: return B921600;
#endif
    default: return B115200;
  }
}

// Read exactly n bytes with a millisecond deadline; returns bytes read.
// Backlog bytes (over-read by the frame scanner) are consumed first.
int read_exact(Uart* u, uint8_t* buf, int n, int timeout_ms) {
  int got = 0;
  if (!u->backlog.empty()) {
    int take = std::min<int>(n, static_cast<int>(u->backlog.size()));
    memcpy(buf, u->backlog.data(), take);
    u->backlog.erase(u->backlog.begin(), u->backlog.begin() + take);
    got = take;
  }
  while (got < n) {
    struct pollfd pfd = {u->fd, POLLIN, 0};
    int pr = poll(&pfd, 1, timeout_ms);
    if (pr <= 0) break;  // timeout or error
    ssize_t r = read(u->fd, buf + got, n - got);
    if (r <= 0) {
      if (r < 0 && (errno == EAGAIN || errno == EINTR)) continue;
      break;
    }
    got += static_cast<int>(r);
  }
  return got;
}

int write_all(Uart* u, const uint8_t* buf, int n) {
  int sent = 0;
  while (sent < n) {
    ssize_t w = write(u->fd, buf + sent, n - sent);
    if (w <= 0) {
      if (w < 0 && (errno == EAGAIN || errno == EINTR)) continue;
      return -1;
    }
    sent += static_cast<int>(w);
  }
  return sent;
}

int64_t now_ms() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return static_cast<int64_t>(ts.tv_sec) * 1000 + ts.tv_nsec / 1000000;
}

// Sliding-window framed-reply scanner — the reference's _receive_reply
// resync loop (controller_embedded.py:289-333): accumulate bytes, search
// for SOF, check the declared packet length, verify CRC-8, and DROP ONE
// BYTE on any mismatch.  This is what makes the protocol survive a noisy
// line: garbage preambles, truncated frames, and corrupted CRCs are
// skipped until a valid frame of the expected type aligns.
bool receive_frame(Uart* u, uint8_t expected_type, int cmd_len,
                   int timeout_ms, uint8_t* frame_out) {
  // Start from any bytes a previous scan over-read.
  std::vector<uint8_t> buf;
  buf.swap(u->backlog);
  const int64_t deadline = now_ms() + timeout_ms;
  while (true) {
    // Scan whatever is buffered for an aligned valid frame.
    while (static_cast<int>(buf.size()) >= cmd_len) {
      if (buf[0] != SERIAL_SOF || buf[2] != cmd_len ||
          buf[cmd_len - 1] != crc8(buf.data(), cmd_len - 1) ||
          buf[1] != expected_type) {
        buf.erase(buf.begin());
        continue;
      }
      memcpy(frame_out, buf.data(), cmd_len);
      // Preserve the tail — it may be the head of a pipelined reply.
      u->backlog.assign(buf.begin() + cmd_len, buf.end());
      return true;
    }
    const int64_t remaining = deadline - now_ms();
    if (remaining <= 0) break;
    struct pollfd pfd = {u->fd, POLLIN, 0};
    if (poll(&pfd, 1, static_cast<int>(remaining)) <= 0) break;
    uint8_t tmp[256];
    ssize_t r = read(u->fd, tmp, sizeof(tmp));
    if (r <= 0) {
      if (r < 0 && (errno == EAGAIN || errno == EINTR)) continue;
      break;
    }
    buf.insert(buf.end(), tmp, tmp + r);
  }
  // Timed out: keep what we saw (a partial frame may complete later).
  u->backlog = std::move(buf);
  return false;
}

void drain_input(Uart* u) {
  u->backlog.clear();
  uint8_t tmp[256];
  while (true) {
    struct pollfd pfd = {u->fd, POLLIN, 0};
    if (poll(&pfd, 1, 0) <= 0) break;
    if (read(u->fd, tmp, sizeof(tmp)) <= 0) break;
  }
}

// Fetch a spec payload (assumes the 4-byte header is next on the wire).
bool read_spec_payload(Uart* u, int timeout_ms, int* version,
                       std::string* names, int* n_outputs) {
  uint8_t hdr[4];
  if (read_exact(u, hdr, 4, timeout_ms) != 4) return false;
  int ver = hdr[0], n_in = hdr[1], n_out = hdr[2], token_len = hdr[3];
  if (token_len != NAME_TOKEN_LEN || n_in <= 0 || n_out <= 0) return false;
  std::vector<uint8_t> raw(static_cast<size_t>(n_in) * token_len);
  if (read_exact(u, raw.data(), static_cast<int>(raw.size()), timeout_ms) !=
      static_cast<int>(raw.size()))
    return false;
  std::string joined;
  for (int i = 0; i < n_in; ++i) {
    const char* tok = reinterpret_cast<const char*>(raw.data()) + i * token_len;
    size_t len = strnlen(tok, token_len);
    if (i) joined.push_back(',');
    joined.append(tok, len);
  }
  *version = ver;
  *names = joined;
  *n_outputs = n_out;
  return true;
}

}  // namespace

extern "C" {

unsigned char ctt_uart_crc8(const unsigned char* msg, int len) {
  return crc8(msg, len);
}

void* ctt_uart_open(const char* port, int baud) {
  int fd = open(port, O_RDWR | O_NOCTTY | O_NONBLOCK);
  if (fd < 0) return nullptr;
  struct termios tio;
  if (tcgetattr(fd, &tio) == 0) {
    cfmakeraw(&tio);
    cfsetispeed(&tio, baud_to_speed(baud));
    cfsetospeed(&tio, baud_to_speed(baud));
    tio.c_cc[VMIN] = 0;
    tio.c_cc[VTIME] = 0;
    tcsetattr(fd, TCSANOW, &tio);
    tcflush(fd, TCIOFLUSH);
  }
  auto* u = new Uart();
  u->fd = fd;
  u->owns_fd = true;
  return u;
}

void* ctt_uart_from_fd(int fd) {
  auto* u = new Uart();
  u->fd = fd;
  u->owns_fd = false;
  return u;
}

void ctt_uart_close(void* h) {
  auto* u = static_cast<Uart*>(h);
  if (!u) return;
  if (u->owns_fd && u->fd >= 0) close(u->fd);
  delete u;
}

// Returns 1 on pong, 0 on timeout.  Resyncs through line noise: garbage
// preambles, wrong-length frames and CRC-corrupted pongs are skipped by
// the sliding-window scanner (reference _receive_reply semantics).
int ctt_uart_ping(void* h, int timeout_ms) {
  auto* u = static_cast<Uart*>(h);
  uint8_t msg[4] = {SERIAL_SOF, MSG_TYPE_PING, 4, 0};
  msg[3] = crc8(msg, 3);
  if (write_all(u, msg, 4) != 4) return 0;
  uint8_t resp[4];
  return receive_frame(u, MSG_TYPE_PING, 4, timeout_ms, resp) ? 1 : 0;
}

// GET_SPEC handshake with retries.  names_buf receives a comma-separated
// list.  Returns 1 on success, 0 on failure (caller applies its fallback).
int ctt_uart_get_spec(void* h, int* version, char* names_buf, int names_cap,
                      int* n_inputs, int* n_outputs, int timeout_ms,
                      int max_retries) {
  auto* u = static_cast<Uart*>(h);
  for (int attempt = 0; attempt < max_retries; ++attempt) {
    drain_input(u);
    uint8_t msg[4] = {SERIAL_SOF, MSG_TYPE_GET_SPEC, 4, 0};
    msg[3] = crc8(msg, 3);
    if (write_all(u, msg, 4) != 4) continue;

    int ver = 0, n_out = 0;
    std::string names;
    if (!read_spec_payload(u, timeout_ms, &ver, &names, &n_out)) continue;

    int n_in = 1;
    for (char c : names) n_in += (c == ',');
    if (static_cast<int>(names.size()) + 1 > names_cap) return 0;
    memcpy(names_buf, names.c_str(), names.size() + 1);
    *version = ver;
    *n_inputs = n_in;
    *n_outputs = n_out;
    return 1;
  }
  return 0;
}

// Frame and send the state vector (MSG_TYPE_STATE).
int ctt_uart_send_state(void* h, const float* data, int n) {
  auto* u = static_cast<Uart*>(h);
  int data_bytes = n * 4;
  int msg_length = 4 + data_bytes;  // SOF + type + len + data + CRC
  std::vector<uint8_t> msg;
  msg.reserve(msg_length);
  msg.push_back(SERIAL_SOF);
  msg.push_back(MSG_TYPE_STATE);
  msg.push_back(static_cast<uint8_t>(msg_length));
  const uint8_t* p = reinterpret_cast<const uint8_t*>(data);
  msg.insert(msg.end(), p, p + data_bytes);
  msg.push_back(crc8(msg.data(), static_cast<int>(msg.size())));
  return write_all(u, msg.data(), static_cast<int>(msg.size())) ==
                 static_cast<int>(msg.size())
             ? 1
             : 0;
}

// Read n_outputs raw little-endian float32 values.  A SPEC_COOKIE frame
// [SOF, 0x04, 4, CRC] arriving first is consumed: a fresh GET_SPEC is
// performed and stashed as the pending spec (adopted by the controller at
// the next step — reference controller_embedded.py:89-94).
// Returns 1 on success, 0 on timeout/short read.
int ctt_uart_receive_outputs(void* h, float* out, int n_outputs,
                             int timeout_ms) {
  auto* u = static_cast<Uart*>(h);
  uint8_t first;
  if (read_exact(u, &first, 1, timeout_ms) != 1) return 0;

  if (first == SERIAL_SOF) {
    // Peek: possible SPEC_COOKIE control frame before the data.
    uint8_t rest[3];
    if (read_exact(u, rest, 3, timeout_ms) != 3) return 0;
    uint8_t frame[4] = {first, rest[0], rest[1], rest[2]};
    if (rest[0] == MSG_TYPE_SPEC_COOKIE && rest[1] == 4 &&
        rest[2] == crc8(frame, 3)) {
      int ver = 0, n_out = 0;
      std::string names;
      // Cookie announces a spec change: the chip sends the spec payload next.
      if (read_spec_payload(u, timeout_ms, &ver, &names, &n_out)) {
        u->has_pending_spec = true;
        u->pending_version = ver;
        u->pending_n_outputs = n_out;
        u->pending_names = names;
      }
      // Outputs follow the cookie exchange.
      uint8_t* ob = reinterpret_cast<uint8_t*>(out);
      return read_exact(u, ob, n_outputs * 4, timeout_ms) == n_outputs * 4 ? 1 : 0;
    }
    // Not a cookie: those 4 bytes were the head of the raw float data.
    uint8_t* ob = reinterpret_cast<uint8_t*>(out);
    memcpy(ob, frame, 4);
    int remaining = n_outputs * 4 - 4;
    if (remaining < 0) return 0;
    return read_exact(u, ob + 4, remaining, timeout_ms) == remaining ? 1 : 0;
  }

  uint8_t* ob = reinterpret_cast<uint8_t*>(out);
  ob[0] = first;
  int remaining = n_outputs * 4 - 1;
  return read_exact(u, ob + 1, remaining, timeout_ms) == remaining ? 1 : 0;
}

// Pending-spec accessors (cookie-triggered respec).
int ctt_uart_has_pending_spec(void* h) {
  return static_cast<Uart*>(h)->has_pending_spec ? 1 : 0;
}

int ctt_uart_take_pending_spec(void* h, int* version, char* names_buf,
                               int names_cap, int* n_inputs, int* n_outputs) {
  auto* u = static_cast<Uart*>(h);
  if (!u->has_pending_spec) return 0;
  if (static_cast<int>(u->pending_names.size()) + 1 > names_cap) return 0;
  memcpy(names_buf, u->pending_names.c_str(), u->pending_names.size() + 1);
  int n_in = 1;
  for (char c : u->pending_names) n_in += (c == ',');
  *version = u->pending_version;
  *n_inputs = n_in;
  *n_outputs = u->pending_n_outputs;
  u->has_pending_spec = false;
  return 1;
}

void ctt_uart_drain(void* h) { drain_input(static_cast<Uart*>(h)); }

}  // extern "C"
