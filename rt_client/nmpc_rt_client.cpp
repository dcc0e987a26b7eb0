/* Implementation of the real-time client (see nmpc_rt_client.h). */
#include "nmpc_rt_client.h"

#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <cerrno>
#include <cstdio>
#include <cstdlib>

static_assert(sizeof(nmpc_rt_request) == 136, "request frame layout drift");
static_assert(sizeof(nmpc_rt_response) == 48, "response frame layout drift");

struct nmpc_rt_client {
  int fd;
  int timeout_ms;
};

/* "host:port" (port all digits) or "tcp://host:port" -> TCP, anything
 * else -> UDS path.  A spec containing '/' is always a filesystem path
 * (a legit UDS path like /tmp/nmpc:1 must not be misrouted to
 * getaddrinfo) unless it uses the explicit tcp:// scheme; the Python
 * server's parse_tcp applies the same rule.  The TCP transport is the
 * cross-machine deployment boundary (the reference's nodes speak
 * networked ROS TCPROS, src/nmpc_guidance_ca1.cpp:172-184); frames are
 * identical on both transports. */
static int addr_is_tcp(const char* spec, char* host, size_t host_cap,
                       char* port, size_t port_cap) {
  if (strncmp(spec, "tcp://", 6) == 0)
    spec += 6;
  else if (strchr(spec, '/'))
    return 0;
  const char* colon = strrchr(spec, ':');
  if (!colon || colon == spec || colon[1] == '\0') return 0;
  for (const char* p = colon + 1; *p; ++p)
    if (*p < '0' || *p > '9') return 0;
  size_t hlen = static_cast<size_t>(colon - spec);
  if (hlen >= host_cap || strlen(colon + 1) >= port_cap) return 0;
  memcpy(host, spec, hlen);
  host[hlen] = '\0';
  snprintf(port, port_cap, "%s", colon + 1);
  return 1;
}

static int connect_tcp(const char* host, const char* port) {
  addrinfo hints;
  memset(&hints, 0, sizeof(hints));
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo* res = nullptr;
  if (getaddrinfo(host, port, &hints, &res) != 0) return -1;
  int fd = -1;
  for (addrinfo* ai = res; ai; ai = ai->ai_next) {
    fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd >= 0) {
    /* 20 Hz request/reply frames are tiny: Nagle coalescing would add
     * ~40 ms per tick, blowing the real-time budget */
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  }
  return fd;
}

extern "C" nmpc_rt_client* nmpc_rt_connect(const char* socket_path,
                                           int timeout_ms) {
  int fd = -1;
  char host[256], port[16];
  if (addr_is_tcp(socket_path, host, sizeof(host), port, sizeof(port))) {
    fd = connect_tcp(host, port);
    if (fd < 0) return nullptr;
  } else {
    fd = socket(AF_UNIX, SOCK_STREAM, 0);
    if (fd < 0) return nullptr;
    sockaddr_un addr;
    memset(&addr, 0, sizeof(addr));
    addr.sun_family = AF_UNIX;
    strncpy(addr.sun_path, socket_path, sizeof(addr.sun_path) - 1);
    if (connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
      close(fd);
      return nullptr;
    }
  }
  nmpc_rt_client* c =
      static_cast<nmpc_rt_client*>(malloc(sizeof(nmpc_rt_client)));
  c->fd = fd;
  c->timeout_ms = timeout_ms;
  return c;
}

/* Blocking read/write of exactly n bytes with the client's deadline. */
static int io_exact(int fd, void* buf, size_t n, int timeout_ms, bool write_op) {
  char* p = static_cast<char*>(buf);
  size_t done = 0;
  while (done < n) {
    pollfd pfd{fd, static_cast<short>(write_op ? POLLOUT : POLLIN), 0};
    int pr = poll(&pfd, 1, timeout_ms);
    if (pr == 0) return -2; /* timeout */
    if (pr < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    ssize_t k = write_op ? write(fd, p + done, n - done)
                         : read(fd, p + done, n - done);
    if (k <= 0) {
      if (k < 0 && errno == EINTR) continue;
      return -1;
    }
    done += static_cast<size_t>(k);
  }
  return 0;
}

extern "C" int nmpc_rt_solve(nmpc_rt_client* c, const nmpc_rt_request* req,
                             nmpc_rt_response* resp) {
  nmpc_rt_request framed = *req;
  framed.magic = NMPC_RT_REQ_MAGIC;
  int rc = io_exact(c->fd, &framed, sizeof(framed), c->timeout_ms, true);
  if (rc != 0) return rc;
  rc = io_exact(c->fd, resp, sizeof(*resp), c->timeout_ms, false);
  if (rc != 0) return rc;
  if (resp->magic != NMPC_RT_RESP_MAGIC || resp->seq != req->seq) return -3;
  return 0;
}

extern "C" void nmpc_rt_close(nmpc_rt_client* c) {
  if (!c) return;
  close(c->fd);
  free(c);
}

/* ---------------- protocol v2 (variant-generic frames) ---------------- */

#pragma pack(push, 1)
typedef struct {
  uint32_t magic; /* NMPC_RT_REQ2_MAGIC */
  uint32_t seq;
  uint16_t model_id;
  uint16_t nx, np, nh, ny;
  uint16_t reserved;
} nmpc_rt_req2_hdr;

typedef struct {
  uint32_t magic; /* NMPC_RT_RESP2_MAGIC */
  uint32_t seq;
  uint32_t status;
  uint16_t nu, nx;
} nmpc_rt_resp2_hdr;
#pragma pack(pop)

static_assert(sizeof(nmpc_rt_req2_hdr) == 20, "v2 request header drift");
static_assert(sizeof(nmpc_rt_resp2_hdr) == 16, "v2 response header drift");

extern "C" int nmpc_rt_solve2(nmpc_rt_client* c, uint16_t model_id,
                              uint32_t seq, const float* x0, uint16_t nx,
                              const float* p, uint16_t np, const float* lh,
                              uint16_t nh, const float* yref, uint16_t ny,
                              float* u0, uint16_t nu_cap, float* x1,
                              uint32_t* status, uint16_t* out_nu) {
  nmpc_rt_req2_hdr hdr;
  hdr.magic = NMPC_RT_REQ2_MAGIC;
  hdr.seq = seq;
  hdr.model_id = model_id;
  hdr.nx = nx;
  hdr.np = np;
  hdr.nh = nh;
  hdr.ny = ny;
  hdr.reserved = 0;
  int rc = io_exact(c->fd, &hdr, sizeof(hdr), c->timeout_ms, true);
  if (rc != 0) return rc;
  const struct {
    const float* ptr;
    uint16_t n;
  } blocks[] = {{x0, nx}, {p, np}, {lh, nh}, {yref, ny}};
  for (const auto& b : blocks) {
    if (b.n == 0) continue;
    rc = io_exact(c->fd, const_cast<float*>(b.ptr),
                  sizeof(float) * b.n, c->timeout_ms, true);
    if (rc != 0) return rc;
  }

  nmpc_rt_resp2_hdr rh;
  rc = io_exact(c->fd, &rh, sizeof(rh), c->timeout_ms, false);
  if (rc != 0) return rc;
  if (rh.magic != NMPC_RT_RESP2_MAGIC || rh.seq != seq) return -3;
  if (rh.nu > nu_cap || rh.nx != nx) {
    /* dims don't fit the caller's buffers (usually a BAD_REQUEST reply
     * carrying the server's own dims): surface the status, drain the
     * payload to keep framing intact, and report -4 */
    *status = rh.status;
    *out_nu = 0;
    float scratch;
    for (uint32_t i = 0; i < static_cast<uint32_t>(rh.nu) + rh.nx; ++i) {
      if (io_exact(c->fd, &scratch, sizeof(scratch), c->timeout_ms,
                   false) != 0)
        return -1;
    }
    return -4;
  }
  rc = io_exact(c->fd, u0, sizeof(float) * rh.nu, c->timeout_ms, false);
  if (rc != 0) return rc;
  rc = io_exact(c->fd, x1, sizeof(float) * rh.nx, c->timeout_ms, false);
  if (rc != 0) return rc;
  *status = rh.status;
  *out_nu = rh.nu;
  return 0;
}
