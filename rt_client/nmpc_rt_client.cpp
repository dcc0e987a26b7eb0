/* Implementation of the real-time client (see nmpc_rt_client.h). */
#include "nmpc_rt_client.h"

#include <poll.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <cerrno>
#include <cstdlib>

static_assert(sizeof(nmpc_rt_request) == 136, "request frame layout drift");
static_assert(sizeof(nmpc_rt_response) == 48, "response frame layout drift");

struct nmpc_rt_client {
  int fd;
  int timeout_ms;
};

extern "C" nmpc_rt_client* nmpc_rt_connect(const char* socket_path,
                                           int timeout_ms) {
  int fd = socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd < 0) return nullptr;

  sockaddr_un addr;
  memset(&addr, 0, sizeof(addr));
  addr.sun_family = AF_UNIX;
  strncpy(addr.sun_path, socket_path, sizeof(addr.sun_path) - 1);
  if (connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    close(fd);
    return nullptr;
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
