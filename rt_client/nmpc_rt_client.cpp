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
