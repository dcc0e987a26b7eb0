/* Real-time C++ client for the TPU NMPC serving engine.
 *
 * Native counterpart of the reference's node-side solver boundary: where
 * the reference C++ node calls the generated acados_solve() in-process
 * (reference catkin_ws/src/nmpc_ca/src/nmpc_guidance_ca1.cpp:577), a
 * TPU deployment calls nmpc_rt_solve() against the serving engine
 * (mpc_collisionavoidance_tpu/rt/server.py) over a Unix-domain socket.
 * Frame layout mirrors rt/protocol.py byte-for-byte (little-endian).
 *
 * Usage:
 *   nmpc_rt_client* c = nmpc_rt_connect("/tmp/nmpc_rt.sock", 50);
 *   nmpc_rt_request  req  = {...};
 *   nmpc_rt_response resp;
 *   int rc = nmpc_rt_solve(c, &req, &resp);   // 0 ok, <0 error/timeout
 *   nmpc_rt_close(c);
 *
 * The C ABI keeps the library loadable from any stack (C++, ctypes, Rust
 * FFI) without name mangling.
 */
#ifndef NMPC_RT_CLIENT_H_
#define NMPC_RT_CLIENT_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define NMPC_RT_NX 8
#define NMPC_RT_NP 16
#define NMPC_RT_NH 8
#define NMPC_RT_REQ_MAGIC 0x4E4D5043u  /* "NMPC" */
#define NMPC_RT_RESP_MAGIC 0x4E4D5052u /* "NMPR" */

#pragma pack(push, 1)
typedef struct {
  uint32_t magic; /* NMPC_RT_REQ_MAGIC */
  uint32_t seq;
  float x0[NMPC_RT_NX];
  float p_obs[NMPC_RT_NP];
  float r_obs[NMPC_RT_NH];
} nmpc_rt_request;

typedef struct {
  uint32_t magic; /* NMPC_RT_RESP_MAGIC */
  uint32_t seq;
  uint32_t status; /* 0 ok / 1 qp not converged / 2 numerical failure /
                      3 fleet over capacity (lane engine: retry after a
                      vehicle disconnects; command fields are zeros) */
  float u0;
  float x1[NMPC_RT_NX];
} nmpc_rt_response;
#pragma pack(pop)

typedef struct nmpc_rt_client nmpc_rt_client;

/* Connect to the serving engine. timeout_ms bounds each solve round trip
 * (the 20 Hz real-time budget is 50 ms). Returns NULL on failure. */
nmpc_rt_client* nmpc_rt_connect(const char* socket_path, int timeout_ms);

/* One blocking solve tick. Fills *resp. Returns 0 on success,
 * -1 socket error, -2 timeout, -3 protocol error (bad magic or stale
 * seq). On timeout the connection is left in an indeterminate framing
 * state; callers should reconnect, mirroring how the reference keeps the
 * STALE previous command on solver failure rather than acting on partial
 * results (reference nmpc_guidance_ca1.cpp:577-580). */
int nmpc_rt_solve(nmpc_rt_client* c, const nmpc_rt_request* req,
                  nmpc_rt_response* resp);

void nmpc_rt_close(nmpc_rt_client* c);

#ifdef __cplusplus
}
#endif

#endif /* NMPC_RT_CLIENT_H_ */
