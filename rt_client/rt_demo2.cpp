/* Closed-loop demo for protocol v2: the LOW-LEVEL thrust node served
 * generically.
 *
 * Plays the role of the reference's inner-loop node main
 * (catkin_ws/src/nmpc_ca/src/nmpc_low_level.cpp:206-296): an 8-state
 * speed+heading NMPC driven by per-tick references yref =
 * (0, sin psi_d, cos psi_d, u_d, 0...) — exactly the vector the node
 * packs at src/nmpc_low_level.cpp:206-248 — with nu = 2 thrust-rate
 * commands coming back. Exercises the variant-generic v2 frames
 * (runtime dims + wire yref) against `rt.server --model usv_low_level`.
 *
 * Usage: rt_demo2 <socket_path> [n_ticks]
 * Exit 0 iff every solve returned and psi -> psi_d, u -> u_d.
 */
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>

#include "nmpc_rt_client.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <socket_path> [n_ticks]\n", argv[0]);
    return 2;
  }
  const char* path = argv[1];
  int n_ticks = argc > 2 ? atoi(argv[2]) : 200;

  nmpc_rt_client* c = nmpc_rt_connect(path, /*timeout_ms=*/5000);
  if (!c) {
    fprintf(stderr, "connect(%s) failed\n", path);
    return 2;
  }

  /* usv_low_level: x = (psi, sin psi, cos psi, u, v, r, Tport, Tstbd);
   * step references psi_d = 1.0 rad, u_d = 0.8 m/s (reference
   * scripts/usv_low_level/main.py:78-81). */
  const uint16_t NX = 8, NU = 2, NY = 10;
  const float psi_d = 1.0f, u_d = 0.8f;
  float x0[NX] = {0.f, 0.f, 1.f, 0.001f, 0.f, 0.f, 0.f, 0.f};
  float yref[NY] = {0.f, sinf(psi_d), cosf(psi_d), u_d,
                    0.f, 0.f, 0.f, 0.f, 0.f, 0.f};
  float u0[NU] = {0.f, 0.f};
  float x1[NX];
  uint32_t status = 0;
  uint16_t out_nu = 0;
  double worst_us = 0;

  for (int t = 0; t < n_ticks; t++) {
    auto t0 = std::chrono::steady_clock::now();
    int rc = nmpc_rt_solve2(c, NMPC_RT_MODEL_LOW_LEVEL,
                            static_cast<uint32_t>(t), x0, NX, nullptr, 0,
                            nullptr, 0, yref, NY, u0, NU, x1, &status,
                            &out_nu);
    auto us = std::chrono::duration<double, std::micro>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    if (rc != 0 || status == NMPC_RT_STATUS_BAD_REQUEST) {
      fprintf(stderr, "solve2 failed rc=%d status=%u at tick %d\n", rc,
              status, t);
      nmpc_rt_close(c);
      return 1;
    }
    if (out_nu != NU) {
      fprintf(stderr, "unexpected nu=%u\n", out_nu);
      nmpc_rt_close(c);
      return 1;
    }
    if (us > worst_us) worst_us = us;
    if (t % 40 == 0 || t == n_ticks - 1)
      printf("tick %d status %u dT (%.3f, %.3f) psi %.3f u %.3f "
             "latency_us %.0f\n",
             t, status, u0[0], u0[1], x1[0], x1[3], us);
    for (int i = 0; i < NX; i++) x0[i] = x1[i]; /* solver-as-plant */
  }
  printf("worst_latency_us %.0f final_psi %.4f final_u %.4f\n", worst_us,
         x1[0], x1[3]);
  nmpc_rt_close(c);
  return (std::fabs(x1[0] - psi_d) < 0.1 && std::fabs(x1[3] - u_d) < 0.1)
             ? 0
             : 1;
}
