/* Closed-loop demo / smoke driver for the real-time client.
 *
 * Plays the role of the reference's 20 Hz node main loop (reference
 * catkin_ws/src/nmpc_ca/src/nmpc_guidance_ca1.cpp:606-640): packs the
 * flagship scenario's state + obstacle table each tick, calls the serving
 * engine, feeds the stage-1 prediction back as the next measurement
 * (reference scripts/usv_guidance_ca1/main.py:169-174 solver-as-plant
 * idiom), and prints a per-tick command line:
 *
 *   tick <i> status <s> u0 <rate> ye <m> latency_us <t>
 *
 * Usage: rt_demo <socket_path> [n_ticks]
 * Exit code 0 iff every solve returned and the final |ye| < 0.5.
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
  int n_ticks = argc > 2 ? atoi(argv[2]) : 100;

  nmpc_rt_client* c = nmpc_rt_connect(path, /*timeout_ms=*/2000);
  if (!c) {
    fprintf(stderr, "connect(%s) failed\n", path);
    return 2;
  }

  /* Flagship scenario (reference scripts/usv_guidance_ca1/main.py:73-113):
   * straight x = 4 path from (4,-5) north, start at the origin ->
   * ye = -(0-4)*sin(ak) + (0+5)*cos(ak) = +4, chie = psi - ak = -pi/2,
   * four r = 1.5 buoys on the path, remaining slots far-away sentinels. */
  nmpc_rt_request req{};
  req.seq = 0;
  const double ak = M_PI / 2.0;
  float x0[NMPC_RT_NX] = {0.7f, 0.0f, 4.0f, (float)(0.0 - ak),
                          (float)(0.0 - ak), 0.0f, 0.0f, 0.0f};
  for (int i = 0; i < NMPC_RT_NX; i++) req.x0[i] = x0[i];
  const float obsx[4] = {4.f, 4.f, 4.f, 4.f};
  const float obsy[4] = {4.f, 7.f, 12.f, 20.f};
  for (int i = 0; i < NMPC_RT_NP; i++) req.p_obs[i] = 100.f; /* sentinel */
  for (int i = 0; i < NMPC_RT_NH; i++) req.r_obs[i] = 0.f;
  for (int i = 0; i < 4; i++) {
    req.p_obs[2 * i] = obsx[i];
    req.p_obs[2 * i + 1] = obsy[i];
    req.r_obs[i] = 1.5f;
  }

  double worst_us = 0;
  nmpc_rt_response resp{};
  for (int t = 0; t < n_ticks; t++) {
    req.seq = static_cast<uint32_t>(t);
    auto t0 = std::chrono::steady_clock::now();
    int rc = nmpc_rt_solve(c, &req, &resp);
    auto us = std::chrono::duration<double, std::micro>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    if (rc != 0) {
      fprintf(stderr, "solve failed rc=%d at tick %d\n", rc, t);
      nmpc_rt_close(c);
      return 1;
    }
    if (us > worst_us) worst_us = us;
    if (t % 20 == 0 || t == n_ticks - 1)
      printf("tick %d status %u u0 %.4f ye %.3f latency_us %.0f\n", t,
             resp.status, resp.u0, resp.x1[2], us);
    /* solver-as-plant: next measurement = stage-1 prediction */
    for (int i = 0; i < NMPC_RT_NX; i++) req.x0[i] = resp.x1[i];
  }
  printf("worst_latency_us %.0f final_ye %.4f\n", worst_us, resp.x1[2]);
  nmpc_rt_close(c);
  return std::fabs(resp.x1[2]) < 0.5 ? 0 : 1;
}
