/* Implementation of the native flagship guidance node (see
 * nmpc_guidance_node.h).  Mirrors the JAX implementation in
 * mpc_collisionavoidance_tpu/guidance/{waypoints,obstacles,controller}.py
 * and, through it, the reference node
 * catkin_ws/src/nmpc_ca/src/nmpc_guidance_ca1.cpp. */
#include "nmpc_guidance_node.h"

#include <math.h>
#include <stdlib.h>
#include <string.h>

struct gn_node {
  /* mission (reference members k, past_psied, waypoint table) */
  float wp[GN_MAX_WP][2];
  int n_wp;
  int k;             /* current segment wp[k-1] -> wp[k] */
  float past_psied;  /* carried heading-error command memory (ref :593) */
  int active;

  /* obstacle slots (reference obstacles_list_ store, NED, inflated) */
  float p_obs[NMPC_RT_NP];
  float r_obs[NMPC_RT_NH];
  int collision;

  /* last frame + held commands (node goes silent when done, ref :487) */
  float ak, ye;
  float psi_d_hold, r_d_hold;
  uint32_t seq;
};

/* Wrap-once idiom as written in the reference C++ nodes (:497-501):
 * only correct for |a| < 3*pi, like the original. */
static float wrap_once(float a) {
  if (fabsf(a) > (float)M_PI)
    a = (a > 0 ? 1.0f : -1.0f) * (fabsf(a) - 2.0f * (float)M_PI);
  return a;
}

static float seg_angle(const float p1[2], const float p2[2]) {
  return atan2f(p2[1] - p1[1], p2[0] - p1[0]);
}

static void clear_obstacles(gn_node* n) {
  /* initializeObstacles (reference :365-376): far sentinel, zero radius */
  for (int i = 0; i < NMPC_RT_NP; i++) n->p_obs[i] = GN_SENTINEL;
  for (int i = 0; i < NMPC_RT_NH; i++) n->r_obs[i] = 0.0f;
  n->collision = 0;
}

extern "C" gn_node* gn_create(const float* waypoints_xy, int n_wp,
                              float psi) {
  gn_node* n = static_cast<gn_node*>(calloc(1, sizeof(gn_node)));
  if (!n) return nullptr;
  if (gn_set_waypoints(n, waypoints_xy, n_wp, psi) != 0) {
    free(n);
    return nullptr;
  }
  clear_obstacles(n);
  n->psi_d_hold = psi;
  n->r_d_hold = 0.0f;
  return n;
}

extern "C" void gn_destroy(gn_node* n) { free(n); }

extern "C" int gn_set_waypoints(gn_node* n, const float* waypoints_xy,
                                int n_wp, float psi) {
  if (!waypoints_xy || n_wp < 2 || n_wp > GN_MAX_WP) return -1;
  for (int i = 0; i < n_wp; i++) {
    n->wp[i][0] = waypoints_xy[2 * i];
    n->wp[i][1] = waypoints_xy[2 * i + 1];
  }
  n->n_wp = n_wp;
  /* mission seed (reference :616-632): k = 1, past_psied = wrap(psi-ak0) */
  n->k = 1;
  n->past_psied = wrap_once(psi - seg_angle(n->wp[0], n->wp[1]));
  n->active = 1;
  return 0;
}

extern "C" int gn_obstacles(gn_node* n, const float* body_xyr, int n_obs,
                            const gn_measurements* meas) {
  /* obstaclesCallback (reference :252-346): closest-first top-8 by
   * surface distance, radius inflation, body -> NED, sentinel fill. */
  clear_obstacles(n);
  if (n_obs <= 0) return 0;

  /* selection by surface distance |p| - (r + boat) (reference :267-269,
   * sortVec :422-438).  n_obs is perception-sized (tens), so an O(n * 8)
   * selection pass replaces the reference's full std::sort. */
  int taken[GN_N_SLOTS];
  int n_taken = 0;
  for (int s = 0; s < GN_N_SLOTS && s < n_obs; s++) {
    int best = -1;
    float best_key = 1e30f;
    for (int i = 0; i < n_obs; i++) {
      int used = 0;
      for (int t = 0; t < n_taken; t++) used |= (taken[t] == i);
      if (used) continue;
      const float bx = body_xyr[3 * i], by = body_xyr[3 * i + 1];
      const float key =
          sqrtf(bx * bx + by * by) - (body_xyr[3 * i + 2] + GN_BOAT_RADIUS);
      if (key < best_key) {
        best_key = key;
        best = i;
      }
    }
    if (best < 0) break;
    taken[n_taken++] = best;
  }

  const float c = cosf(meas->psi), s = sinf(meas->psi);
  int n_coll = 0;
  for (int t = 0; t < n_taken; t++) {
    const float bx = body_xyr[3 * taken[t]];
    const float by = body_xyr[3 * taken[t] + 1];
    const float r_infl = body_xyr[3 * taken[t] + 2] + GN_BOAT_RADIUS;
    /* body2NED (reference :348-363) */
    n->p_obs[2 * t] = c * bx - s * by + meas->nedx;
    n->p_obs[2 * t + 1] = s * bx + c * by + meas->nedy;
    n->r_obs[t] = r_infl;
    if (sqrtf(bx * bx + by * by) < r_infl) n_coll++; /* ref :321-326 */
  }
  n->collision = n_coll;
  return n_coll;
}

extern "C" int gn_pack(gn_node* n, const gn_measurements* meas,
                       float x0[NMPC_RT_NX], float p_obs[NMPC_RT_NP],
                       float r_obs[NMPC_RT_NH], gn_commands* out) {
  /* --- waypoint manager (reference :441-491) --- */
  const float* p2 = n->wp[n->k];
  float dx = p2[0] - meas->nedx, dy = p2[1] - meas->nedy;
  const float dist = sqrtf(dx * dx + dy * dy);
  const int can_advance = (n->k + 1) < n->n_wp;
  if (n->active && dist <= GN_CAPTURE_RADIUS) {
    if (can_advance) {
      /* heading-error re-projection across the switch (ref :478-484) */
      const float ak_old = seg_angle(n->wp[n->k - 1], n->wp[n->k]);
      n->k++;
      const float ak_new = seg_angle(n->wp[n->k - 1], n->wp[n->k]);
      n->past_psied = wrap_once(n->past_psied - ak_new + ak_old);
    } else {
      /* final waypoint reached: mission done (deviation from the
       * reference, which indexes one segment past the table — UB we do
       * not reproduce; matches guidance/waypoints.py). */
      n->active = 0;
    }
  }
  const float* p1 = n->wp[n->k - 1];
  p2 = n->wp[n->k];
  n->ak = seg_angle(p1, p2);
  n->ye = -(meas->nedx - p1[0]) * sinf(n->ak) +
          (meas->nedy - p1[1]) * cosf(n->ak); /* ref :457-458 */

  /* --- crab-angle OCP packing (reference control() :495-512) --- */
  const float u = (meas->u == 0.0f) ? 0.001f : meas->u;
  const float beta = atan2f(meas->v, u);
  const float chie = wrap_once(meas->psi + beta - n->ak);
  x0[0] = u;
  x0[1] = meas->v;
  x0[2] = n->ye;
  x0[3] = chie;
  x0[4] = n->past_psied;
  x0[5] = meas->nedx;
  x0[6] = meas->nedy;
  x0[7] = meas->psi;
  memcpy(p_obs, n->p_obs, sizeof(n->p_obs));
  memcpy(r_obs, n->r_obs, sizeof(n->r_obs));

  out->ye = n->ye;
  out->u_d = n->active ? GN_CRUISE_SPEED : 0.0f; /* ref :452, :487-490 */
  out->target[0] = p2[0];
  out->target[1] = p2[1];
  out->collision = n->collision > 0;
  out->active = n->active;
  return n->active;
}

extern "C" void gn_extract(gn_node* n, const float x1[NMPC_RT_NX], float u0,
                           gn_commands* out) {
  /* command extraction (reference :583-600): heading from the STAGE-1
   * predicted psi_e_d (input is at derivative level), rate from u0;
   * carried memory and holds update only while active. */
  if (n->active) {
    n->psi_d_hold = wrap_once(x1[4] + n->ak);
    n->r_d_hold = u0;
    n->past_psied = x1[4]; /* ref :593 */
  }
  out->psi_d = n->psi_d_hold;
  out->r_d = n->r_d_hold;
}

extern "C" int gn_tick(gn_node* n, nmpc_rt_client* c,
                       const gn_measurements* meas, gn_commands* out) {
  float x0[NMPC_RT_NX];
  nmpc_rt_request req;
  nmpc_rt_response resp;
  memset(&req, 0, sizeof(req));
  gn_pack(n, meas, x0, req.p_obs, req.r_obs, out);
  memcpy(req.x0, x0, sizeof(x0));
  req.seq = n->seq++;

  const int rc = nmpc_rt_solve(c, &req, &resp);
  if (rc != 0) {
    /* stale-command fallback (reference :577-580) */
    out->psi_d = n->psi_d_hold;
    out->r_d = n->r_d_hold;
    out->solver_status = 0xFFFFFFFFu;
    return rc;
  }
  out->solver_status = resp.status;
  gn_extract(n, resp.x1, resp.u0, out);
  return 0;
}
