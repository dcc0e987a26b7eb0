/* Implementation of the native low-level thrust node.
 * Behavior citations: reference catkin_ws/src/nmpc_ca/src/nmpc_low_level.cpp
 * (see header).  No dependencies beyond libm.
 */
#include "nmpc_low_level_node.h"

#include <math.h>
#include <string.h>

extern "C" {

void ll_init(ll_node* n) {
  memset(n, 0, sizeof(*n));
}

void ll_pack_x0(const ll_node* n, const ll_measurements* meas,
                float x0[LL_NX]) {
  /* reference :206-215.  The u == 0 -> 0.001 guard lives in the
   * reference's velocity callback (:180-182), i.e. it rewrites the
   * MEASUREMENT, so it flows into both the packed state and the e_u
   * telemetry; ll_tick applies it once at intake, and this guard is
   * kept (idempotently) for direct callers of the sub-step. */
  float u = meas->u == 0.0f ? 0.001f : meas->u;
  x0[0] = meas->psi;
  x0[1] = sinf(meas->psi);
  x0[2] = cosf(meas->psi);
  x0[3] = u;
  x0[4] = meas->v;
  x0[5] = meas->r;
  x0[6] = n->past_t_port;
  x0[7] = n->past_t_stbd;
}

void ll_pack_yref(float psi_d, float u_d, float yref[LL_NY]) {
  /* reference :221-240: track (psi_d, sin, cos, u_d), drive v, r,
   * thrusts and thrust rates to 0 */
  yref[0] = psi_d;
  yref[1] = sinf(psi_d);
  yref[2] = cosf(psi_d);
  yref[3] = u_d;
  for (int i = 4; i < LL_NY; ++i) yref[i] = 0.0f;
}

void ll_extract(ll_node* n, const float x1[LL_NX], uint32_t status,
                const ll_measurements* meas, float psi_d, float u_d,
                ll_commands* out) {
  float tp = x1[6];
  float ts = x1[7];
  /* carried memory stores the raw stage-1 thrusts unconditionally
   * (reference :268-269 run after the override assignment to the
   * published message but read x1 directly) */
  n->past_t_port = tp;
  n->past_t_stbd = ts;
  if (u_d == 0.0f) { /* hard stop override, reference :262-265 */
    tp = 0.0f;
    ts = 0.0f;
  }
  out->t_port = tp;
  out->t_stbd = ts;
  /* e_u uses the (guarded) measurement: the reference guard rewrites
   * meas.u in velocityCallback, so e_u = u_d - 0.001 when u reads 0 */
  out->e_u = u_d - meas->u;     /* reference :273-274 */
  out->e_psi = psi_d - meas->psi;
  out->tx = tp + LL_THRUST_C * ts;                  /* reference :284 */
  out->tz = (tp - LL_THRUST_C * ts) * LL_BEAM / 2.0f; /* reference :285 */
  out->solver_status = status;
  n->last = *out;
  n->have_cmd = 1;
}

int ll_tick(ll_node* n, nmpc_rt_client* c, uint32_t seq,
            const ll_measurements* meas, float psi_d, float u_d,
            ll_commands* out) {
  float x0[LL_NX];
  float yref[LL_NY];
  float u0[2];
  float x1[LL_NX];
  uint32_t status = 0;
  uint16_t out_nu = 0;

  /* u == 0 -> 0.001 guard applied ONCE to the measurement (reference
   * velocityCallback :180-182): both x0 packing and e_u telemetry see
   * the guarded value, matching the JAX caller convention. */
  ll_measurements m = *meas;
  if (m.u == 0.0f) m.u = 0.001f;
  meas = &m;

  ll_pack_x0(n, meas, x0);
  ll_pack_yref(psi_d, u_d, yref);
  int rc = nmpc_rt_solve2(c, NMPC_RT_MODEL_LOW_LEVEL, seq, x0, LL_NX,
                          /*p=*/0, 0, /*lh=*/0, 0, yref, LL_NY, u0, 2, x1,
                          &status, &out_nu);
  if (rc != 0) {
    /* stale-command fallback: keep the previous commands in effect
     * (reference :249-253 keeps going on a failed solve) */
    if (n->have_cmd) *out = n->last;
    else memset(out, 0, sizeof(*out));
    out->solver_status = 0xFFFFFFFFu;
    return rc;
  }
  ll_extract(n, x1, status, meas, psi_d, u_d, out);
  return 0;
}

} /* extern "C" */
