"""Path-frame (Frenet) transforms for polyline missions.

The reference carries `time2spatial.py` in every variant directory
(transformProj2Orig / transformOrig2Proj, reference
scripts/usv_guidance_ca1/time2spatial.py:40-58) — race-track leftovers
that load a gitignored spline and are unused by the USV variants, whose
actual path frame is the straight waypoint segment (x1, y1, ak) with
cross-track error ye (reference src/nmpc_guidance_ca1.cpp:457-458).
These helpers provide that information content for polyline paths, as
total, vmappable functions:

- `seg_to_xy` / `xy_to_seg`: single-segment (s, ye) <-> NED, the exact
  frame the guidance OCPs are written in;
- `polyline_project`: project a point onto an entire waypoint polyline ->
  (segment index, arc length s, cross-track ye), fixed-shape over a padded
  waypoint table.
"""

import jax.numpy as jnp


def seg_to_xy(x1, y1, ak, s, ye):
    """Segment frame -> NED: start (x1, y1), heading ak, arc s, offset ye.

    Matches the reference's ye sign convention
    ye = -(x - x1) sin(ak) + (y - y1) cos(ak)."""
    x = x1 + s * jnp.cos(ak) - ye * jnp.sin(ak)
    y = y1 + s * jnp.sin(ak) + ye * jnp.cos(ak)
    return x, y


def xy_to_seg(x1, y1, ak, x, y):
    """NED -> segment frame (s, ye)."""
    dx, dy = x - x1, y - y1
    s = dx * jnp.cos(ak) + dy * jnp.sin(ak)
    ye = -dx * jnp.sin(ak) + dy * jnp.cos(ak)
    return s, ye


def polyline_project(waypoints, n_wp, x, y):
    """Project (x, y) onto the polyline waypoints[:n_wp].

    waypoints: (M, 2) padded table. Returns (k, s_total, ye):
    k = segment index of the closest point, s_total = arc length from the
    first waypoint to the projection, ye = signed cross-track error in
    that segment's frame. Fixed-shape: invalid segments are masked out.
    """
    wp = jnp.asarray(waypoints)
    M = wp.shape[0]
    p1 = wp[:-1]                      # (M-1, 2)
    p2 = wp[1:]
    seg = p2 - p1
    seg_len = jnp.hypot(seg[:, 0], seg[:, 1])
    ak = jnp.arctan2(seg[:, 1], seg[:, 0])
    valid = (jnp.arange(M - 1) < (jnp.asarray(n_wp) - 1)) & (seg_len > 0)

    dx = x - p1[:, 0]
    dy = y - p1[:, 1]
    s = dx * jnp.cos(ak) + dy * jnp.sin(ak)
    s_clamped = jnp.clip(s, 0.0, seg_len)
    ye = -dx * jnp.sin(ak) + dy * jnp.cos(ak)
    px = p1[:, 0] + s_clamped * jnp.cos(ak)
    py = p1[:, 1] + s_clamped * jnp.sin(ak)
    dist = jnp.hypot(x - px, y - py)
    dist = jnp.where(valid, dist, jnp.inf)

    k = jnp.argmin(dist)
    cum = jnp.concatenate([jnp.zeros((1,), seg_len.dtype),
                           jnp.cumsum(jnp.where(valid, seg_len, 0.0))])
    return k, cum[k] + s_clamped[k], ye[k]
