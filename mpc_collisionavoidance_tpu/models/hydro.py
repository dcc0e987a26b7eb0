"""Shared 3-DOF ASV hydrodynamics (surge/sway/yaw) in JAX.

Reproduces the exact equations of motion shared by the full-model variants
(reference scripts/usv_pf_ca/usv_model.py:61-77,137-160, identical in
usv_acados / usv_low_level / usv_position_control / usv_pf up to the thrust
asymmetry constant ``c``):

- piecewise surge drag Xu/Xuu switching at u > 1.25 m/s (if_else ->
  `jnp.where`, reference usv_model.py:137-138),
- sway drag Yv proportional to |v| (reference usv_model.py:139),
- speed-dependent yaw drag Nr = -0.52*sqrt(u^2+v^2) (reference
  usv_model.py:140),
- differential-thrust force/moment mapping Tu/Tr with asymmetry ``c``
  (c=1.0 for the pf family, c=0.78 for acados/low_level/position_control;
  reference scripts/usv_pf_ca/usv_model.py:77 vs scripts/usv_acados/
  usv_model.py:77).

Everything is written `jnp`-elementwise so it vmaps over scenario batches and
differentiates cleanly with `jax.jacfwd` (the `jnp.where` drag switch gives
the one-sided derivative at the switch point, matching CasADi `if_else`
semantics away from the measure-zero kink).
"""

import jax.numpy as jnp

# Added-mass / damping / geometry constants
# (reference scripts/usv_pf_ca/usv_model.py:61-76)
X_U_DOT = -2.25
Y_V_DOT = -23.13
Y_R_DOT = -1.31
N_V_DOT = -16.41
N_R_DOT = -2.79
YVV = -99.99
YVR = -5.49
YRV = -5.49
YRR = -8.8
NVV = -5.49
NVR = -8.8
NRV = -8.8
NRR = -3.49
MASS = 30.0
IZ = 4.1
BEAM = 0.41

# Sway-drag scalar factor: 1.1 + 0.0045*(1.01/0.09) - 0.1*(0.27/0.09)
#                          + 0.016*(0.27/0.09)^2
# (reference scripts/usv_pf_ca/usv_model.py:139)
_YV_FACTOR = 1.1 + 0.0045 * (1.01 / 0.09) - 0.1 * (0.27 / 0.09) + 0.016 * ((0.27 / 0.09) ** 2)


def thrust_map(tport, tstbd, c):
    """Differential thrust to surge force / yaw moment.

    Tu = Tport + c*Tstbd ; Tr = (Tport - c*Tstbd)*B/2
    (reference scripts/usv_pf_ca/usv_model.py:141-142).
    """
    tu = tport + c * tstbd
    tr = (tport - c * tstbd) * BEAM / 2.0
    return tu, tr


def uvr_dot(u, v, r, tu, tr):
    """Body-frame accelerations (udot, vdot, rdot).

    Verbatim port of the shared EOM (reference scripts/usv_pf_ca/
    usv_model.py:137-151), including the reference's exact sign groupings.
    """
    xu = jnp.where(u > 1.25, 64.55, -25.0)
    xuu = jnp.where(u > 1.25, -70.92, 0.0)
    yv = 0.5 * (-40.0 * 1000.0 * jnp.abs(v)) * _YV_FACTOR
    nr = -0.52 * jnp.sqrt(u * u + v * v)

    u_dot = (
        tu
        - (-MASS + 2.0 * Y_V_DOT) * v
        - (Y_R_DOT + N_V_DOT) * r * r
        - (-xu * u - xuu * jnp.abs(u) * u)
    ) / (MASS - X_U_DOT)
    v_dot = (
        -(MASS - X_U_DOT) * u * r - (-yv - YVV * jnp.abs(v) - YVR * jnp.abs(r)) * v
    ) / (MASS - Y_V_DOT)
    r_dot = (
        tr
        - (-2.0 * Y_V_DOT * u * v - (Y_R_DOT + N_V_DOT) * r * u + X_U_DOT * u * r)
        - (-nr * r - NRV * jnp.abs(v) * r - NRR * jnp.abs(r) * r)
    ) / (IZ - N_R_DOT)
    return u_dot, v_dot, r_dot
