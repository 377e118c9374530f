"""Mass-normalized centroidal dynamics with per-corner contact forces.

TPU-native equivalent of BLF `ContinuousDynamicalSystem::CentroidalDynamics`
as used by the reference (WholeBodyQPBlock.cpp:627-632,1083-1090,1150-1158)
and of the dynamics inside its CentroidalMPC OCP (SURVEY.md §2.4):

    dcom/dt = v
    dv/dt   = g + sum_{i,j} m_ik f_ijk + f_ext
    dL/dt   = sum_{i,j} m_ik (p_ik + R_ik c_ij - com) x f_ijk + tau_ext

All quantities mass-normalized (the reference divides wrenches and angular
momentum by robot mass before use — CentroidalMPCBlock.cpp:405-410,
WholeBodyQPBlock.cpp:1011-1012). Forces are expressed in the world frame.

State is a flat array [com(3), vcom(3), ang_mom(3)] so the same function
serves the MPC rollout, the WBC-side integrator, and vmapped batched sweeps.
"""

from __future__ import annotations

import jax.numpy as jnp

GRAVITY = 9.80665


def pack_state(com, vcom, ang_mom):
    return jnp.concatenate([com, vcom, ang_mom], axis=-1)


def unpack_state(x):
    return x[..., 0:3], x[..., 3:6], x[..., 6:9]


def centroidal_dynamics(x, forces, corner_pos, active, ext_force, ext_torque):
    """Continuous-time mass-normalized centroidal dynamics.

    Args:
      x:          [..., 9] state (com, vcom, ang_mom).
      forces:     [..., nc, ncor, 3] world-frame corner forces / mass.
      corner_pos: [..., nc, ncor, 3] world-frame corner positions
                  (= p_i + R_i c_ij, already composed).
      active:     [..., nc] contact activation in {0, 1}.
      ext_force:  [..., 3] external force / mass (world frame).
      ext_torque: [..., 3] external torque / mass about the CoM.

    Returns [..., 9] time derivative.
    """
    com, vcom, _ = unpack_state(x)
    m = active[..., :, None, None]  # [..., nc, 1, 1]
    f = forces * m
    g = jnp.zeros_like(vcom).at[..., 2].set(-GRAVITY)
    dv = g + jnp.sum(f, axis=(-3, -2)) + ext_force
    arm = corner_pos - com[..., None, None, :]
    dL = jnp.sum(jnp.cross(arm, f), axis=(-3, -2)) + ext_torque
    return jnp.concatenate([vcom, dv, dL], axis=-1)


def corner_world_positions(contact_pos, contact_rot, corners_local):
    """Compose world corner positions p_i + R_i c_ij.

    contact_pos: [..., nc, 3]; contact_rot: [..., nc, 3, 3];
    corners_local: [nc, ncor, 3] (config constants,
    centroidal_mpc.ini [CONTACT_*] corner_k).
    """
    return contact_pos[..., :, None, :] + jnp.einsum(
        "...iab,ijb->...ija", contact_rot, corners_local
    )
