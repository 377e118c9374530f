"""CoM-ZMP stabilizer.

Equivalent of BLF `SimplifiedModelControllers::CoMZMPController`
(reference WholeBodyQPBlock.cpp:560-565,1161-1184; gains
centroidal_mpc_walking.ini:26-28 — com_gain (4,4), zmp_gain (0.5,0.5)):

  v_cmd = v_des + R(yaw) Kc R(yaw)^T (com_des - com)
                + R(yaw) Kz R(yaw)^T (zmp_meas - zmp_des)

The ZMP term has the unstable-pendulum sign: moving the CoM toward the
measured ZMP error pushes the ZMP back toward its reference. Gains act in
a frame yaw-aligned with the robot's walking direction.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CoMZMPGains:
    com_gain: tuple = (4.0, 4.0)
    zmp_gain: tuple = (0.5, 0.5)


def com_zmp_control(
    dcom_des, com_des, zmp_des, com_meas, zmp_meas, yaw, gains: CoMZMPGains = CoMZMPGains()
):
    """All planar [.., 2] quantities; returns commanded CoM xy velocity."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    R = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    Kc = jnp.asarray(gains.com_gain, dcom_des.dtype)
    Kz = jnp.asarray(gains.zmp_gain, dcom_des.dtype)

    def rot_gain(K, e):
        e_local = jnp.einsum("...ji,...j->...i", R, e)
        return jnp.einsum("...ij,...j->...i", R, K * e_local)

    return dcom_des + rot_gain(Kc, com_des - com_meas) + rot_gain(Kz, zmp_meas - zmp_des)
