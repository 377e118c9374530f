"""Simulated plant + sensor bridge — the robot/Gazebo side of the loop.

The reference reads a real robot (or Gazebo) through YarpSensorBridge
(WholeBodyQPBlock.cpp:195-229,898-934), streams PositionDirect joint
commands through YarpRobotControl (:1251-1257), and receives contact
wrenches from the external wholeBodyDynamics estimator (:351-458), from
which it computes a measured ZMP (evaluateZMP, :737-803). This module is
the TPU-native stand-in: a differentiable, jittable plant with

  - joint servo dynamics: first-order lag of the actual joints toward the
    PositionDirect command (time constant `servo_tau`; 0 = ideal robot),
  - an encoder/IMU sensor model with Gaussian noise,
  - a contact-wrench sensor model: the commanded MPC corner forces
    perturbed by noise, giving a measured ZMP distinct from the desired,

so the estimation layer (fixed-foot detector + legged odometry) and the
CoM-ZMP stabilizer run on *measured* signals, as on the real robot. With
the default config the plant is ideal and the loop reduces exactly to the
reference's adherent topology (SURVEY.md §3.3 note).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmw_tpu.wbc.zmp import desired_zmp_from_corners


@dataclasses.dataclass(frozen=True)
class PlantConfig:
    """Static plant parameters (hashable, part of WalkingConfig)."""

    servo_tau: float = 0.0  # s; first-order joint-servo time constant
    encoder_noise: float = 0.0  # rad std on measured joint positions
    velocity_noise: float = 0.0  # rad/s std on measured joint velocities
    wrench_noise: float = 0.0  # mass-normalized force std on foot wrenches
    seed: int = 0

    @property
    def enabled(self) -> bool:
        return (
            self.servo_tau > 0.0
            or self.encoder_noise > 0.0
            or self.velocity_noise > 0.0
            or self.wrench_noise > 0.0
        )


class PlantState(NamedTuple):
    q_act: jnp.ndarray  # [nj] actual joint positions
    dq_act: jnp.ndarray  # [nj] actual joint velocities
    rng: jnp.ndarray  # PRNG key for the sensor models


def initial_state(pcfg: PlantConfig, q0: jnp.ndarray) -> PlantState:
    return PlantState(
        q_act=q0,
        dq_act=jnp.zeros_like(q0),
        rng=jax.random.PRNGKey(pcfg.seed),
    )


def servo_step(pcfg: PlantConfig, ps: PlantState, q_cmd: jnp.ndarray, dt: float) -> PlantState:
    """Track the PositionDirect command with a first-order servo
    (exact discretization; tau=0 reproduces the command verbatim)."""
    if pcfg.servo_tau <= 0.0:
        q_new = q_cmd
    else:
        alpha = 1.0 - jnp.exp(jnp.asarray(-dt / pcfg.servo_tau, q_cmd.dtype))
        q_new = ps.q_act + alpha * (q_cmd - ps.q_act)
    return ps._replace(q_act=q_new, dq_act=(q_new - ps.q_act) / dt)


def read_joints(pcfg: PlantConfig, ps: PlantState):
    """Encoder reads: (q_meas, dq_meas, new PlantState)."""
    if pcfg.encoder_noise <= 0.0 and pcfg.velocity_noise <= 0.0:
        return ps.q_act, ps.dq_act, ps
    rng, k1, k2 = jax.random.split(ps.rng, 3)
    q_meas = ps.q_act + pcfg.encoder_noise * jax.random.normal(
        k1, ps.q_act.shape, ps.q_act.dtype
    )
    dq_meas = ps.dq_act + pcfg.velocity_noise * jax.random.normal(
        k2, ps.dq_act.shape, ps.dq_act.dtype
    )
    return q_meas, dq_meas, ps._replace(rng=rng)


def read_zmp(
    pcfg: PlantConfig,
    ps: PlantState,
    forces0: jnp.ndarray,  # [nc,ncor,3] applied (mass-normalized) corner forces
    corner0: jnp.ndarray,  # [nc,ncor,3] world corner positions
    centers: jnp.ndarray,  # [nc,3] per-foot centers for the support clamp
):
    """Measured ZMP from the wrench sensors (≙ evaluateZMP,
    WholeBodyQPBlock.cpp:737-803): force-weighted corner average of the
    *sensed* forces — the applied forces plus sensor noise."""
    if pcfg.wrench_noise <= 0.0:
        zmp = desired_zmp_from_corners(forces0, corner0, centers=centers)
        return zmp, ps
    rng, k = jax.random.split(ps.rng)
    sensed = forces0 + pcfg.wrench_noise * jax.random.normal(
        k, forces0.shape, forces0.dtype
    )
    zmp = desired_zmp_from_corners(sensed, corner0, centers=centers)
    return zmp, ps._replace(rng=rng)


def deadband_wrench(force: jnp.ndarray, torque: jnp.ndarray, mass: float, thresh_n: float = 0.7):
    """Reject small measured external wrenches (WholeBodyQPBlock.cpp:1018-1021:
    forces below 0.7 N are sensor noise, not pushes). Inputs are
    mass-normalized; the threshold is in Newtons."""
    keep = (jnp.linalg.norm(force) * mass >= thresh_n).astype(force.dtype)
    return keep * force, keep * torque
