"""Joystick -> desired base-trajectory input for the MANN generator.

TPU-native equivalent of BLF `ML::MANNAutoregressiveInputBuilder`
(reference CentroidalMPCBlock.cpp:183-188,452-461; parameters from
config/robots/ergoCubGazeboV1/mann.ini:22-31): maps
`JoypadSignal{motion_direction in R^2, facing_direction in R^2}` to a
desired future base path — velocities clamped to a forward/side/backward
ellipsoid, facing angle clamped to per-quadrant limits, positions obtained
by integrating the limited velocity over `number_of_knots` knots.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class InputBuilderConfig:
    # mann.ini:22-31
    base_vel_norm: float = 0.4
    ellipsoid_forward_axis: float = 3.0
    ellipsoid_side_axis: float = 0.3
    ellipsoid_backward_axis: float = 0.8
    ellipsoid_scaling_factor: float = 0.4
    max_facing_angle_forward: float = 0.20
    max_facing_angle_backward: float = 0.1
    max_facing_angle_side_opposite_sign: float = 0.26
    max_facing_angle_side_same_sign: float = 0.17
    number_of_knots: int = 7
    time_horizon: float = 0.8  # mann.ini:15


class DesiredBaseTrajectory(NamedTuple):
    positions: jnp.ndarray  # [K, 2] in current base frame
    facing: jnp.ndarray  # [K, 2] unit vectors
    velocities: jnp.ndarray  # [K, 2]


def _limit_to_ellipsoid(v, cfg: InputBuilderConfig):
    """Clamp planar velocity to the forward/side/backward ellipsoid."""
    a_fwd = cfg.ellipsoid_forward_axis * cfg.ellipsoid_scaling_factor
    a_back = cfg.ellipsoid_backward_axis * cfg.ellipsoid_scaling_factor
    a_side = cfg.ellipsoid_side_axis * cfg.ellipsoid_scaling_factor
    ax = jnp.where(v[..., 0] >= 0, a_fwd, a_back)
    r2 = (v[..., 0] / jnp.maximum(ax, 1e-9)) ** 2 + (
        v[..., 1] / jnp.maximum(a_side, 1e-9)
    ) ** 2
    scale = jnp.where(r2 > 1.0, 1.0 / jnp.sqrt(jnp.maximum(r2, 1e-12)), 1.0)
    return v * scale[..., None]


def _limit_facing_angle(facing, motion, cfg: InputBuilderConfig):
    """Clamp the facing angle relative to forward, with per-quadrant limits
    (mann.ini:27-30)."""
    ang = jnp.arctan2(facing[..., 1], facing[..., 0])
    moving_fwd = motion[..., 0] >= 0.0
    side_sign_same = motion[..., 1] * ang >= 0.0
    lim_straight = jnp.where(
        moving_fwd, cfg.max_facing_angle_forward, cfg.max_facing_angle_backward
    )
    lim_side = jnp.where(
        side_sign_same,
        cfg.max_facing_angle_side_same_sign,
        cfg.max_facing_angle_side_opposite_sign,
    )
    sideways = jnp.abs(motion[..., 1]) > jnp.abs(motion[..., 0])
    lim = jnp.where(sideways, lim_side, lim_straight)
    ang = jnp.clip(ang, -lim, lim)
    return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def build_desired_trajectory(
    motion_direction, facing_direction, cfg: InputBuilderConfig = InputBuilderConfig()
) -> DesiredBaseTrajectory:
    """motion/facing [2] (joystick sticks) -> K-knot desired base path."""
    K = cfg.number_of_knots
    mnorm = jnp.linalg.norm(motion_direction)
    v_des = jnp.where(
        mnorm > 1e-3,
        motion_direction / jnp.maximum(mnorm, 1e-9) * cfg.base_vel_norm * jnp.minimum(mnorm, 1.0),
        jnp.zeros(2),
    )
    v_lim = _limit_to_ellipsoid(v_des, cfg)

    fnorm = jnp.linalg.norm(facing_direction)
    f_raw = jnp.where(
        fnorm > 1e-3, facing_direction / jnp.maximum(fnorm, 1e-9), jnp.asarray([1.0, 0.0])
    )
    f_lim = _limit_facing_angle(f_raw, v_lim, cfg)

    t = jnp.linspace(0.0, cfg.time_horizon, K)[:, None]
    positions = t * v_lim[None, :]
    velocities = jnp.broadcast_to(v_lim, (K, 2))
    facing = jnp.broadcast_to(f_lim, (K, 2))
    return DesiredBaseTrajectory(positions=positions, facing=facing, velocities=velocities)
