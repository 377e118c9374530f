"""Swing-foot SE3 trajectory from a contact plan.

Equivalent of BLF `Planners::SwingFootPlanner` (x2, reference
WholeBodyQPBlock.cpp:231-261,1092-1119; parameters
swing_foot_planner.ini: step_height 0.035, foot_apex_time 0.5,
foot_landing_velocity/acceleration 0).

Given the (MPC-adjusted) contact plan and the current time, each foot's
pose is: the held contact pose while in stance; during swing a quintic
interpolation from the previous contact pose to the next one — xy/yaw via
quintic time-scaling with zero boundary velocity/acceleration, z via two
quintic segments through an apex of step_height above the higher endpoint
at `foot_apex_time` fraction of the swing.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from cmw_tpu.core import contacts as C
from cmw_tpu.core import lie
from cmw_tpu.core.splines import quintic_hermite, quintic_timescale


@dataclasses.dataclass(frozen=True)
class SwingFootConfig:
    step_height: float = 0.035
    foot_apex_time: float = 0.5  # fraction of the swing interval
    landing_velocity: float = 0.0
    landing_acceleration: float = 0.0


class FootState(NamedTuple):
    rot: jnp.ndarray  # [nc, 3, 3]
    pos: jnp.ndarray  # [nc, 3]
    lin_vel: jnp.ndarray  # [nc, 3]
    ang_vel: jnp.ndarray  # [nc, 3]
    in_contact: jnp.ndarray  # [nc]
    progress: jnp.ndarray  # [nc] swing phase fraction in [0,1]; 0 in stance


def evaluate(plan: C.ContactPlan, t, cfg: SwingFootConfig = SwingFootConfig()) -> FootState:
    """Foot pose/velocity for every contact at time t (jit/vmap-friendly)."""
    dt_ = plan.act.dtype
    cur_idx, in_contact = C.active_phase(plan, t)
    # previous contact = last phase with act <= t; next = first with act > t
    prev_idx, has_prev = C.present_phase(plan, t)
    next_idx, has_next = C.next_phase(plan, t)

    a_p, d_p, pos_p, rot_p, _ = C.gather_phase(plan, prev_idx)
    a_n, d_n, pos_n, rot_n, _ = C.gather_phase(plan, next_idx)
    a_c, d_c, pos_c, rot_c, _ = C.gather_phase(plan, cur_idx)

    # swing window: from prev deactivation to next activation
    t0 = d_p
    t1 = jnp.where(has_next > 0, a_n, d_p + 1.0)
    dur = jnp.maximum(t1 - t0, 1e-6)

    s, ds = quintic_timescale(t, t0, t1)  # [nc]
    # xy + yaw interpolate on the time-scaled geodesic
    xy = pos_p[:, 0:2] + s[:, None] * (pos_n[:, 0:2] - pos_p[:, 0:2])
    v_xy = ds[:, None] * (pos_n[:, 0:2] - pos_p[:, 0:2])
    yaw_p = lie.yaw_of(rot_p)
    dyaw = lie.yaw_of(jnp.swapaxes(rot_p, -1, -2) @ rot_n)
    yaw = yaw_p + s * dyaw
    w_z = ds * dyaw

    # z: two quintic segments through the apex
    z_apex = jnp.maximum(pos_p[:, 2], pos_n[:, 2]) + cfg.step_height
    t_apex = t0 + cfg.foot_apex_time * dur
    zeros = jnp.zeros_like(z_apex)[..., None]
    z_up, vz_up, _ = quintic_hermite(
        t, t0, t_apex, pos_p[:, 2:3], zeros, zeros, z_apex[:, None], zeros, zeros
    )
    z_dn, vz_dn, _ = quintic_hermite(
        t,
        t_apex,
        t1,
        z_apex[:, None],
        zeros,
        zeros,
        pos_n[:, 2:3],
        zeros + cfg.landing_velocity,
        zeros + cfg.landing_acceleration,
    )
    before_apex = (t < t_apex)[:, None]
    z = jnp.where(before_apex, z_up, z_dn)
    vz = jnp.where(before_apex, vz_up, vz_dn)

    swing_pos = jnp.concatenate([xy, z], axis=-1)
    swing_vel = jnp.concatenate([v_xy, vz], axis=-1)
    swing_rot = lie.rotz(yaw)
    swing_w = jnp.stack([jnp.zeros_like(w_z), jnp.zeros_like(w_z), w_z], axis=-1)

    in_c = in_contact[:, None]
    pos = jnp.where(in_c > 0, pos_c, swing_pos)
    rot = jnp.where(in_c[..., None] > 0, rot_c, swing_rot)
    lin_vel = jnp.where(in_c > 0, 0.0, swing_vel)
    ang_vel = jnp.where(in_c > 0, 0.0, swing_w)
    progress = jnp.where(
        in_contact > 0, 0.0, jnp.clip((t - t0) / dur, 0.0, 1.0)
    )
    return FootState(
        rot=rot,
        pos=pos,
        lin_vel=lin_vel,
        ang_vel=ang_vel,
        in_contact=in_contact,
        progress=progress,
    )
