"""Autoregressive MANN trajectory generator (lax.scan, fully jitted).

TPU-native equivalent of BLF `ML::MANNTrajectoryGenerator` as driven by the
reference (CentroidalMPCBlock.cpp:169-181,464-509; parameters
config/robots/ergoCubGazeboV1/mann.ini): rolls the mixture-of-experts
network at 50 Hz (`sampling_time 0.02`) over `time_horizon 0.8` (40 steps),
producing CoM / angular-momentum / joint / base-pose trajectories and a
contact phase list detected by per-foot Schmitt triggers
(on/off thresholds + switch_on/off_after hysteresis, mann.ini:33-55).

Feature layout (124 in / 91 out, per the parsed ONNX graphs — SURVEY.md
§2.1 R9): input = 12 trajectory points x (2D position + 2D facing +
2D velocity) in the current projected-base frame, then 26 joint positions +
26 joint velocities; output = 6 future trajectory points x 6, then joint
positions/velocities and 3 momentum terms. The 12 input points are 6 past
(sampled over `past_projected_base_horizon 1.0` s) + 6 future; the future
points blend the previous prediction with the joystick-desired trajectory
(weight ramping toward the desired at the far end, PFNN/MANN-style).

Base-pose reconstruction: the projected base (xy, yaw) integrates the
network's predicted root motion; height comes from pinning the stance sole
to the ground (the reference reconstructs the base from the support foot
via its robot model — MANNTrajectoryGenerator::setRobotModel,
CentroidalMPCBlock.cpp:167-175). Base roll/pitch are approximated as zero
(flat-ground walking), which matches the projected-feature design of the
network itself.

State is an explicit pytree (`GeneratorState`) so the caller can save it at
any knot and re-root the autoregression there — the reference's merge-point
mechanism (mergePointIndex, CentroidalMPCBlock.cpp:464-468).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.core import kinematics as kin
from cmw_tpu.core import lie
from cmw_tpu.mann.input_builder import DesiredBaseTrajectory
from cmw_tpu.mann.network import MANNWeights, mann_forward

N_POINTS = 12  # projected_base_datapoints (mann.ini:57)
N_PAST = 6
N_FUTURE = 6
NJ = 26


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    dt: float = 0.02  # mann.ini:13
    time_horizon: float = 0.8  # mann.ini:15
    past_horizon: float = 1.0  # mann.ini:60 past_projected_base_horizon
    # REAL-TIME stretch of the generated gait (mann.ini:16; 5.0 on
    # ergoCubGazeboV1_1 / ergoCubSN000 / ergoCubSN001): the network rolls
    # in its own 50 Hz gait time, but each output step is stamped
    # slow_down_factor * dt apart in controller time
    # (CentroidalMPCBlock.cpp:202-211 scales the frequency-adapter input
    # knots; :262-265 scales the mannCallingTime lcm). The autoregression
    # and Schmitt triggers below are untouched (they live in gait time).
    slow_down_factor: float = 1.0
    # Schmitt triggers (mann.ini:33-55)
    on_threshold: float = 0.01
    off_threshold: float = 0.01
    switch_on_after: float = 0.04
    switch_off_after: float = 0.04
    # foot-corner offsets in the sole frame for contact detection
    # (mann.ini [LEFT_FOOT]/[RIGHT_FOOT] corner_k; the detector is
    # per-corner in the reference, so a foot rolling over heel or toe
    # stays in contact as long as its lowest corner is down)
    corners: tuple = (
        (0.08, 0.03, 0.0),
        (0.08, -0.03, 0.0),
        (-0.08, -0.03, 0.0),
        (-0.08, 0.03, 0.0),
    )
    # blending of desired vs predicted future trajectory: the weight ramps
    # linearly to `desired_blend` at the far end of the horizon. 1.0 (fully
    # pinned to the joystick command at +0.8 s) halves the shipped nets'
    # standstill drift vs 0.5 and leaves the walking gait unchanged
    # (measured; the reference's own config history shows these nets are
    # weakest at standing — mann.ini's commented model list includes
    # "more-standing-data" / "4X-standing-data" retrains).
    desired_blend: float = 1.0
    # constant base pitch used in the generator's flat-ground FK: MANN's
    # postures are only consistent with flat soles when the base is pitched
    # by the walk-ready value (kin.CROUCH_BASE_PITCH; the reference world
    # spawns at pitch -0.1). With 0.0 the soles tilt ~6 deg, corrupting the
    # lowest-corner contact detection and the FK CoM.
    base_pitch: float = -0.11

    @property
    def n_steps(self) -> int:
        return int(round(self.time_horizon / self.dt))

    @property
    def past_stride(self) -> int:
        # history is stored every step; past points sampled every stride
        return int(round(self.past_horizon / self.dt / N_PAST))


class GeneratorState(NamedTuple):
    """Complete autoregression state (save/restore = merge-point support)."""

    base_xy: jnp.ndarray  # [2] world
    base_yaw: jnp.ndarray  # []
    q: jnp.ndarray  # [26]
    qd: jnp.ndarray  # [26]
    future_traj: jnp.ndarray  # [6, 6] predicted (pos2, facing2, vel2), base frame
    hist_xy: jnp.ndarray  # [H, 2] world-frame base history (ring, newest last)
    hist_facing: jnp.ndarray  # [H, 2] world frame
    hist_vel: jnp.ndarray  # [H, 2] world frame
    contact: jnp.ndarray  # [2] {0,1} stance state (L, R)
    contact_timer: jnp.ndarray  # [2] hysteresis accumulators (s)
    foot_pose_xy_yaw: jnp.ndarray  # [2, 3] locked stance sole (x, y, yaw)


class GeneratorOutput(NamedTuple):
    com: jnp.ndarray  # [S, 3]
    ang_mom: jnp.ndarray  # [S, 3] (kg-normalized, see runtime: /mass)
    joints: jnp.ndarray  # [S, 26]
    base_xy_yaw: jnp.ndarray  # [S, 3]
    base_height: jnp.ndarray  # [S]
    contact: jnp.ndarray  # [S, 2]
    foot_pose_xy_yaw: jnp.ndarray  # [S, 2, 3]


def _hist_len(cfg: GeneratorConfig) -> int:
    return N_PAST * cfg.past_stride


def _base_rot(cfg: GeneratorConfig, yaw):
    """Full base rotation for FK: yaw (tracked state) composed with the
    constant walk-ready pitch (cfg.base_pitch)."""
    yaw = jnp.asarray(yaw)
    p = jnp.asarray(cfg.base_pitch, yaw.dtype)
    z = jnp.zeros((), yaw.dtype)
    o = jnp.ones((), yaw.dtype)
    cp, sp = jnp.cos(p), jnp.sin(p)
    pitch = jnp.stack(
        [
            jnp.stack([cp, z, sp]),
            jnp.stack([z, o, z]),
            jnp.stack([-sp, z, cp]),
        ]
    )
    return lie.rotz(yaw) @ pitch


def initial_state(
    cfg: GeneratorConfig,
    model: kin.RobotModel,
    q,
    base_xy=None,
    base_yaw=None,
) -> GeneratorState:
    """From an initial joint configuration + projected base pose — the
    reference seeds the generator the same way (setInitialState with the
    measured joints + base, CentroidalMPCBlock.cpp:271-370)."""
    dt = q.dtype
    base_xy = jnp.zeros(2, dt) if base_xy is None else base_xy
    base_yaw = jnp.zeros((), dt) if base_yaw is None else base_yaw
    H = _hist_len(cfg)
    facing = jnp.stack([jnp.cos(base_yaw), jnp.sin(base_yaw)])
    fut = jnp.zeros((N_FUTURE, 6), dt).at[:, 2:4].set(jnp.asarray([1.0, 0.0], dt))
    # stance feet from FK at the initial pose
    lR, lp = kin.fk(model, q, _base_rot(cfg, base_yaw), jnp.concatenate([base_xy, jnp.zeros(1, dt)]))
    fR, fp = kin.frame_poses(model, lR, lp)
    l_idx, r_idx = model.frame_index("l_sole"), model.frame_index("r_sole")
    feet = []
    for idx in (l_idx, r_idx):
        feet.append(
            jnp.stack([fp[idx, 0], fp[idx, 1], lie.yaw_of(fR[idx])])
        )
    return GeneratorState(
        base_xy=base_xy,
        base_yaw=base_yaw,
        q=q,
        qd=jnp.zeros(NJ, dt),
        future_traj=fut,
        hist_xy=jnp.broadcast_to(base_xy, (H, 2)),
        hist_facing=jnp.broadcast_to(facing, (H, 2)),
        hist_vel=jnp.zeros((H, 2), dt),
        contact=jnp.ones(2, dt),
        contact_timer=jnp.zeros(2, dt),
        foot_pose_xy_yaw=jnp.stack(feet),
    )


def _world_to_base_xy(v, base_xy, yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    d = v - base_xy
    return jnp.stack([c * d[..., 0] + s * d[..., 1], -s * d[..., 0] + c * d[..., 1]], axis=-1)


def _rot_to_base(v, yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([c * v[..., 0] + s * v[..., 1], -s * v[..., 0] + c * v[..., 1]], axis=-1)


def _rot_to_world(v, yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([c * v[..., 0] - s * v[..., 1], s * v[..., 0] + c * v[..., 1]], axis=-1)


def _build_input(cfg: GeneratorConfig, s: GeneratorState, desired: DesiredBaseTrajectory):
    """Assemble the 124-feature vector in the current base frame."""
    stride = cfg.past_stride
    idx = jnp.arange(N_PAST) * stride  # oldest -> newest over the ring
    past_xy = _world_to_base_xy(s.hist_xy[idx], s.base_xy, s.base_yaw)
    past_face = _rot_to_base(s.hist_facing[idx], s.base_yaw)
    past_vel = _rot_to_base(s.hist_vel[idx], s.base_yaw)

    # blend predicted future with the desired trajectory (resampled to 6 pts)
    # nearest desired knot per future point, computed in exact index
    # arithmetic (the two grids share tie points — (k/6)*H vs (j/(n-1))*H —
    # where a float searchsorted is precision-dependent; round() is not)
    n_des = desired.positions.shape[0]
    di = jnp.clip(
        jnp.round((jnp.arange(N_FUTURE) + 1) * (n_des - 1) / N_FUTURE).astype(jnp.int32),
        0,
        n_des - 1,
    )
    w = (cfg.desired_blend * (jnp.arange(N_FUTURE) + 1) / N_FUTURE)[:, None]
    fut_pos = (1 - w) * s.future_traj[:, 0:2] + w * desired.positions[di]
    fut_face = (1 - w) * s.future_traj[:, 2:4] + w * desired.facing[di]
    fut_vel = (1 - w) * s.future_traj[:, 4:6] + w * desired.velocities[di]
    fut_face = fut_face / jnp.maximum(jnp.linalg.norm(fut_face, axis=-1, keepdims=True), 1e-6)

    pos = jnp.concatenate([past_xy, fut_pos], axis=0)  # [12, 2]
    face = jnp.concatenate([past_face, fut_face], axis=0)
    vel = jnp.concatenate([past_vel, fut_vel], axis=0)
    return jnp.concatenate(
        [pos.reshape(-1), face.reshape(-1), vel.reshape(-1), s.q, s.qd]
    )


def _parse_output(y):
    fut = jnp.stack(
        [
            y[0:12].reshape(N_FUTURE, 2),
            y[12:24].reshape(N_FUTURE, 2),
            y[24:36].reshape(N_FUTURE, 2),
        ],
        axis=-2,
    ).reshape(N_FUTURE, 6)  # [pos2 | facing2 | vel2] per point
    q = y[36:62]
    qd = y[62:88]
    extra = y[88:91]
    return fut, q, qd, extra


def _base_height_for_stance(cfg: GeneratorConfig, model: kin.RobotModel, q, yaw, stance_sel):
    """Base z s.t. the lowest sole sits exactly on the ground — walking has
    no flight phase, so the stance foot is always the lower one. (The
    reference reconstructs the base from the support foot with its robot
    model; pinning the min-height sole is the flight-free equivalent.)"""
    del stance_sel
    lR, lp = kin.fk(model, q, _base_rot(cfg, yaw), jnp.zeros(3, q.dtype))
    fR, fp = kin.frame_poses(model, lR, lp)
    zs = jnp.stack(
        [fp[model.frame_index("l_sole"), 2], fp[model.frame_index("r_sole"), 2]]
    )
    return -jnp.min(zs)


def step(
    cfg: GeneratorConfig,
    model: kin.RobotModel,
    weights: MANNWeights,
    s: GeneratorState,
    desired: DesiredBaseTrajectory,
):
    """One 20 ms autoregressive step. Returns (new_state, per-step record)."""
    x = _build_input(cfg, s, desired)
    y = mann_forward(weights, x)
    fut, q_new, qd_new, _extra = _parse_output(y)

    # advance the projected base by the first predicted future point,
    # scaled from its lead time to one control step
    lead = cfg.time_horizon / N_FUTURE
    scale = cfg.dt / lead
    dxy_b = fut[0, 0:2] * scale
    base_xy = s.base_xy + _rot_to_world(dxy_b, s.base_yaw)
    dyaw = jnp.arctan2(fut[0, 3], fut[0, 2]) * scale
    base_yaw = s.base_yaw + dyaw
    vel_w = _rot_to_world(fut[0, 4:6], s.base_yaw)

    # contact detection: Schmitt trigger on sole heights with hysteresis
    z_base = _base_height_for_stance(cfg, model, q_new, base_yaw, s.contact)
    base_pos = jnp.concatenate([base_xy, z_base[None]])
    lR, lp = kin.fk(model, q_new, _base_rot(cfg, base_yaw), base_pos)
    fR, fp = kin.frame_poses(model, lR, lp)
    li, ri = model.frame_index("l_sole"), model.frame_index("r_sole")
    # lowest-corner height per foot (per-corner triggers, mann.ini:33-55):
    # corner world z = sole z + (R_sole @ offset)_z
    offs = jnp.asarray(cfg.corners, x.dtype)  # [4,3]
    corner_z = jnp.stack(
        [
            fp[li, 2] + (fR[li] @ offs.T)[2],
            fp[ri, 2] + (fR[ri] @ offs.T)[2],
        ]
    )  # [2,4]
    sole_z = corner_z.min(axis=1)
    raw = jnp.where(
        s.contact > 0, (sole_z < cfg.off_threshold), (sole_z < cfg.on_threshold)
    ).astype(s.contact.dtype)
    # timer accumulates while the raw signal disagrees with the state
    switch_after = jnp.where(s.contact > 0, cfg.switch_off_after, cfg.switch_on_after)
    disagree = jnp.abs(raw - s.contact)
    timer = (s.contact_timer + cfg.dt) * disagree
    flip = (timer >= switch_after).astype(s.contact.dtype)
    contact = s.contact * (1 - flip) + (1 - s.contact) * flip
    timer = timer * (1 - flip)

    # lock foot pose at touchdown; keep while in stance
    sole_xy_yaw = jnp.stack(
        [
            jnp.stack([fp[li, 0], fp[li, 1], lie.yaw_of(fR[li])]),
            jnp.stack([fp[ri, 0], fp[ri, 1], lie.yaw_of(fR[ri])]),
        ]
    )
    touchdown = ((1 - s.contact) * contact)[:, None]
    foot_pose = jnp.where(
        (contact[:, None] > 0) & (touchdown == 0), s.foot_pose_xy_yaw, sole_xy_yaw
    )

    # com + centroidal momentum
    c = kin.com(model, lR, lp)
    nu = jnp.concatenate([vel_w, jnp.zeros(1, x.dtype), jnp.zeros(2, x.dtype), (dyaw / cfg.dt)[None], qd_new])
    h = kin.centroidal_momentum(model, lR, lp, nu)

    # history ring shift
    facing_w = _rot_to_world(jnp.asarray([1.0, 0.0], x.dtype), base_yaw)
    new_state = GeneratorState(
        base_xy=base_xy,
        base_yaw=base_yaw,
        q=q_new,
        qd=qd_new,
        future_traj=fut,
        hist_xy=jnp.concatenate([s.hist_xy[1:], base_xy[None]], axis=0),
        hist_facing=jnp.concatenate([s.hist_facing[1:], facing_w[None]], axis=0),
        hist_vel=jnp.concatenate([s.hist_vel[1:], vel_w[None]], axis=0),
        contact=contact,
        contact_timer=timer,
        foot_pose_xy_yaw=foot_pose,
    )
    record = GeneratorOutput(
        com=c,
        ang_mom=h[3:6],
        joints=q_new,
        base_xy_yaw=jnp.concatenate([base_xy, base_yaw[None]]),
        base_height=z_base,
        contact=contact,
        foot_pose_xy_yaw=foot_pose,
    )
    return new_state, record


def generate(
    cfg: GeneratorConfig,
    model: kin.RobotModel,
    weights: MANNWeights,
    state: GeneratorState,
    desired: DesiredBaseTrajectory,
) -> tuple[GeneratorState, GeneratorOutput]:
    """Roll the generator over the full horizon (40 steps @ 50 Hz).

    Returns (final_state, stacked per-step outputs). The caller stores
    intermediate states for merge-point re-rooting at the runtime layer.
    """

    def body(s, _):
        return step(cfg, model, weights, s, desired)

    final, outs = jax.lax.scan(body, state, None, length=cfg.n_steps)
    return final, outs


def generate_with_states(
    cfg: GeneratorConfig,
    model: kin.RobotModel,
    weights: MANNWeights,
    state: GeneratorState,
    desired: DesiredBaseTrajectory,
):
    """Like generate(), but also returns the stacked post-step states so the
    runtime can re-root the next generation at an intermediate knot (the
    reference's mergePointIndex, CentroidalMPCBlock.cpp:464-468):
    `jax.tree.map(lambda a: a[k], states)` is the state after step k."""

    def body(s, _):
        s2, rec = step(cfg, model, weights, s, desired)
        return s2, (rec, s2)

    final, (outs, states) = jax.lax.scan(body, state, None, length=cfg.n_steps)
    return final, outs, states
